from fluidnet_tpu.core.celltype import CellType
from fluidnet_tpu.core.grids import FluidState, get_dx, empty_domain, flags_to_occupancy
