from fluidnet_tpu.ops.pallas.warp import (warp_trilinear, warp_fluid,
                                          gather_cells)
