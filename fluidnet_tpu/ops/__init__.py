from fluidnet_tpu.ops.advect import advect_scalar, advect_vel
from fluidnet_tpu.ops.boundary import set_wall_bcs
from fluidnet_tpu.ops.divergence import velocity_divergence
from fluidnet_tpu.ops.forces import (add_buoyancy, add_gravity, get_centered,
                                     vorticity_confinement)
from fluidnet_tpu.ops.velocity_update import velocity_update
