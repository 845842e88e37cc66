from fluidnet_tpu.solvers.jacobi import solve_jacobi
from fluidnet_tpu.solvers.cg import solve_pcg
from fluidnet_tpu.solvers.components import (connected_components,
                                             normalize_pressure_mean)
