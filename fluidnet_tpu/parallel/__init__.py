from fluidnet_tpu.parallel.mesh import make_mesh, batch_sharding, spatial_sharding
from fluidnet_tpu.parallel.halo import halo_jacobi_solve
