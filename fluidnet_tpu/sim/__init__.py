from fluidnet_tpu.sim.simulate import Boundaries, simulate, create_plume_bcs
