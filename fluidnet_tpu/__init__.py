"""fluidnet_tpu: a TPU-native (JAX/XLA/Pallas) fluid-simulation + learning framework.

A from-scratch rebuild of the capabilities of google/FluidNet ("Accelerating
Eulerian Fluid Simulation With Convolutional Networks", Tompson et al.):

- MAC-grid incompressible Euler simulation: semi-Lagrangian / MacCormack
  advection, buoyancy, gravity, vorticity confinement, Manta cell-type
  boundary handling (reference: torch/tfluids/third_party/tfluids.cc).
- A learned ConvNet pressure projection (reference: torch/lib/model.lua)
  trained with divergence + unrolled long-term-divergence losses
  (reference: torch/lib/run_epoch.lua).
- Classical Jacobi and PCG Poisson solvers as baselines and ground-truth
  generators (reference: torch/tfluids/generic/tfluids.cu).
- Voxelized-obstacle scenes, plume BCs, 2-D/3-D sims with volume export
  (reference: torch/fluid_net_3d_sim.lua, torch/lib/simulate.lua).

Everything is a pure, jittable, differentiable function over 5-D arrays
(batch, channel, depth z, height y, width x) — 2-D domains use z == 1,
exactly mirroring the reference's always-5D convention
(torch/lib/load_manta_file.lua:38-49).
"""

from fluidnet_tpu.core.celltype import CellType
from fluidnet_tpu.core.grids import FluidState

__version__ = "0.1.0"
