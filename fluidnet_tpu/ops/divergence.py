"""MAC velocity divergence (Manta's makeRhs).

Vectorized port of Main_velocityDivergenceForward
(torch/tfluids/third_party/tfluids.cc:1008-1066). Note the Manta RHS sign
convention: div = u(i) - u(i+1) + v(j) - v(j+1) [+ w(k) - w(k+1)], i.e. the
NEGATIVE finite-difference divergence, zero on the 1-cell border and on
non-fluid cells. No flag checks on faces (assumes setWallBcs zeroed
obstacle-interface velocities).

The reference hand-writes the adjoint with atomic scatters
(torch/tfluids/generic/tfluids.cc:49-130); here XLA differentiates the
slice/pad stencil into the equivalent adjoint automatically.
"""

import jax.numpy as jnp

from fluidnet_tpu.core.celltype import is_fluid
from fluidnet_tpu.core.grids import border_mask, check_shapes
from fluidnet_tpu.ops import stencil as st


def velocity_divergence(u, flags):
    """Returns div of shape (b, 1, z, y, x)."""
    is_3d = check_shapes(u, flags)

    ux, uy = u[:, 0:1], u[:, 1:2]
    div = (ux - st.xp(ux)) + (uy - st.yp(uy))
    if is_3d:
        uz = u[:, 2:3]
        div = div + (uz - st.zp(uz))

    keep = is_fluid(flags) & ~border_mask(flags.shape, is_3d, bnd=1)
    return jnp.where(keep, div, jnp.zeros_like(div))
