"""Pressure-gradient velocity update (Manta's correctVelocity).

Vectorized port of Main_velocityUpdateForward
(torch/tfluids/third_party/tfluids.cc:1072-1156):

For interior cells (1-cell border untouched):
  fluid(i,j,k):
    u.x -= p(i) - p(i-1)   if fluid(i-1)
    u.x -= p(i)            if empty(i-1)
    (same for y/z faces)
  empty(i,j,k) and not outflow(i,j,k):
    u.x  = u.x + p(i-1)    if fluid(i-1)   else u.x = 0
    (same for y/z faces)
  otherwise: unchanged.

The reference hand-derives the adjoint w.r.t. p
(torch/tfluids/generic/tfluids.cc:216-349); XLA autodiff of this masked
stencil produces the same scatter pattern.
"""

import jax.numpy as jnp

from fluidnet_tpu.core.celltype import is_empty, is_fluid, is_outflow
from fluidnet_tpu.core.grids import border_mask, check_shapes
from fluidnet_tpu.ops import stencil as st


def velocity_update(u, flags, p):
    """Returns the updated MAC velocity U' = U - grad(p) with BC handling."""
    is_3d = check_shapes(u, flags, p)

    fl = is_fluid(flags)[:, 0]
    em = is_empty(flags)[:, 0]
    out = is_outflow(flags)[:, 0]
    interior = ~border_mask(flags.shape, is_3d, bnd=1)[:, 0]

    pc = p[:, 0]
    cur_empty_upd = em & ~out & interior

    def face(uc, fl_m, em_m, p_m):
        # fl_m/em_m/p_m: neighbor masks/pressure in the -axis direction
        # (filled False/0 at the low edge, matching the reference's implicit
        # bounds since border cells are excluded by `interior` anyway).
        upd = uc
        upd = jnp.where(fl & fl_m & interior, upd - (pc - p_m), upd)
        upd = jnp.where(fl & em_m & interior, upd - pc, upd)
        # Empty (non-outflow) cells:
        upd = jnp.where(cur_empty_upd & fl_m, upd + p_m, upd)
        upd = jnp.where(cur_empty_upd & ~fl_m, jnp.zeros_like(upd), upd)
        return upd

    ux = face(u[:, 0], st.xm(fl, False), st.xm(em, False), st.xm(pc))
    uy = face(u[:, 1], st.ym(fl, False), st.ym(em, False), st.ym(pc))
    if is_3d:
        uz = face(u[:, 2], st.zm(fl, False), st.zm(em, False), st.zm(pc))
        return jnp.stack([ux, uy, uz], axis=1)
    return jnp.stack([ux, uy], axis=1)
