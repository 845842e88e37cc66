"""Jacobi pressure solver.

TPU-native port of solveLinearSystemJacobi
(torch/tfluids/generic/tfluids.cu:1764-1926): ping-pong Jacobi iteration

    p <- (p(i-1) + p(i+1) + p(j-1) + p(j+1) [+ p(k-1) + p(k+1)] + div) / (4|6)

with obstacle neighbors reflecting the center value, zero pressure on the
1-cell border and in obstacle cells, termination on max-over-batch
||p - p_prev||_2 < p_tol or max_iter. The CUDA host loop becomes a single
`lax.while_loop` (one compiled program, no per-iteration host round trips).
"""

import jax
import jax.numpy as jnp

from fluidnet_tpu.core.celltype import is_obstacle
from fluidnet_tpu.core.grids import border_mask, check_shapes
from fluidnet_tpu.ops import stencil as st


def _sweep(p, div, masks, denom):
    """One Jacobi iteration (kernel_jacobiIteration semantics)."""
    zero_mask, obs_xm, obs_xp, obs_ym, obs_yp, obs_zm, obs_zp, is_3d = masks

    def nb(shifted, obs_nb):
        return jnp.where(obs_nb, p, shifted)

    tot = (nb(st.xm(p), obs_xm) + nb(st.xp(p), obs_xp) +
           nb(st.ym(p), obs_ym) + nb(st.yp(p), obs_yp))
    if is_3d:
        tot = tot + nb(st.zm(p), obs_zm) + nb(st.zp(p), obs_zp)
    out = (tot + div) / denom
    return jnp.where(zero_mask, jnp.zeros_like(out), out)


def solve_jacobi(flags, div, p_tol: float = 1e-5, max_iter: int = 1000,
                 allow_pallas: bool = True):
    """Solves the pressure Poisson system. Returns (p, residual).

    API mirrors tfluids.solveLinearSystemJacobi
    (torch/tfluids/init.lua:693-735); p always starts from zero like the
    reference (generic/tfluids.cu:1853-1855).

    Fixed-iteration solves (p_tol == 0) on VMEM-sized grids run as one
    fused Pallas kernel (solvers/pallas_jacobi.py); the residual is then
    not tracked (returned as 0 like a converged delta), matching the
    simulate loop's usage which ignores it (simulate.lua:287-292).
    """
    if p_tol == 0.0 and allow_pallas:
        from fluidnet_tpu.solvers.pallas_jacobi import fits_vmem, jacobi_pallas
        if fits_vmem(div.shape):
            p = jacobi_pallas(flags, div, max_iter)
            return p, jnp.zeros((), div.dtype)
    is_3d = div.shape[2] > 1
    ob = is_obstacle(flags)
    bm = border_mask(flags.shape, is_3d, 1)
    zero_mask = bm | ob
    masks = (zero_mask,
             st.xm(ob, False), st.xp(ob, False),
             st.ym(ob, False), st.yp(ob, False),
             st.zm(ob, False), st.zp(ob, False), is_3d)
    denom = 6.0 if is_3d else 4.0
    b = div.shape[0]

    p0 = jnp.zeros_like(div)

    def cond(state):
        _, _, it, res = state
        return (it < max_iter) & ((res >= p_tol) | (it < 1))

    def body(state):
        p, _, it, _ = state
        p_new = _sweep(p, div, masks, denom)
        delta = (p_new - p).reshape(b, -1)
        res = jnp.max(jnp.sqrt(jnp.sum(delta * delta, axis=1)))
        return p_new, p, it + 1, res

    big = jnp.asarray(jnp.finfo(div.dtype).max, div.dtype)
    p, _, _, res = jax.lax.while_loop(cond, body, (p0, p0, 0, big))
    return p, res
