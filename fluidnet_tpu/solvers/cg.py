"""Matrix-free preconditioned conjugate-gradient pressure solver.

The reference's PCG (generic/tfluids.cu:751-1758) assembles a CSR
Laplacian per connected fluid component on the CPU, uploads it, and drives
cuSPARSE/cuBLAS from the host. The TPU-native design is matrix-free and
batched: the 7/5-point flags-aware Laplacian is a fused stencil, every
reduction is an on-device dot product, and the whole CG loop is one
`lax.while_loop` (shardable over a mesh, where the dots become psums —
SURVEY.md §5.8).

System semantics match setupLaplacian (generic/tfluids.cu:909-1095): for
fluid cells, diag = number of non-obstacle neighbors (out-of-domain counts
as obstacle), off-diagonal -1 for fluid neighbors; empty neighbors
contribute to the diagonal only (Dirichlet p = 0). The ic0 preconditioner
is replaced by a Jacobi (inverse-diagonal) preconditioner — incomplete
Cholesky is a sequential triangular solve that maps terribly to TPU
(SURVEY.md §7 hard-parts list); we compare on residual-vs-wallclock
instead of iteration parity.

DC null space: enclosed components make A singular, so the right-hand side
is projected against the per-component constant vectors before the solve
and the solution is mean-centered after, replacing the reference's CPU
flood-fill + mean subtraction (copyPressureFromSystem,
generic/tfluids.cu:1165-1188).
"""

from functools import partial

import jax
import jax.numpy as jnp

from fluidnet_tpu.core.celltype import is_fluid, is_obstacle
from fluidnet_tpu.ops import stencil as st
from fluidnet_tpu.solvers.components import (component_mean,
                                             connected_components)


def _laplacian_masks(flags, is_3d):
    fl = is_fluid(flags)
    ob = is_obstacle(flags)
    dirs = [(st.xm, st.xp), (st.ym, st.yp)]
    if is_3d:
        dirs.append((st.zm, st.zp))
    nbr_fluid = []
    diag = jnp.zeros(flags.shape, jnp.float32)
    for lo, hi in dirs:
        for sh in (lo, hi):
            # Out-of-domain neighbors count as obstacle (fill=True).
            non_obs = ~sh(ob, fill=True)
            diag = diag + non_obs.astype(jnp.float32)
            nbr_fluid.append(sh(fl, fill=False))
    return fl, diag, nbr_fluid, dirs


def make_apply_A(flags, is_3d):
    """Returns (apply_A, diag, fluid_mask) for the masked 7/5-point system."""
    fl, diag, nbr_fluid, dirs = _laplacian_masks(flags, is_3d)
    shifts = []
    for lo, hi in dirs:
        shifts.extend([lo, hi])
    flf = fl.astype(jnp.float32)

    def apply_A(p):
        off = jnp.zeros_like(p)
        for sh, nf in zip(shifts, nbr_fluid):
            off = off + jnp.where(nf, sh(p), 0.0)
        return jnp.where(fl, diag * p - off, jnp.zeros_like(p))

    return apply_A, diag, fl


def _bdot(a, b):
    """Per-batch dot product over all grid cells: (b,1,z,y,x)x2 -> (b,)."""
    n = a.shape[0]
    return jnp.sum((a * b).reshape(n, -1), axis=1)


def solve_pcg(flags, div, tol: float = 1e-4, max_iter: int = 100,
              precond: str = "jacobi", remove_null_space: bool = True):
    """Solves A p = div over fluid cells. Returns (p, residual).

    API mirrors tfluids.solveLinearSystemPCG (init.lua:645-677); the
    residual is the max-over-batch L2 norm of the final residual vector,
    matching the reference's max-over-components convention
    (generic/tfluids.cu:1756-1757).
    """
    assert precond in ("jacobi", "none")
    is_3d = div.shape[2] > 1
    apply_A, diag, fl = make_apply_A(flags, is_3d)
    flf = fl

    labels = None
    rhs = jnp.where(fl, div, jnp.zeros_like(div))
    if remove_null_space:
        labels = connected_components(flags)
        # Project the RHS of enclosed (all-neighbors-fluid-or-obstacle)
        # components against the constant null vector. Components touching
        # empty cells give a non-singular system; subtracting their mean
        # would perturb the solution, so restrict to singular components:
        # a component is singular iff no cell in it has an empty neighbor,
        # i.e. diag == (#non-obstacle nbrs) == (#fluid nbrs) everywhere.
        _, diag_n, nbr_fluid, _ = _laplacian_masks(flags, is_3d)
        n_fluid_nbrs = sum(nf.astype(jnp.float32) for nf in nbr_fluid)
        nonsing_cell = fl & (diag_n > n_fluid_nbrs)
        # Propagate "has a Dirichlet link" over each component via max.
        has_dirichlet = component_mean(
            nonsing_cell.astype(jnp.float32), labels, fl) > 0.0
        mean_rhs = component_mean(rhs, labels, fl)
        rhs = jnp.where(fl & ~has_dirichlet, rhs - mean_rhs, rhs)

    if precond == "jacobi":
        inv_diag = jnp.where(fl & (diag > 0), 1.0 / jnp.maximum(diag, 1.0),
                             jnp.zeros_like(diag))

        def M(r):
            return inv_diag * r
    else:
        def M(r):
            return jnp.where(fl, r, jnp.zeros_like(r))

    b = div.shape[0]
    p0 = jnp.zeros_like(div)
    r0 = rhs
    z0 = M(r0)
    d0 = z0
    rz0 = _bdot(r0, z0)

    def res_norm(r):
        return jnp.sqrt(_bdot(r, r))

    def cond(state):
        _, _, _, _, it, _, best_res = state
        return (it < max_iter) & (jnp.max(best_res) > tol)

    def body(state):
        p, r, d, rz, it, best_p, best_res = state
        Ad = apply_A(d)
        dAd = _bdot(d, Ad)
        alpha = jnp.where(dAd > 0, rz / jnp.where(dAd > 0, dAd, 1.0), 0.0)
        al = alpha.reshape(b, 1, 1, 1, 1)
        p = p + al * d
        r = r - al * Ad
        z = M(r)
        rz_new = _bdot(r, z)
        beta = jnp.where(rz > 0, rz_new / jnp.where(rz > 0, rz, 1.0), 0.0)
        d = z + beta.reshape(b, 1, 1, 1, 1) * d
        # fp32 CG can bounce after reaching its attainable accuracy; keep
        # the best iterate per batch so over-asked tolerances stay safe.
        res = res_norm(r)
        better = (res < best_res).reshape(b, 1, 1, 1, 1)
        best_p = jnp.where(better, p, best_p)
        best_res = jnp.minimum(res, best_res)
        return p, r, d, rz_new, it + 1, best_p, best_res

    state0 = (p0, r0, d0, rz0, 0, p0, res_norm(r0))
    _, _, _, _, _, p, best_res = jax.lax.while_loop(cond, body, state0)

    if remove_null_space:
        mean_p = component_mean(p, labels, fl)
        p = jnp.where(fl, p - mean_p, p)

    return p, jnp.max(best_res)
