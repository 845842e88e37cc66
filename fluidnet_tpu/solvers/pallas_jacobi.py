"""Fused Jacobi pressure solve: all sweeps in VMEM, one kernel launch.

The XLA formulation (solvers/jacobi.py) round-trips p through HBM every
sweep (~16 MB of traffic each); at the reference's matched-cost setting
(maxIter=34 at 128^3, fluid_net_3d_sim.lua:80) that's ~70 ms on this
chip. This kernel keeps p, div and the obstacle mask resident in VMEM for
the entire fixed-iteration solve — one HBM read of the inputs, one write
of the result.

Semantics match kernel_jacobiIteration (generic/tfluids.cu:1764-1821)
exactly: zero pressure on the border and obstacles, obstacle neighbors
reflect the center value. The circular rolls are safe without edge masks
because the 1-cell domain border is always zeroed: wrapped reads only ever
feed border outputs (forced 0) or read border values (0).

Used by solve_jacobi for fixed-iteration solves (p_tol == 0) when the
grid fits VMEM; the while_loop XLA path remains for tolerance-terminated
solves and oversized grids.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fluidnet_tpu.core.celltype import is_obstacle


def _interpret():
    return jax.default_backend() == "cpu"


def _kernel(div_ref, obs_ref, out_ref, *, n_sweeps, Z, Y, X, is_3d):
    div = div_ref[0, 0]
    obs = obs_ref[0, 0]
    denom = 6.0 if is_3d else 4.0

    # Border mask (bnd=1) from iotas; in 2-D the z border is not special.
    jy = jax.lax.broadcasted_iota(jnp.int32, (Z, Y, X), 1)
    jx = jax.lax.broadcasted_iota(jnp.int32, (Z, Y, X), 2)
    border = (jx < 1) | (jx > X - 2) | (jy < 1) | (jy > Y - 2)
    if is_3d:
        jz = jax.lax.broadcasted_iota(jnp.int32, (Z, Y, X), 0)
        border = border | (jz < 1) | (jz > Z - 2)
    zero_mask = border | (obs > 0.5)

    def roll(a, off, axis):
        n = a.shape[axis]
        return pltpu.roll(a, (-off) % n, axis)

    def sweep(_, p):
        tot = jnp.zeros_like(p)
        axes = [(2, X), (1, Y)] + ([(0, Z)] if is_3d else [])
        for axis, _n in axes:
            for off in (-1, 1):
                p_nb = roll(p, off, axis)
                o_nb = roll(obs, off, axis)
                tot = tot + jnp.where(o_nb > 0.5, p, p_nb)
        out = (tot + div) / denom
        return jnp.where(zero_mask, jnp.zeros_like(out), out)

    p = jax.lax.fori_loop(0, n_sweeps, sweep, jnp.zeros_like(div))
    out_ref[0, 0] = p


@functools.partial(jax.jit, static_argnames=("n_sweeps",))
def jacobi_pallas(flags, div, n_sweeps: int):
    """Fixed-iteration Jacobi solve. Returns p with the usual
    (b, 1, Z, Y, X) shape."""
    b, _, Z, Y, X = div.shape
    is_3d = Z > 1
    obs = is_obstacle(flags).astype(jnp.float32)
    obs = jnp.broadcast_to(obs, div.shape)
    spec = pl.BlockSpec((1, 1, Z, Y, X), lambda i: (i, 0, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, n_sweeps=n_sweeps, Z=Z, Y=Y, X=X,
                          is_3d=is_3d),
        grid=(b,),
        in_specs=[spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(div.shape, jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=_interpret(),
    )(div, obs)


def fits_vmem(shape, budget_bytes: int = 80 * 1024 * 1024):
    """Conservative VMEM feasibility: ~5 live copies of the grid."""
    _, _, Z, Y, X = shape
    return 5 * Z * Y * X * 4 <= budget_bytes and X % 128 == 0 and Y % 8 == 0
