"""Explicit halo-exchange Jacobi smoother over a spatially-sharded grid.

The scale-out answer to the reference's single-GPU Jacobi solver
(generic/tfluids.cu:1764-1926): the grid's z axis is split across the 'sp'
mesh axis; every sweep exchanges one-cell z halos with the two neighbors
via `jax.lax.ppermute` (rides ICI) inside a `shard_map`, so the whole
multi-sweep loop compiles into one program with no host round trips.

This is the SURVEY.md §5.8 design: "ppermute halos for domain
decomposition; reductions become psums".
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from fluidnet_tpu.core.celltype import is_obstacle
from fluidnet_tpu.core.grids import border_mask
from fluidnet_tpu.ops import stencil as st


def _exchange_z_halos(x, axis_name):
    """Returns (lo_halo, hi_halo): the neighbors' boundary z-slices.

    lo_halo is the z-slice just below this shard (from the sp-1 neighbor);
    zeros at the mesh edge (matching the zero border the solver enforces).
    """
    n = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    top = x[:, :, -1:]     # my highest z slice -> goes up to rank+1
    bot = x[:, :, :1]      # my lowest z slice  -> goes down to rank-1
    up = [(i, i + 1) for i in range(n - 1)]
    down = [(i + 1, i) for i in range(n - 1)]
    lo = jax.lax.ppermute(top, axis_name, up)       # from rank-1
    hi = jax.lax.ppermute(bot, axis_name, down)     # from rank+1
    lo = jnp.where(idx == 0, jnp.zeros_like(lo), lo)
    hi = jnp.where(idx == n - 1, jnp.zeros_like(hi), hi)
    return lo, hi


def _sweep_sharded(p, div, masks, denom, axis_name):
    """One Jacobi sweep on a z-shard with halo exchange."""
    zero_mask, obs_xm, obs_xp, obs_ym, obs_yp, obs_zm, obs_zp = masks
    lo, hi = _exchange_z_halos(p, axis_name)

    def nb(shifted, obs_nb):
        return jnp.where(obs_nb, p, shifted)

    zm_p = jnp.concatenate([lo, p[:, :, :-1]], axis=2)   # p(k-1) w/ halo
    zp_p = jnp.concatenate([p[:, :, 1:], hi], axis=2)    # p(k+1) w/ halo
    tot = (nb(st.xm(p), obs_xm) + nb(st.xp(p), obs_xp) +
           nb(st.ym(p), obs_ym) + nb(st.yp(p), obs_yp) +
           nb(zm_p, obs_zm) + nb(zp_p, obs_zp))
    out = (tot + div) / denom
    return jnp.where(zero_mask, jnp.zeros_like(out), out)


def halo_jacobi_solve(flags, div, mesh, n_iter: int = 100):
    """Jacobi pressure solve with the grid z-sharded over mesh axis 'sp'.

    3-D only (z must be divisible by the sp size). Returns p with the same
    sharding as div. Border/obstacle masks are computed per shard — note
    the z *domain* border lives only on the first/last shard, which the
    global border_mask captures because it is computed on the full array
    BEFORE sharding (passed in as masks below via shard_map closure over
    sharded operands).
    """
    assert div.shape[2] > 1, "halo solver is for 3-D grids"
    denom = 6.0

    ob = is_obstacle(flags)
    bm = border_mask(flags.shape, True, 1)
    zero_mask = bm | ob
    # Neighbor-obstacle masks; computed globally (correct across shard
    # boundaries), sharded with the operands by shard_map.
    masks = (zero_mask,
             st.xm(ob, False), st.xp(ob, False),
             st.ym(ob, False), st.yp(ob, False),
             st.zm(ob, False), st.zp(ob, False))

    spec = P(None, None, "sp", None, None)
    masks_arr = jnp.stack([m.astype(jnp.bool_) for m in masks], axis=0)

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(spec, P(None, None, None, "sp", None, None)),
             out_specs=spec)
    def run2(div_s, masks_s):
        ms = tuple(masks_s[i] for i in range(7))
        def body(_, p):
            return _sweep_sharded(p, div_s, ms, denom, "sp")
        p0 = jnp.zeros_like(div_s)
        return jax.lax.fori_loop(0, n_iter, body, p0)

    return run2(div, masks_arr)
