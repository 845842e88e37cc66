"""Z-sharded windowed advection: shard_map + halo exchange around the
Pallas warp kernels.

This is the scale-out path for grids too large for one chip's HBM
(SURVEY.md §7 stage 7 / §2.3): the grid's z axis is split over the 'sp'
mesh axis, each shard exchanges H z-slices with its neighbors over ICI
(`jax.lax.ppermute`), runs the standard windowed advection
(ops.advect_fast — including the Pallas warp kernels, which execute
per-shard on local slabs) on the halo-extended slab, and crops.

Halo width: H = 2W + 2 covers the worst case (MacCormack bwd sweep reads
the fwd field within +-W, fwd reads u within +-(W+1) via the MAC
interpolation, and the 'Ours' free-space field reads flags within
+-(W+1)). Because displacements are window-clamped to +-(W - margin), no
interpolation or clamp-lookup ever consults the array extent for
non-border cells, so shard-local results equal the unsharded ones
exactly; domain-border cells use an explicit global border mask (the
positional `border_mask` would otherwise zero slab-internal halo rows).
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from fluidnet_tpu.ops.advect_fast import (advect_scalar_fast,
                                          advect_vel_fast)


def _exchange_z_halo(x, h: int, axis_name: str):
    """Extends (b, c, zl, y, x) with h z-slices from each z-neighbor
    shard; zeros past the global domain ends."""
    n = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    top = x[:, :, -h:]
    bot = x[:, :, :h]
    lo = jax.lax.ppermute(top, axis_name,
                          [(i, i + 1) for i in range(n - 1)])
    hi = jax.lax.ppermute(bot, axis_name,
                          [(i + 1, i) for i in range(n - 1)])
    lo = jnp.where(idx == 0, jnp.zeros_like(lo), lo)
    hi = jnp.where(idx == n - 1, jnp.zeros_like(hi), hi)
    return jnp.concatenate([lo, x, hi], axis=2)


def _global_border_mask(shape_ext, z_len_global, z0_global, is_3d):
    """Width-1 domain border for a halo-extended local slab: x/y edges are
    local (unsharded axes); the z edge is where the GLOBAL index is 0 or
    Z-1 (the slab edge itself is halo, not border)."""
    _, _, Ze, Y, X = shape_ext
    xi = jax.lax.broadcasted_iota(jnp.int32, (1, 1, Ze, Y, X), 4)
    yi = jax.lax.broadcasted_iota(jnp.int32, (1, 1, Ze, Y, X), 3)
    border = (xi == 0) | (xi == X - 1) | (yi == 0) | (yi == Y - 1)
    if is_3d:
        zg = jax.lax.broadcasted_iota(jnp.int32, (1, 1, Ze, Y, X), 2) + \
            z0_global
        border = border | (zg == 0) | (zg == z_len_global - 1)
    return border


def advect_step_z_sharded(dt, u, density, flags, mesh, method,
                          maccormack_strength, window,
                          sample_outside_fluid=False):
    """One advection block (scalars then velocity, simulate.lua:183-199)
    with the grid z-sharded over the mesh's 'sp' axis.

    u/density/flags: global (b, c, Z, Y, X) arrays (sharded or not —
    shard_map partitions them over 'sp'). Returns (u', density').
    """
    W = int(window)
    H = 2 * W + 2
    Z = u.shape[2]
    n_sp = mesh.shape["sp"]
    assert Z % n_sp == 0, f"Z={Z} must divide over sp={n_sp}"
    zl = Z // n_sp
    assert zl >= H, (f"shard z-length {zl} < halo {H}: the exchange only "
                     f"reaches immediate neighbors (use fewer sp shards)")

    def local(u_l, f_l, d_l=None):
        idx = jax.lax.axis_index("sp")
        ue = _exchange_z_halo(u_l, H, "sp")
        fe = _exchange_z_halo(f_l, H, "sp")
        border = _global_border_mask(fe.shape, Z, idx * zl - H, True)
        d_out = None
        if d_l is not None:
            de = _exchange_z_halo(d_l, H, "sp")
            chans = [advect_scalar_fast(
                dt, de[:, c:c + 1], ue, fe, method, sample_outside_fluid,
                maccormack_strength, W, border=border)
                for c in range(de.shape[1])]
            d_out = jnp.concatenate(chans, axis=1)[:, :, H:H + zl]
        u_out = advect_vel_fast(dt, ue, fe, method, maccormack_strength, W,
                                border=border)[:, :, H:H + zl]
        return (u_out, d_out) if d_l is not None else u_out

    spec = P(None, None, "sp", None, None)
    # check_vma=False: pallas_call out_shapes carry no vma annotation.
    if density is not None:
        fn = jax.shard_map(local, mesh=mesh, in_specs=(spec, spec, spec),
                           out_specs=(spec, spec), check_vma=False)
        return fn(u, flags, density)
    fn = jax.shard_map(lambda u_l, f_l: local(u_l, f_l), mesh=mesh,
                       in_specs=(spec, spec), out_specs=spec,
                       check_vma=False)
    return fn(u, flags), None
