"""Signed distance field + O(n) rectangular blur.

Ports of Main_signedDistanceField (generic/tfluids.cc:766-826) and
Main_rectangularBlur (generic/tfluids.cc:670-765).

The SDF is the reference's brute-force local-window min distance to
obstacle cells, clamped at `search_rad` (used for the border-weighted loss,
lib/modules/fluid_criterion.lua:145-159). Vectorized, the O(r^d) window
search becomes a static unrolled min over shifted obstacle masks — XLA
fuses the whole thing; for the default search_rad=3 that's 27 (2-D) / 343
(3-D) fused select-min ops, done once per batch.

The rectangular blur is a separable box filter; on TPU a cumulative-sum
formulation keeps it O(n) like the reference's sliding-window trick.
"""

import jax.numpy as jnp

from fluidnet_tpu.core.celltype import is_obstacle
from fluidnet_tpu.ops import stencil as st


def signed_distance_field(flags, search_rad: int):
    """Distance (in cells, Euclidean) to the nearest obstacle within
    search_rad; clamped at search_rad; 0 inside obstacles."""
    is_3d = flags.shape[2] > 1
    ob = is_obstacle(flags)
    r = int(search_rad)
    dist_sq = jnp.full(flags.shape, float(r * r), jnp.float32)
    zr = range(-r, r + 1) if is_3d else [0]
    for dz in zr:
        for dy in range(-r, r + 1):
            for dx in range(-r, r + 1):
                d2 = float(dz * dz + dy * dy + dx * dx)
                if d2 >= r * r and (dz, dy, dx) != (0, 0, 0):
                    continue
                m = ob
                if dz:
                    m = st.shift(m, dz, st.AX_Z, False)
                if dy:
                    m = st.shift(m, dy, st.AX_Y, False)
                if dx:
                    m = st.shift(m, dx, st.AX_X, False)
                dist_sq = jnp.where(m, jnp.minimum(dist_sq, d2), dist_sq)
    out = jnp.sqrt(dist_sq)
    return jnp.where(ob, jnp.zeros_like(out), out)


def _box_blur_axis(x, rad: int, axis: int):
    """Mean over the window [i-rad, i+rad] with edge-replicated samples and
    constant 1/(2r+1) normalization, exactly like
    DoRectangularBlurAlongAxis (generic/tfluids.cc:642-668). The sliding
    window becomes a cumulative sum over the edge-padded array (same O(n))."""
    n = x.shape[axis]
    pad = [(0, 0)] * x.ndim
    pad[axis] = (rad, rad)
    xp = jnp.pad(x, pad, mode="edge")
    c = jnp.cumsum(xp, axis=axis)
    zero_shape = list(xp.shape)
    zero_shape[axis] = 1
    cpad = jnp.concatenate([jnp.zeros(zero_shape, x.dtype), c], axis=axis)
    # window for output i (0-based original coords): padded [i, i + 2r].
    idx_hi = jnp.arange(n) + 2 * rad + 1
    idx_lo = jnp.arange(n)
    sl_hi = jnp.take(cpad, idx_hi, axis=axis)
    sl_lo = jnp.take(cpad, idx_lo, axis=axis)
    return (sl_hi - sl_lo) / float(2 * rad + 1)


def rectangular_blur(src, blur_rad: int, is_3d: bool):
    """Separable box blur: z (3-D only), then y, then x."""
    out = src
    if is_3d:
        out = _box_blur_axis(out, blur_rad, src.ndim - 3)
    out = _box_blur_axis(out, blur_rad, src.ndim - 2)
    out = _box_blur_axis(out, blur_rad, src.ndim - 1)
    return out
