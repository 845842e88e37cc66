"""Trilinear / fluid-aware interpolation and MAC-grid sampling.

Vectorized ports of the reference grid sampling machinery:
  - buildIndex        (third_party/grid.cc:82-130, Manta's BUILD_INDEX)
  - RealGrid::interpol            (grid.cc:182-202)
  - RealGrid::interpolWithFluid   (grid.cc:204-332)
  - MACGrid::interpolComponent    (grid.cc:435-456)
  - MACGrid::getAtMACX/Y/Z        (grid.cc:374-417)

All positions are in Manta grid coordinates: the center of cell (i, j, k)
is at (i+0.5, j+0.5, k+0.5). Position arrays have shape (b, z, y, x); the
sampled fields are (b, c, z, y, x).

The gathers are expressed as flattened jnp.take_along_axis so XLA lowers a
single gather HLO per corner (value + fluid-mask channels share one gather).
"""

from typing import NamedTuple

import jax.numpy as jnp

from fluidnet_tpu.core.celltype import is_fluid


class _Idx(NamedTuple):
    xi: jnp.ndarray
    yi: jnp.ndarray
    zi: jnp.ndarray
    s0: jnp.ndarray
    s1: jnp.ndarray
    t0: jnp.ndarray
    t1: jnp.ndarray
    f0: jnp.ndarray
    f1: jnp.ndarray


def build_index(px, py, pz, shape, is_3d):
    """The BUILD_INDEX clamp logic (grid.cc:82-130).

    px/py/pz: float positions (b, z, y, x). shape: grid (Z, Y, X).
    Returns lower corner indices and the two lerp weights per axis.
    """
    Z, Y, X = shape
    px = px - 0.5
    py = py - 0.5
    pz = pz - 0.5

    def one_axis(p, n):
        i = jnp.floor(p).astype(jnp.int32)
        w1 = p - i.astype(p.dtype)
        w0 = 1.0 - w1
        # Clamp to border (grid.cc:97-129).
        neg = p < 0.0
        i = jnp.where(neg, 0, i)
        w0 = jnp.where(neg, 1.0, w0)
        w1 = jnp.where(neg, 0.0, w1)
        hi = i >= n - 1
        i = jnp.where(hi, n - 2, i)
        w0 = jnp.where(hi, 0.0, w0)
        w1 = jnp.where(hi, 1.0, w1)
        return i, w0, w1

    xi, s0, s1 = one_axis(px, X)
    yi, t0, t1 = one_axis(py, Y)
    if is_3d:
        zi, f0, f1 = one_axis(pz, Z)
    else:
        zi = jnp.zeros_like(xi)
        f0 = jnp.ones_like(s0)
        f1 = jnp.zeros_like(s0)
    return _Idx(xi, yi, zi, s0, s1, t0, t1, f0, f1)


def gather3d(fields, xi, yi, zi):
    """fields[b, :, zi, yi, xi] with per-cell integer indices.

    fields: (b, c, Z, Y, X); xi/yi/zi: (b, z, y, x) int32 (must be in range).
    Returns (b, c, z, y, x). One XLA gather for all c channels.
    """
    b, c, Z, Y, X = fields.shape
    lin = (zi * Y + yi) * X + xi
    flat = fields.reshape(b, c, Z * Y * X)
    out = jnp.take_along_axis(
        flat, lin.reshape(b, 1, -1), axis=2, mode="clip")
    return out.reshape(b, c, *xi.shape[1:])


def _corners(idx, is_3d):
    """The 8 (4 in 2-D) corner index triples + weights, in the reference's
    combine order: y (t) first, then x (s), then z (f)."""
    xi, yi, zi = idx.xi, idx.yi, idx.zi
    c = [
        (xi, yi, zi), (xi, yi + 1, zi),
        (xi + 1, yi, zi), (xi + 1, yi + 1, zi),
    ]
    if is_3d:
        c += [
            (xi, yi, zi + 1), (xi, yi + 1, zi + 1),
            (xi + 1, yi, zi + 1), (xi + 1, yi + 1, zi + 1),
        ]
    return c


def interpol(field, px, py, pz, is_3d):
    """Plain (tri)linear interpolation, RealGrid::interpol semantics.

    field: (b, c, Z, Y, X) — interpolates every channel with the same
    positions. Returns (b, c, z, y, x).
    """
    idx = build_index(px, py, pz, field.shape[2:], is_3d)
    cs = _corners(idx, is_3d)
    g = [gather3d(field, *c) for c in cs]
    s0 = idx.s0[:, None]
    s1 = idx.s1[:, None]
    t0 = idx.t0[:, None]
    t1 = idx.t1[:, None]
    lo = (g[0] * t0 + g[1] * t1) * s0 + (g[2] * t0 + g[3] * t1) * s1
    if not is_3d:
        return lo
    hi = (g[4] * t0 + g[5] * t1) * s0 + (g[6] * t0 + g[7] * t1) * s1
    return lo * idx.f0[:, None] + hi * idx.f1[:, None]


def _lerp1d_with_fluid(va, fa, vb, fb, ta, tb):
    """interpol1DWithFluid (grid.cc:204-222): lerp only between fluid
    samples; fall back to the fluid one; zero (and not-fluid) if neither."""
    val = jnp.where(
        fa & fb, va * ta + vb * tb,
        jnp.where(fa, va, jnp.where(fb, vb, jnp.zeros_like(va))))
    return val, fa | fb


def interpol_with_fluid(field, flags, px, py, pz, is_3d):
    """RealGrid::interpolWithFluid (grid.cc:224-332).

    Combines corner values along y, then x, then z, at each step lerping
    only between fluid samples. If no corner is fluid, falls back to the
    plain interpolation. field: (b, 1, Z, Y, X).
    """
    idx = build_index(px, py, pz, field.shape[2:], is_3d)
    cs = _corners(idx, is_3d)
    # Pack value + fluid mask into one gather per corner.
    fl = is_fluid(flags).astype(field.dtype)
    packed = jnp.concatenate([field, fl], axis=1)  # (b, 2, Z, Y, X)
    g = [gather3d(packed, *c) for c in cs]
    vals = [x[:, 0:1] for x in g]
    fmask = [x[:, 1:2] > 0.5 for x in g]

    s0, s1 = idx.s0[:, None], idx.s1[:, None]
    t0, t1 = idx.t0[:, None], idx.t1[:, None]

    v_ab, f_ab = _lerp1d_with_fluid(vals[0], fmask[0], vals[1], fmask[1], t0, t1)
    v_cd, f_cd = _lerp1d_with_fluid(vals[2], fmask[2], vals[3], fmask[3], t0, t1)
    v_lo, f_lo = _lerp1d_with_fluid(v_ab, f_ab, v_cd, f_cd, s0, s1)
    if is_3d:
        v_ef, f_ef = _lerp1d_with_fluid(vals[4], fmask[4], vals[5], fmask[5],
                                        t0, t1)
        v_gh, f_gh = _lerp1d_with_fluid(vals[6], fmask[6], vals[7], fmask[7],
                                        t0, t1)
        v_hi, f_hi = _lerp1d_with_fluid(v_ef, f_ef, v_gh, f_gh, s0, s1)
        v, f = _lerp1d_with_fluid(v_lo, f_lo, v_hi, f_hi,
                                  idx.f0[:, None], idx.f1[:, None])
    else:
        v, f = v_lo, f_lo

    # No fluid corner at all -> plain interp of the same corners
    # (grid.cc:290-296). Reuse the gathered values rather than re-gathering.
    plain_lo = (vals[0] * t0 + vals[1] * t1) * s0 + \
               (vals[2] * t0 + vals[3] * t1) * s1
    if is_3d:
        plain_hi = (vals[4] * t0 + vals[5] * t1) * s0 + \
                   (vals[6] * t0 + vals[7] * t1) * s1
        plain = plain_lo * idx.f0[:, None] + plain_hi * idx.f1[:, None]
    else:
        plain = plain_lo
    return jnp.where(f, v, plain)


def interpol_component(u, c, px, py, pz, is_3d):
    """MACGrid::getInterpolatedComponentHi order-1: plain interp of one MAC
    component channel (grid.cc:435-456)."""
    return interpol(u[:, c:c + 1], px, py, pz, is_3d)[:, 0]


# --- MAC face-centered full-velocity reconstruction (grid.cc:374-417). ---
# These average the transverse components around a face. The reference only
# evaluates them at interior cells (bnd >= 1); shifted reads fill 0 at the
# domain edge, which callers mask away.

def get_at_mac_x(u, is_3d):
    from fluidnet_tpu.ops import stencil as st
    vx = u[:, 0]
    vy = 0.25 * (u[:, 1] + st.xm(u[:, 1]) + st.yp(u[:, 1]) +
                 st.xm(st.yp(u[:, 1])))
    if is_3d:
        vz = 0.25 * (u[:, 2] + st.xm(u[:, 2]) + st.zp(u[:, 2]) +
                     st.xm(st.zp(u[:, 2])))
    else:
        vz = jnp.zeros_like(vx)
    return jnp.stack([vx, vy, vz], axis=1)


def get_at_mac_y(u, is_3d):
    from fluidnet_tpu.ops import stencil as st
    vx = 0.25 * (u[:, 0] + st.ym(u[:, 0]) + st.xp(u[:, 0]) +
                 st.ym(st.xp(u[:, 0])))
    vy = u[:, 1]
    if is_3d:
        vz = 0.25 * (u[:, 2] + st.ym(u[:, 2]) + st.zp(u[:, 2]) +
                     st.ym(st.zp(u[:, 2])))
    else:
        vz = jnp.zeros_like(vx)
    return jnp.stack([vx, vy, vz], axis=1)


def get_at_mac_z(u, is_3d):
    from fluidnet_tpu.ops import stencil as st
    assert is_3d
    vx = 0.25 * (u[:, 0] + st.zm(u[:, 0]) + st.xp(u[:, 0]) +
                 st.zm(st.xp(u[:, 0])))
    vy = 0.25 * (u[:, 1] + st.zm(u[:, 1]) + st.yp(u[:, 1]) +
                 st.zm(st.yp(u[:, 1])))
    vz = u[:, 2]
    return jnp.stack([vx, vy, vz], axis=1)


def cell_center_positions(shape, dtype=jnp.float32):
    """(px, py, pz) arrays of cell-center coordinates, each (1, z, y, x)."""
    b, _, Z, Y, X = shape
    import jax
    px = jax.lax.broadcasted_iota(dtype, (1, Z, Y, X), 3) + 0.5
    py = jax.lax.broadcasted_iota(dtype, (1, Z, Y, X), 2) + 0.5
    pz = jax.lax.broadcasted_iota(dtype, (1, Z, Y, X), 1) + 0.5
    return px, py, pz
