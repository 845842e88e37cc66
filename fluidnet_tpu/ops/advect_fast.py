"""Windowed (Pallas-accelerated) advection — the production TPU path.

Same method set as ops.advect (euler/maccormack Manta semantics + the
"Ours" variants), re-expressed on the CFL-bounded windowed-warp kernel
(ops.pallas.warp) so no arbitrary gathers remain:

  - every interpolation is a warp_trilinear / warp_fluid kernel call;
  - the geometry-aware line trace (generic/calc_line_trace.cc) becomes a
    Chebyshev free-space clamp: displacement is scaled so the backtrace
    endpoint provably stays out of non-fluid cells (a conservative,
    branch-free equivalent of the reference's cell-by-cell ray march —
    rays stop at the free-space radius instead of the exact wall hit);
  - MacCormack clamp bounds come from precomputed pairwise-corner min/max
    fields + one windowed cell gather (instead of 16 scattered reads,
    third_party/tfluids.cc:249-325);
  - fluid-aware sampling uses mask-renormalized trilinear interpolation
    (see warp_fluid) instead of the pairwise cascade.

Deviations from bit-exact reference semantics (all CFL-bounded; the exact
gather path in ops.advect remains available via window=None):
  1. displacements are clamped to +-(window-eps) cells (a CFL limiter);
  2. "Ours" boundary handling clamps at the Chebyshev free-space radius;
  3. fluid-aware interpolation renormalizes rather than cascades.
"""

import functools

import jax
import jax.numpy as jnp

from fluidnet_tpu.core.celltype import is_fluid, is_obstacle
from fluidnet_tpu.core.grids import border_mask, check_shapes
from fluidnet_tpu.ops import stencil as st
from fluidnet_tpu.ops.forces import get_centered
from fluidnet_tpu.ops.interp import (cell_center_positions, get_at_mac_x,
                                     get_at_mac_y, get_at_mac_z)
from fluidnet_tpu.ops.pallas.warp import (clamp_displacement, gather_cells,
                                          warp_fluid, warp_group,
                                          warp_trilinear,
                                          warp_trilinear_shared)

_EPS = 1e-3


def _positions(shape, b, dtype=jnp.float32):
    px, py, pz = cell_center_positions(shape, dtype)
    bx = jnp.broadcast_to(px, (b,) + px.shape[1:])
    by = jnp.broadcast_to(py, (b,) + py.shape[1:])
    bz = jnp.broadcast_to(pz, (b,) + pz.shape[1:])
    return bx, by, bz


def chebyshev_free_space(flags, max_d: int):
    """Chebyshev distance (in cells, capped at max_d) from each cell to the
    nearest non-fluid cell, via iterated 3^d max-filter dilation of the
    blocked mask. D(c) >= 1 for fluid cells; a position within the open
    cube of half-width D - 0.5 around c's center cannot lie in a non-fluid
    cell."""
    is_3d = flags.shape[2] > 1
    blocked = (~is_fluid(flags)).astype(jnp.float32)

    def dilate(m):
        for ax in ([st.AX_Z, st.AX_Y, st.AX_X] if is_3d
                   else [st.AX_Y, st.AX_X]):
            m = jnp.maximum(m, jnp.maximum(st.shift(m, -1, ax, 1.0),
                                           st.shift(m, 1, ax, 1.0)))
        return m

    d = jnp.where(blocked > 0.5, 0.0, float(max_d))
    m = blocked
    for k in range(1, max_d):
        m = dilate(m)
        d = jnp.minimum(d, jnp.where(m > 0.5, float(k), float(max_d)))
    return d


def _trace_clamp(flags, dx, dy, dz, window, free=None):
    """The fast 'line trace': scales displacement so the endpoint stays in
    free space (replaces calcLineTrace for the Ours variants)."""
    if free is None:
        free = chebyshev_free_space(flags, window + 1)
    allowed = jnp.maximum(free[:, 0] - 0.5 - _EPS, 0.0)
    mag = jnp.maximum(jnp.maximum(jnp.abs(dx), jnp.abs(dy)), jnp.abs(dz))
    scale = jnp.minimum(1.0, allowed / jnp.maximum(mag, 1e-12))
    return dx * scale, dy * scale, dz * scale


# -----------------------------------------------------------------------------
# Scalar advection.
# -----------------------------------------------------------------------------

def _euler_pos_scalar(s, u, flags, dt, is_3d, W, ours, free=None):
    b = s.shape[0]
    cent = get_centered(u, is_3d)
    dx, dy, dz = -dt * cent[:, 0], -dt * cent[:, 1], -dt * cent[:, 2]
    if ours:
        dx, dy, dz = _trace_clamp(flags, dx, dy, dz, W, free)
    dx, dy, dz = clamp_displacement(dx, dy, dz, W)
    px, py, pz = _positions(s.shape, b, s.dtype)
    return px + dx, py + dy, pz + dz


def _sample_scalar_fast(s, flags, px, py, pz, sample_outside_fluid, W):
    if sample_outside_fluid:
        return warp_trilinear_shared(s, px, py, pz, window=W)
    return warp_fluid(s, flags, px, py, pz, window=W)


def _corner_minmax_fields(src, is_3d):
    """Pairwise 2x2x2 corner min/max: mn2(c) = min over src[c + {0,1}^d]
    (the corner set doClampComponent scans, tfluids.cc:263-287)."""
    mn = jnp.minimum(src, st.xp(src, jnp.inf))
    mx = jnp.maximum(src, st.xp(src, -jnp.inf))
    mn = jnp.minimum(mn, st.yp(mn, jnp.inf))
    mx = jnp.maximum(mx, st.yp(mx, -jnp.inf))
    if is_3d:
        mn = jnp.minimum(mn, st.zp(mn, jnp.inf))
        mx = jnp.maximum(mx, st.zp(mx, -jnp.inf))
    return mn, mx


def _clamp_lookup_cells(vel_x, vel_y, vel_z, sign, shape, is_3d, W,
                        grid_upper):
    """Integer base-corner cells for the clamp lookups: clamp(trunc(i +
    sign*vel), 0, gridUpper-1), additionally window-limited."""
    Z, Y, X = shape[2:]
    b = vel_x.shape[0]
    import jax as _jax
    ii = _jax.lax.broadcasted_iota(jnp.int32, (1, Z, Y, X), 3)
    jj = _jax.lax.broadcasted_iota(jnp.int32, (1, Z, Y, X), 2)
    kk = _jax.lax.broadcasted_iota(jnp.int32, (1, Z, Y, X), 1)

    def one(iidx, v, n):
        p = iidx.astype(v.dtype) + sign * v
        c = jnp.trunc(p).astype(jnp.int32)
        c = jnp.clip(c, iidx - W, iidx + W)     # windowed-gather contract
        return jnp.clip(c, 0, n - 2)
    cx = one(ii, vel_x, X)
    cy = one(jj, vel_y, Y)
    if is_3d:
        cz = one(kk, vel_z, Z)
    else:
        cz = jnp.zeros_like(cx)
    return cx, cy, cz


def _lookup_bad(vel_x, vel_y, vel_z, flags, is_3d, W):
    """Out-of-grid / into-obstacle test for the Manta clamp reverts
    (tfluids.cc:304-322), both lookup directions."""
    Z, Y, X = flags.shape[2:]
    import jax as _jax
    ii = _jax.lax.broadcasted_iota(jnp.float32, (1, Z, Y, X), 3)
    jj = _jax.lax.broadcasted_iota(jnp.float32, (1, Z, Y, X), 2)
    kk = _jax.lax.broadcasted_iota(jnp.float32, (1, Z, Y, X), 1)
    ob = is_obstacle(flags).astype(jnp.float32)
    bad = None
    for sign in (-1.0, 1.0):
        px = jnp.trunc(ii + 0.5 + sign * vel_x).astype(jnp.int32)
        py = jnp.trunc(jj + 0.5 + sign * vel_y).astype(jnp.int32)
        pz = jnp.trunc(kk + 0.5 + sign * vel_z).astype(jnp.int32)
        oob = (px < 0) | (py < 0) | (px > X - 1) | (py > Y - 1)
        if is_3d:
            oob = oob | (pz < 0) | (pz > Z - 1)
        cx = jnp.clip(px, ii.astype(jnp.int32) - W, ii.astype(jnp.int32) + W)
        cy = jnp.clip(py, jj.astype(jnp.int32) - W, jj.astype(jnp.int32) + W)
        cz = jnp.clip(pz, kk.astype(jnp.int32) - W, kk.astype(jnp.int32) + W)
        cx = jnp.clip(cx, 0, X - 1)
        cy = jnp.clip(cy, 0, Y - 1)
        cz = jnp.clip(cz, 0, Z - 1) if is_3d else jnp.zeros_like(cx)
        obs = gather_cells(ob, cx, cy, cz, window=W)[:, 0] > 0.5
        this = oob | (~oob & obs)
        bad = this if bad is None else (bad | this)
    return bad


def advect_scalar_fast(dt, s, u, flags, method, sample_outside_fluid,
                       maccormack_strength, window, free=None, border=None):
    is_3d = check_shapes(u, flags, s)
    W = int(window)
    if border is None:
        border = border_mask(flags.shape, is_3d, 1)
    zero = jnp.zeros_like(s)
    fl = is_fluid(flags)

    def apply_border(x):
        return jnp.where(border, zero, x)

    ours = method.endswith("Ours")
    if ours and free is None:
        free = chebyshev_free_space(flags, W + 1)

    if method in ("euler", "eulerOurs", "rk2Ours", "rk3Ours"):
        # rk2/rk3 fast variants reduce to the clamped Euler backtrace: the
        # intermediate velocity samples shift positions by O(dt^2) within
        # the already-clamped window; the free-space clamp supplies the
        # boundary handling the RK restarts existed for.
        px, py, pz = _euler_pos_scalar(s, u, flags, dt, is_3d, W, ours, free)
        val = _sample_scalar_fast(s, flags, px, py, pz,
                                  sample_outside_fluid or not ours, W)
        if ours:
            val = jnp.where(fl, val, s)
        return apply_border(val)

    # MacCormack variants.
    px, py, pz = _euler_pos_scalar(s, u, flags, dt, is_3d, W, ours, free)
    mn = mx = have = None
    if ours:
        # Fused fwd sweep: the clamp bounds ride the interpolation as
        # support min/max of (fluid-masked, for sample_outside_fluid=
        # False) +-sentinel channels — the separable-filter minmax fields
        # and the standalone nearest-gather lookup disappear. Non-fluid
        # cells warp their own centers (tfluids.cc:157-160), which leaves
        # their sampled value at s — the same value the 'Ours' fluid mask
        # would restore — so one position set serves values AND bounds.
        # Bounds deviation vs the exact path: support corners {i, i+1}^3
        # of the (window-clamped) position instead of the (2W+1)^3 window
        # around the lookup cell — the same deviation the MAC velocity
        # path ships (see advect_vel_fast).
        cpx, cpy, cpz = _positions(s.shape, s.shape[0], s.dtype)
        flm = fl[:, 0]
        px = jnp.where(flm, px, cpx)
        py = jnp.where(flm, py, cpy)
        pz = jnp.where(flm, pz, cpz)
        BIG = jnp.asarray(1e30, s.dtype)
        if sample_outside_fluid:
            o1 = warp_group(s[:, None], px[:, None], py[:, None],
                            pz[:, None], window=W, minmax=True)[:, 0]
            fwd_full, mn, mx = o1[:, 0:1], o1[:, 1:2], o1[:, 2:3]
            have = jnp.ones_like(mn, bool)
        else:
            m = fl.astype(s.dtype)
            bmin = jnp.where(fl, s, BIG)
            bmax = jnp.where(fl, s, -BIG)
            srcs = tuple(a[:, None] for a in (bmin, bmax, s, s * m, m))
            o1 = warp_group(srcs, px[:, None], py[:, None], pz[:, None],
                            window=W, minmax=(0, 1))[:, 0]
            plain, num, den = o1[:, 2:3], o1[:, 3:4], o1[:, 4:5]
            safe = den > 1e-6
            fwd_full = jnp.where(safe, num / jnp.where(safe, den, 1.0),
                                 plain)
            mn, mx = o1[:, 5:6], o1[:, 6:7]
            have = mn < BIG * 0.5
        fwd_full = jnp.where(fl, fwd_full, s)
    else:
        fwd_full = _sample_scalar_fast(s, flags, px, py, pz,
                                       sample_outside_fluid or not ours, W)
    fwd = apply_border(fwd_full)
    bx, by, bz = _euler_pos_scalar(fwd, u, flags, -dt, is_3d, W, ours, free)
    bwd_full = _sample_scalar_fast(fwd, flags, bx, by, bz,
                                   sample_outside_fluid or not ours, W)
    if ours:
        bwd_full = jnp.where(fl, bwd_full, fwd)
    bwd = apply_border(bwd_full)
    dst = fwd + jnp.where(fl, maccormack_strength * 0.5 * (s - bwd), 0.0)

    if method == "maccormack":
        # Manta clamp: corner min/max around both lookups + revert tests.
        cent = get_centered(u, is_3d)
        vx, vy, vz = cent[:, 0] * dt, cent[:, 1] * dt, cent[:, 2] * dt
        mn2, mx2 = _corner_minmax_fields(s, is_3d)
        packed = jnp.concatenate([mn2, mx2], axis=1)
        mn = mx = None
        for sign in (-1.0, 1.0):
            cx, cy, cz = _clamp_lookup_cells(vx, vy, vz, sign, flags.shape,
                                             is_3d, W, None)
            g = gather_cells(packed, cx, cy, cz, window=W)
            mn = g[:, 0:1] if mn is None else jnp.minimum(mn, g[:, 0:1])
            mx = g[:, 1:2] if mx is None else jnp.maximum(mx, g[:, 1:2])
        clamped = jnp.clip(dst, mn, mx)
        bad = _lookup_bad(vx, vy, vz, flags, is_3d, W)[:, None]
        clamped = jnp.where(bad, fwd, clamped)
        return jnp.where(border, dst, clamped)

    # maccormackOurs clamp: support min/max computed in the fused fwd
    # sweep above; no fluid corner in the support -> revert to fwd
    # (the cnt==0 rule of getClampBounds, tfluids.cc:124-166).
    clamped = jnp.where(have, jnp.clip(dst, mn, mx), fwd)
    return jnp.where(border, dst, clamped)


# -----------------------------------------------------------------------------
# MAC velocity self-advection.
# -----------------------------------------------------------------------------

def _mac_positions(u, flags, dt, is_3d, W, ours, free=None):
    """Per-component backtrace positions (b, c, z, y, x)."""
    b = u.shape[0]
    macs = [get_at_mac_x(u, is_3d), get_at_mac_y(u, is_3d)]
    if is_3d:
        macs.append(get_at_mac_z(u, is_3d))
    px, py, pz = _positions(u.shape, b, u.dtype)
    pxs, pys, pzs = [], [], []
    for mac in macs:
        dx, dy, dz = -dt * mac[:, 0], -dt * mac[:, 1], -dt * mac[:, 2]
        if ours:
            dx, dy, dz = _trace_clamp(flags, dx, dy, dz, W, free)
        dx, dy, dz = clamp_displacement(dx, dy, dz, W)
        pxs.append(px + dx)
        pys.append(py + dy)
        pzs.append(pz + dz)
    return (jnp.stack(pxs, 1), jnp.stack(pys, 1), jnp.stack(pzs, 1)), macs


def advect_vel_fast(dt, u, flags, method, maccormack_strength, window,
                    free=None, border=None):
    is_3d = check_shapes(u, flags)
    W = int(window)
    if method in ("rk2Ours", "rk3Ours"):
        method = "maccormackOurs"  # tfluids.cc:799-802
    if border is None:
        border = border_mask(flags.shape, is_3d, 1)
    zero = jnp.zeros_like(u)
    fl = is_fluid(flags)
    ours = method.endswith("Ours")
    if ours and free is None:
        free = chebyshev_free_space(flags, W + 1)

    def apply_border(x):
        return jnp.where(border, zero, x)

    # 3-D: the fused sweep computes backtrace positions in-kernel from the
    # velocity window already in VMEM (no materialized position fields).
    fused = is_3d and W >= 1
    if fused:
        from fluidnet_tpu.ops.pallas.mac_sweep import mac_vel_sweep
        free_in = free if ours else None

    def sl(src, dt_):
        (px, py, pz), _ = _mac_positions(u, flags, dt_, is_3d, W, ours, free)
        out = warp_trilinear(src, px, py, pz, window=W)
        if ours:
            out = jnp.where(fl, out, src)
        return out

    if method in ("euler", "eulerOurs"):
        if fused:
            out, _, _ = mac_vel_sweep(u, None, free_in, -dt, W, ours)
            if ours:
                out = jnp.where(fl, out, u)
            return apply_border(out)
        return apply_border(sl(u, dt))

    # MacCormack: the fwd (-dt) and bwd (+dt) sweeps visit exactly the
    # clamp-lookup cells of MacCormackClampMAC's two sign directions
    # (tfluids.cc:748-776: clamp(trunc(i + sign*vel)) is the window-
    # clamped position's base corner), so the kernel emits min/max of u
    # over each sweep's corner support in the same pass — no separate
    # clamp gathers and no precomputed min/max fields. For in-window
    # velocities this equals the standalone lookup; past the CFL window
    # (and for the 'Ours' free-space-scaled traces) the bounds come from
    # the cell actually sampled, a documented fast-path deviation.
    if fused:
        w1, mn_f, mx_f = mac_vel_sweep(u, None, free_in, -dt, W, ours)
        fwd = jnp.where(fl, w1, u) if ours else w1
        fwd = apply_border(fwd)
        w2, mn_b, mx_b = mac_vel_sweep(u, fwd, free_in, dt, W, ours)
        bwd = jnp.where(fl, w2, fwd) if ours else w2
        bwd = apply_border(bwd)
    else:
        def sweep(fields, dt_):
            # fields (b, C, F, z, y, x); channel 0 is the clamp-bound
            # source.
            (px, py, pz), _ = _mac_positions(u, flags, dt_, is_3d, W,
                                             ours, free)
            return warp_group(fields, px, py, pz, window=W, minmax=True)

        o1 = sweep(u[:, :, None], dt)      # [warp(u), mn, mx]
        fwd = o1[:, :, 0]
        if ours:
            fwd = jnp.where(fl, fwd, u)
        fwd = apply_border(fwd)
        mn_f, mx_f = o1[:, :, 1], o1[:, :, 2]

        # bwd: channel 0 stays u (bounds source); channel 1 is the
        # advected fwd field (its channel-0 warp output is discarded).
        # Passed as a source tuple — the kernel DMAs each separately,
        # avoiding a full-field stack copy.
        o2 = sweep((u[:, :, None], fwd[:, :, None]), -dt)
        bwd = o2[:, :, 1]
        if ours:
            bwd = jnp.where(fl, bwd, fwd)
        bwd = apply_border(bwd)
        mn_b, mx_b = o2[:, :, 2], o2[:, :, 3]

    from fluidnet_tpu.ops.advect import _maccormack_correct_mac
    dst = _maccormack_correct_mac(u, fwd, bwd, flags, maccormack_strength,
                                  is_3d)
    mn = jnp.minimum(mn_f, mn_b)
    mx = jnp.maximum(mx_f, mx_b)
    clamped = jnp.clip(dst, mn, mx)
    return jnp.where(border, dst, clamped)


def fused_epilogue_enabled() -> bool:
    """Call-time knob: move advect_vel_scalar_fast's XLA epilogues
    (fluid/border masks, renorm combine, MacCormack correction)
    in-kernel (see mac_sweep.advect_sweep_fused_ep). Gradients always
    fall back to the unfused composition via _fused_step's custom_vjp,
    so this is a pure inference-throughput knob. Default ON (measured
    208.9 -> 218.1 steps/s at 128^3); FLUIDNET_FUSED_EPILOGUE=0
    restores the unfused composition."""
    import os as _os
    return _os.environ.get("FLUIDNET_FUSED_EPILOGUE", "1") == "1"


def _fused_impl(dt, s, u, flags, free, method, sample_outside_fluid,
                maccormack_strength, window):
    """Fused-epilogue primal of advect_vel_scalar_fast (maccormackOurs /
    euler/eulerOurs only): the per-field fluid/border masking, the renorm
    combine, and the MacCormack correction run inside the sweep kernels;
    only the final two-direction clamp (which combines both sweeps'
    bounds) stays in XLA."""
    from fluidnet_tpu.ops.pallas.mac_sweep import advect_sweep_fused_ep
    is_3d = check_shapes(u, flags, s)
    W = int(window)
    ours = method.endswith("Ours")
    fl = is_fluid(flags)
    if ours and free is None:
        free = chebyshev_free_space(flags, W + 1)
    free_in = free if ours else None
    m = fl.astype(s.dtype)
    renorm = ours and not sample_outside_fluid
    border = border_mask(flags.shape, is_3d, 1)

    o1 = advect_sweep_fused_ep(u, s, m, None, None, free_in, -dt,
                               maccormack_strength, W, ours, renorm)
    fwd_u, fwd_s = o1["u_w"], o1["s_val"]
    if method in ("euler", "eulerOurs"):
        return fwd_s, fwd_u

    o2 = advect_sweep_fused_ep(u, s, m, fwd_u, fwd_s, free_in, dt,
                               maccormack_strength, W, ours, renorm)
    dst_u, dst_s = o2["u_w"], o2["s_val"]
    mn = jnp.minimum(o1["u_mn"], o2["u_mn"])
    mx = jnp.maximum(o1["u_mx"], o2["u_mx"])
    u_new = jnp.where(border, dst_u, jnp.clip(dst_u, mn, mx))
    if renorm:
        have = o1["s_mn"] < 1e29
        clamped = jnp.where(have, jnp.clip(dst_s, o1["s_mn"], o1["s_mx"]),
                            fwd_s)
    else:
        clamped = jnp.clip(dst_s, o1["s_mn"], o1["s_mx"])
    s_new = jnp.where(border, dst_s, clamped)
    return s_new, u_new


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _fused_step(dt, s, u, flags, free, method, sample_outside_fluid,
                maccormack_strength, window):
    return _fused_impl(dt, s, u, flags, free, method,
                       sample_outside_fluid, maccormack_strength, window)


def _fused_step_fwd(dt, s, u, flags, free, method, sample_outside_fluid,
                    maccormack_strength, window):
    out = _fused_impl(dt, s, u, flags, free, method, sample_outside_fluid,
                      maccormack_strength, window)
    return out, (dt, s, u, flags, free)


def _fused_step_bwd(method, sample_outside_fluid, maccormack_strength,
                    window, res, cots):
    """Gradients via the unfused composition (same function up to fp
    summation order): the fused kernels emit post-epilogue fields whose
    adjoint would need a bespoke transpose; recomputing the unfused
    VJP costs one extra forward — training-only, like the position
    recompute in mac_sweep's sweep VJP."""
    dt, s, u, flags, free = res

    def ref(dt_, s_, u_):
        return advect_vel_scalar_fast(
            dt_, s_, u_, flags, method, sample_outside_fluid,
            maccormack_strength, window, free=free, fused_epilogue=False)

    _, vjp = jax.vjp(ref, dt, s, u)
    g_dt, g_s, g_u = vjp(cots)
    return g_dt, g_s, g_u, None, None


_fused_step.defvjp(_fused_step_fwd, _fused_step_bwd)


def advect_vel_scalar_fast(dt, s, u, flags, method, sample_outside_fluid,
                           maccormack_strength, window, free=None,
                           border=None, fused_epilogue=None):
    """Combined scalar + MAC-velocity advection on the fused sweep kernel
    (3-D '...Ours'/euler methods): two pallas_call's total per step — the
    forward sweep warps density AND all three velocity components from
    one resident velocity window (positions in-kernel), the backward
    sweep the same for the MacCormack correction. Semantics match
    advect_scalar_fast + advect_vel_fast exactly (tested).

    Returns (s_new, u_new)."""
    is_3d = check_shapes(u, flags, s)
    assert is_3d, "fused combined advection is 3-D only"
    W = int(window)
    ours = method.endswith("Ours")
    assert method != "maccormack", \
        "manta scalar clamp is not fused; use the separate paths"
    if fused_epilogue is None:
        fused_epilogue = fused_epilogue_enabled()
    if fused_epilogue and method in ("maccormackOurs", "euler",
                                     "eulerOurs"):
        return _fused_step(dt, s, u, flags, free, method,
                           sample_outside_fluid, maccormack_strength, W)
    from fluidnet_tpu.ops.pallas.mac_sweep import advect_sweep

    if border is None:
        border = border_mask(flags.shape, is_3d, 1)
    fl = is_fluid(flags)
    if ours and free is None:
        free = chebyshev_free_space(flags, W + 1)
    free_in = free if ours else None
    m = fl.astype(s.dtype)
    # Manta methods always sample outside fluid (plain interpolation):
    # the fluid-aware renormalization applies to the 'Ours' variants only
    # (see _sample_scalar_fast's `sample_outside_fluid or not ours`).
    renorm = ours and not sample_outside_fluid
    vel_mac = method in ("maccormack", "maccormackOurs", "rk2Ours",
                         "rk3Ours")
    scal_mac = method == "maccormackOurs"
    zero_u = jnp.zeros_like(u)
    zero_s = jnp.zeros_like(s)

    def vborder(x):
        return jnp.where(border, zero_u, x)

    def sborder(x):
        return jnp.where(border, zero_s, x)

    def s_value(o):
        if renorm:
            den = o["s_den"]
            safe = den > 1e-6
            val = jnp.where(safe, o["s_num"] / jnp.where(safe, den, 1.0),
                            o["s_plain"])
        else:
            val = o["s_plain"]
        return val

    o1 = advect_sweep(u, s, m, None, None, free_in, -dt, W, ours, True,
                      renorm)
    fwd_u = jnp.where(fl, o1["u_w"], u) if ours else o1["u_w"]
    fwd_u = vborder(fwd_u)
    fwd_s_full = s_value(o1)
    if ours:
        fwd_s_full = jnp.where(fl, fwd_s_full, s)
    fwd_s = sborder(fwd_s_full)

    if not vel_mac:                       # euler / eulerOurs
        return fwd_s, fwd_u

    o2 = advect_sweep(u, None, m if scal_mac else None, fwd_u,
                      fwd_s if scal_mac else None, free_in, dt, W, ours,
                      scal_mac, renorm)
    bwd_u = jnp.where(fl, o2["u_w"], fwd_u) if ours else o2["u_w"]
    bwd_u = vborder(bwd_u)

    from fluidnet_tpu.ops.advect import _maccormack_correct_mac
    dst_u = _maccormack_correct_mac(u, fwd_u, bwd_u, flags,
                                    maccormack_strength, is_3d)
    mn = jnp.minimum(o1["u_mn"], o2["u_mn"])
    mx = jnp.maximum(o1["u_mx"], o2["u_mx"])
    u_new = jnp.where(border, dst_u, jnp.clip(dst_u, mn, mx))

    if scal_mac:
        bwd_s_full = s_value(o2)
        if ours:
            bwd_s_full = jnp.where(fl, bwd_s_full, fwd_s)
        bwd_s = sborder(bwd_s_full)
        dst_s = fwd_s + jnp.where(fl, maccormack_strength * 0.5 *
                                  (s - bwd_s), 0.0)
        if renorm:
            have = o1["s_mn"] < 1e29
            clamped = jnp.where(have,
                                jnp.clip(dst_s, o1["s_mn"], o1["s_mx"]),
                                fwd_s)
        else:
            clamped = jnp.clip(dst_s, o1["s_mn"], o1["s_mx"])
        s_new = jnp.where(border, dst_s, clamped)
    else:                                 # rk2Ours/rk3Ours scalar = euler
        s_new = fwd_s
    return s_new, u_new
