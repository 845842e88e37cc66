"""Fused MAC velocity-advection sweep: backtrace positions computed
in-kernel.

The generic windowed warp (ops.pallas.warp) takes positions as inputs, so
a MacCormack velocity sweep materializes 9 position fields per sweep in
XLA (MAC interpolation of u at each face, free-space trace clamp,
window clamp) before the kernel reads them back — ~1.3 ms of HBM-bound
glue per 128^3 step. This kernel derives the positions from the velocity
window that is already resident in VMEM:

  per output slice, per component c:
    mac_c = getAtMAC_c(u)          (grid.cc:162-204 face averages,
                                    zero-fill borders)
    d     = dcoef * mac_c          (dcoef = -dt fwd / +dt bwd)
    d    *= free-space scale       ('Ours' trace clamp, advect_fast.py)
    d     = clip(d, +-(W - eps))   (windowed-gather contract)
    p_c   = cell_index + d

then warps the target field with the same folded corner weights as the
generic kernel and emits per-component support min/max of the bounds
source (the MacCormack clamp bounds, tfluids.cc:748-776 semantics on the
fast path).

Differentiation: linear in the warped field with weights treated as
constants (positions get zero cotangents, like the generic warp — the
reference computes no advection adjoint, generic/tfluids.cc). The VJP
recomputes positions with the XLA pipeline (training-only cost) and
reuses the Pallas transpose kernel.

3-D only; 2-D velocity advection stays on the generic warp path.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fluidnet_tpu.ops.pallas.warp import (_corner_weights, _interpret,
                                          _round_up,
                                          _warp_transpose_pallas,
                                          DEFAULT_SLICES_PER_PROGRAM)

_EPS = 1e-3


def _mac_vel_kernel(dt_ref, free_ref, *refs, W, S, Z, Y, X, Yt, Xt, ours,
                    has_fwd, zclamped):
    # refs: u_hbm [, fwd_hbm], out_ref, u_scratch [, fwd_scratch], sems...
    n_src = 2 if has_fwd else 1
    srcs_hbm = refs[:n_src]
    out_ref = refs[n_src]
    scratches = refs[n_src + 1:2 * n_src + 1]
    sems = refs[2 * n_src + 1:]
    b = pl.program_id(0)
    ks = pl.program_id(1)
    nsrc = S + 2 * W

    if zclamped:
        start = jnp.clip(ks * S - W, 0, Z - nsrc)
        shift = ks * S - W - start
        dmas = [pltpu.make_async_copy(
            srcs_hbm[i].at[b, :, pl.ds(start, nsrc)], scratches[i],
            sems[i]) for i in range(n_src)]
    else:
        shift = None
        dmas = [pltpu.make_async_copy(
            srcs_hbm[i].at[b, :, pl.ds(ks * S, nsrc)], scratches[i],
            sems[i]) for i in range(n_src)]
    for dma in dmas:
        dma.start()

    ii = jax.lax.broadcasted_iota(jnp.int32, (Y, X), 1)
    jj = jax.lax.broadcasted_iota(jnp.int32, (Y, X), 0)
    iif = ii.astype(jnp.float32)
    jjf = jj.astype(jnp.float32)
    dcoef = dt_ref[0]

    def _scr(i, f, j):
        if not zclamped:
            return scratches[i][f, j]
        return scratches[i][f, jnp.clip(j + shift, 0, nsrc - 1)]

    for dma in dmas:
        dma.wait()

    # In-plane shifted reads with the zero-fill border semantics of
    # ops.stencil.shift: roll + mask the wrapped lane.
    def xm(a):
        return jnp.where(ii == 0, 0.0, pltpu.roll(a, 1, 1))

    def xp(a):
        return jnp.where(ii == Xt - 1, 0.0, pltpu.roll(a, (-1) % X, 1))

    def ym(a):
        return jnp.where(jj == 0, 0.0, pltpu.roll(a, 1, 0))

    def yp(a):
        return jnp.where(jj == Yt - 1, 0.0, pltpu.roll(a, (-1) % Y, 0))

    per_s = []
    for s in range(S):
        k_abs = ks * S + s
        j0 = s + W                       # scratch index of slice k_abs
        u0 = _scr(0, 0, j0)
        u1 = _scr(0, 1, j0)
        u2 = _scr(0, 2, j0)
        # z-neighbors, zero beyond the domain borders.
        zvalid_m = (k_abs > 0)
        zvalid_p = (k_abs < Z - 1)
        u0_zm = jnp.where(zvalid_m, _scr(0, 0, j0 - 1), 0.0)
        u1_zm = jnp.where(zvalid_m, _scr(0, 1, j0 - 1), 0.0)
        u0_zp = jnp.where(zvalid_p, _scr(0, 0, j0 + 1), 0.0)
        u1_zp = jnp.where(zvalid_p, _scr(0, 1, j0 + 1), 0.0)
        u2_zp = jnp.where(zvalid_p, _scr(0, 2, j0 + 1), 0.0)

        # getAtMACX/Y/Z (ops.interp.get_at_mac_*, grid.cc:162-204).
        macs = []
        macs.append((
            u0,
            0.25 * (u1 + xm(u1) + yp(u1) + xm(yp(u1))),
            0.25 * (u2 + xm(u2) + u2_zp + xm(u2_zp)),
        ))
        macs.append((
            0.25 * (u0 + ym(u0) + xp(u0) + ym(xp(u0))),
            u1,
            0.25 * (u2 + ym(u2) + u2_zp + ym(u2_zp)),
        ))
        macs.append((
            0.25 * (u0 + u0_zm + xp(u0) + jnp.where(zvalid_m, xp(
                _scr(0, 0, j0 - 1)), 0.0)),
            0.25 * (u1 + u1_zm + yp(u1) + jnp.where(zvalid_m, yp(
                _scr(0, 1, j0 - 1)), 0.0)),
            u2,
        ))

        free = jnp.maximum(free_ref[0, s] - 0.5 - _EPS, 0.0) if ours \
            else None
        comp = []
        for c in range(3):
            vx, vy, vz = macs[c]
            dx = dcoef * vx
            dy = dcoef * vy
            dz = dcoef * vz
            if ours:
                mag = jnp.maximum(jnp.maximum(jnp.abs(dx), jnp.abs(dy)),
                                  jnp.abs(dz))
                scale = jnp.minimum(1.0, free / jnp.maximum(mag, 1e-12))
                dx, dy, dz = dx * scale, dy * scale, dz * scale
            lim = W - _EPS
            px = iif + jnp.clip(dx, -lim, lim)
            py = jjf + jnp.clip(dy, -lim, lim)
            pz = k_abs + jnp.clip(dz, -lim, lim)
            # Folded corner weights (positions are already center-offset:
            # p = index + displacement = (pos + 0.5) - 0.5).
            wx, sx = _corner_weights(px, Xt, ii, W)
            wy, sy = _corner_weights(py, Yt, jj, W)
            zi = jnp.floor(pz).astype(jnp.int32)
            f1 = pz - zi.astype(pz.dtype)
            f0 = 1.0 - f1
            negz = pz < 0.0
            zi = jnp.where(negz, 0, zi)
            f0 = jnp.where(negz, 1.0, f0)
            f1 = jnp.where(negz, 0.0, f1)
            hiz = zi >= Z - 1
            zi = jnp.where(hiz, Z - 2, zi)
            f0 = jnp.where(hiz, 0.0, f0)
            f1 = jnp.where(hiz, 1.0, f1)
            indz = [(zi == k_abs + o).astype(px.dtype)
                    for o in range(-W, W + 1)]
            wz = [f0 * indz[oi] + (f1 * indz[oi - 1] if oi > 0 else 0.0)
                  for oi in range(2 * W + 1)]
            sz = [indz[oi] + (indz[oi - 1] if oi > 0 else 0.0)
                  for oi in range(2 * W + 1)]
            comp.append((wx, wy, wz, sx, sy, sz))
        per_s.append(comp)

    warp_src = 1 if has_fwd else 0       # bwd warps fwd; fwd warps u
    accs = [[jnp.zeros((Y, X), jnp.float32) for _ in range(3)]
            for _ in range(S)]
    mns = [[jnp.full((Y, X), jnp.inf, jnp.float32) for _ in range(3)]
           for _ in range(S)]
    mxs = [[jnp.full((Y, X), -jnp.inf, jnp.float32) for _ in range(3)]
           for _ in range(S)]
    nsrc_range = range(nsrc)
    for j in nsrc_range:
        svals = [s for s in range(S) if 0 <= j - s <= 2 * W]
        if not svals:
            continue
        wplanes = [_scr(warp_src, c, j) for c in range(3)]
        bplanes = wplanes if warp_src == 0 else \
            [_scr(0, c, j) for c in range(3)]
        for oyi, oy in enumerate(range(-W, W + 1)):
            wroll = [pltpu.roll(wplanes[c], (-oy) % Y, 0)
                     for c in range(3)]
            broll = wroll if warp_src == 0 else \
                [pltpu.roll(bplanes[c], (-oy) % Y, 0) for c in range(3)]
            for oxi, ox in enumerate(range(-W, W + 1)):
                wvals = [pltpu.roll(wroll[c], (-ox) % X, 1)
                         for c in range(3)]
                bvals = wvals if warp_src == 0 else \
                    [pltpu.roll(broll[c], (-ox) % X, 1) for c in range(3)]
                for s in svals:
                    ozi = j - s
                    for c in range(3):
                        wx, wy, wz, sx, sy, sz = per_s[s][c]
                        wfull = wz[ozi] * wy[oyi] * wx[oxi]
                        accs[s][c] = accs[s][c] + wvals[c] * wfull
                        s3 = (sz[ozi] * sy[oyi] * sx[oxi]) > 0.5
                        mns[s][c] = jnp.where(
                            s3, jnp.minimum(mns[s][c], bvals[c]),
                            mns[s][c])
                        mxs[s][c] = jnp.where(
                            s3, jnp.maximum(mxs[s][c], bvals[c]),
                            mxs[s][c])
    for s in range(S):
        for c in range(3):
            out_ref[0, c, s] = accs[s][c]
            out_ref[0, 3 + c, s] = mns[s][c]
            out_ref[0, 6 + c, s] = mxs[s][c]


@functools.partial(jax.jit, static_argnames=("window", "ours"))
def _mac_vel_sweep_impl(u, fwd, free, dcoef, window, ours):
    """u (b, 3, Z, Y, X); fwd None (fwd sweep: warp u) or the advected
    field (bwd sweep: warp fwd, bounds from u); free (b, 1, Z, Y, X) when
    ours. Returns (warped, mn, mx), each (b, 3, Z, Y, X)."""
    W = int(window)
    b, _, Z, Y, X = u.shape
    has_fwd = fwd is not None
    Xp, Yp = _round_up(X, 128), _round_up(Y, 8)
    srcs = [u] + ([fwd] if has_fwd else [])
    if free is None:
        free = jnp.zeros((b, 1, Z, Y, X), jnp.float32)
    if (Xp, Yp) != (X, Y):
        fpads = ((0, 0),) * 3 + ((0, Yp - Y), (0, Xp - X))
        srcs = [jnp.pad(f, fpads) for f in srcs]
        free = jnp.pad(free, fpads)

    S = min(DEFAULT_SLICES_PER_PROGRAM, Z)
    Zs = _round_up(Z, S)
    zclamped = Zs == Z and Z >= S + 2 * W and S >= W
    if zclamped:
        srcps = [f.reshape(b, 3, Z, Yp, Xp) for f in srcs]
    else:
        zpad = (W, Zs - Z + W)
        srcps = [jnp.pad(f, ((0, 0), (0, 0), zpad, (0, 0), (0, 0)))
                 for f in srcs]
    if Zs != Z:
        free = jnp.pad(free, ((0, 0), (0, 0), (0, Zs - Z), (0, 0), (0, 0)))
    freer = free.reshape(b, Zs, Yp, Xp)
    dt_arr = jnp.asarray(dcoef, jnp.float32).reshape(1)

    n_src = len(srcps)
    out = pl.pallas_call(
        functools.partial(_mac_vel_kernel, W=W, S=S, Z=Z, Y=Yp, X=Xp,
                          Yt=Y, Xt=X, ours=ours, has_fwd=has_fwd,
                          zclamped=zclamped),
        grid=(b, Zs // S),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, S, Yp, Xp), lambda bb, k: (bb, k, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(memory_space=pl.ANY) for _ in srcps],
        out_specs=pl.BlockSpec((1, 9, S, Yp, Xp),
                               lambda bb, k: (bb, 0, k, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 9, Zs, Yp, Xp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((3, S + 2 * W, Yp, Xp), jnp.float32)
                        for _ in srcps] +
                       [pltpu.SemaphoreType.DMA for _ in srcps],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(dt_arr, freer, *srcps)
    out = out[..., :Z, :Y, :X]
    return out[:, 0:3], out[:, 3:6], out[:, 6:9]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def mac_vel_sweep(u, fwd, free, dcoef, window, ours):
    """One fused MacCormack velocity sweep (3-D): see module docstring.

    fwd=None: forward sweep — warps u with bounds from u.
    fwd=array: backward sweep — warps fwd with bounds from u.
    dcoef: displacement coefficient (-dt forward, +dt backward).
    Returns (warped, mn, mx)."""
    return _mac_vel_sweep_impl(u, fwd, free, dcoef, window, ours)


def _mac_sweep_fwd(u, fwd, free, dcoef, window, ours):
    out = _mac_vel_sweep_impl(u, fwd, free, dcoef, window, ours)
    return out, (u, fwd is not None, free, dcoef)


def _positions_xla(u, free, dcoef, window, ours):
    """The XLA position pipeline (VJP-only): mirrors _mac_positions +
    _trace_clamp + clamp_displacement in ops.advect_fast."""
    from fluidnet_tpu.ops.interp import (cell_center_positions,
                                         get_at_mac_x, get_at_mac_y,
                                         get_at_mac_z)
    b = u.shape[0]
    px0, py0, pz0 = cell_center_positions(u.shape, u.dtype)
    pxs, pys, pzs = [], [], []
    allowed = None
    if ours:
        allowed = jnp.maximum(free[:, 0] - 0.5 - _EPS, 0.0)
    for mac in (get_at_mac_x(u, True), get_at_mac_y(u, True),
                get_at_mac_z(u, True)):
        dx = dcoef * mac[:, 0]
        dy = dcoef * mac[:, 1]
        dz = dcoef * mac[:, 2]
        if ours:
            mag = jnp.maximum(jnp.maximum(jnp.abs(dx), jnp.abs(dy)),
                              jnp.abs(dz))
            scale = jnp.minimum(1.0, allowed / jnp.maximum(mag, 1e-12))
            dx, dy, dz = dx * scale, dy * scale, dz * scale
        lim = window - _EPS
        pxs.append(jnp.broadcast_to(px0, dx.shape) + jnp.clip(dx, -lim,
                                                              lim))
        pys.append(jnp.broadcast_to(py0, dy.shape) + jnp.clip(dy, -lim,
                                                              lim))
        pzs.append(jnp.broadcast_to(pz0, dz.shape) + jnp.clip(dz, -lim,
                                                              lim))
    return jnp.stack(pxs, 1), jnp.stack(pys, 1), jnp.stack(pzs, 1)


def _mac_sweep_bwd(window, ours, res, cots):
    u, has_fwd, free, dcoef = res
    g_warp, _, _ = cots                  # bounds get zero cotangents
    px, py, pz = _positions_xla(jax.lax.stop_gradient(u), free, dcoef,
                                window, ours)
    grad = _warp_transpose_pallas(g_warp[:, :, None], px, py, pz,
                                  int(window), False)[:, :, 0]
    g_free = jnp.zeros_like(free) if free is not None else None
    g_dcoef = jnp.zeros_like(jnp.asarray(dcoef, jnp.float32))
    if has_fwd:
        # bwd sweep: the warped field is fwd; u only shapes the weights.
        return (jnp.zeros_like(u), grad, g_free, g_dcoef)
    return (grad, None, g_free, g_dcoef)


mac_vel_sweep.defvjp(_mac_sweep_fwd, _mac_sweep_bwd)
