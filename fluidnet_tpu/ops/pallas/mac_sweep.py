"""Fused advection sweep: backtrace positions computed in-kernel.

The generic windowed warp (ops.pallas.warp) takes positions as inputs, so
a MacCormack step materializes 12 position fields per sweep in XLA (MAC /
centered interpolation of u, free-space trace clamp, window clamp) before
the kernels read them back — HBM-bound glue. This kernel derives the
positions from the velocity window that is already resident in VMEM:

  per output slice:
    mac_c  = getAtMAC_c(u)        (grid.cc:162-204 face averages,
                                   zero-fill borders; velocity groups)
    cent   = getCentered(u)       (grid.cc:346-356, zero border;
                                   the scalar group)
    d      = dcoef * vel          (dcoef = -dt fwd / +dt bwd)
    d     *= free-space scale     ('Ours' trace clamp, advect_fast.py)
    d      = clip(d, +-(W - eps)) (windowed-gather contract)
    p      = cell_index + d

then warps the target fields with the same folded corner weights as the
generic kernel. Emissions per sweep:

  forward:  warp(u) (3) + support min/max of u per component (6)
            [+ scalar: plain=warp(s), num=warp(s*m), den=warp(m),
               fluid-masked support min/max of s (the MacCormack-Ours
               clamp bounds + revert test)]
  backward: warp(fwd_u) (3) + support min/max of u (6)
            [+ scalar: plain/num/den of fwd_s]

One program per (batch, z-block) handles every component — one DMA of
each window instead of per-group copies.

Differentiation: linear in the warped fields with weights treated as
constants (positions and the fluid mask get zero cotangents, like the
generic warp — the reference computes no advection adjoint,
generic/tfluids.cc). The VJP recomputes positions with the XLA pipeline
(training-only cost) and reuses the Pallas transpose kernel.

3-D only; 2-D advection stays on the generic warp path.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fluidnet_tpu.ops.pallas.warp import (_corner_weights, _interpret,
                                          _round_up,
                                          _warp_transpose_pallas,
                                          slices_per_program)

_EPS = 1e-3
_BIG = 1e30


def _sweep_kernel(dt_ref, free_ref, *refs, W, S, Z, Y, X, Yt, Xt, ours,
                  is_bwd, with_scalar, renorm, zclamped, vals_bf16=False,
                  fuse_ep=False):
    # Sources (each (b, F_i, Z, Y, X) in HBM):
    #   fwd sweep: u(3) [, s(1), m(1)]
    #   bwd sweep: u(3) [, m(1)], fwd_u(3) [, fwd_s(1)] [, s(1) fuse_ep]
    #
    # fuse_ep (production combined path only, with_scalar=True): the XLA
    # epilogues of advect_vel_scalar_fast move in-kernel — the fwd sweep
    # emits the fluid/border-masked warped fields directly (incl. the
    # renorm combine), the bwd sweep emits the MacCormack-corrected
    # velocity (MacCormackCorrectMAC per-component fluid skips,
    # tfluids.cc:660-699) and corrected scalar. Saves ~4 full-field XLA
    # passes per advection step; the final two-direction clamp stays in
    # XLA (it combines both sweeps' bounds).
    n_src = 1 + (2 if with_scalar else 0) if not is_bwd else \
        2 + (2 if with_scalar else 0) + (1 if fuse_ep else 0)
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

    # source index map
    I_U = 0
    I_S0 = None                          # original scalar (bwd fuse_ep)
    if not is_bwd:
        I_S, I_M = 1, 2
        I_FU = I_FS = None
    else:
        I_M = 1 if with_scalar else None
        I_FU = 2 if with_scalar else 1
        I_FS = 3 if with_scalar else None
        if fuse_ep:
            I_S0 = 4

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

    def _weights(px, py, pz, k_abs):
        """Folded corner weights + support indicators; positions are
        index-offset (p = pos - 0.5)."""
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
        return wx, wy, wz, sx, sy, sz

    n_groups = 4 if with_scalar else 3   # 3 MAC + optional center
    per_s = []
    for s in range(S):
        k_abs = ks * S + s
        j0 = s + W                       # scratch index of slice k_abs
        u0 = _scr(I_U, 0, j0)
        u1 = _scr(I_U, 1, j0)
        u2 = _scr(I_U, 2, j0)
        zvalid_m = (k_abs > 0)
        zvalid_p = (k_abs < Z - 1)
        u0_zm = jnp.where(zvalid_m, _scr(I_U, 0, j0 - 1), 0.0)
        u1_zm = jnp.where(zvalid_m, _scr(I_U, 1, j0 - 1), 0.0)
        u0_zp = jnp.where(zvalid_p, _scr(I_U, 0, j0 + 1), 0.0)
        u1_zp = jnp.where(zvalid_p, _scr(I_U, 1, j0 + 1), 0.0)
        u2_zp = jnp.where(zvalid_p, _scr(I_U, 2, j0 + 1), 0.0)

        # getAtMACX/Y/Z (ops.interp.get_at_mac_*, grid.cc:162-204).
        vels = [(
            u0,
            0.25 * (u1 + xm(u1) + yp(u1) + xm(yp(u1))),
            0.25 * (u2 + xm(u2) + u2_zp + xm(u2_zp)),
        ), (
            0.25 * (u0 + ym(u0) + xp(u0) + ym(xp(u0))),
            u1,
            0.25 * (u2 + ym(u2) + u2_zp + ym(u2_zp)),
        ), (
            0.25 * (u0 + u0_zm + xp(u0) + jnp.where(zvalid_m, xp(
                _scr(I_U, 0, j0 - 1)), 0.0)),
            0.25 * (u1 + u1_zm + yp(u1) + jnp.where(zvalid_m, yp(
                _scr(I_U, 1, j0 - 1)), 0.0)),
            u2,
        )]
        if with_scalar:
            # getCentered (forces.get_centered): zero on the 1-cell
            # border.
            interior = ((ii > 0) & (ii < Xt - 1) & (jj > 0) &
                        (jj < Yt - 1) & zvalid_m & zvalid_p)
            cx = jnp.where(interior, 0.5 * (u0 + xp(u0)), 0.0)
            cy = jnp.where(interior, 0.5 * (u1 + yp(u1)), 0.0)
            cz = jnp.where(interior, 0.5 * (u2 + u2_zp), 0.0)
            vels.append((cx, cy, cz))

        free = jnp.maximum(free_ref[0, s] - 0.5 - _EPS, 0.0) if ours \
            else None
        comp = []
        for c in range(n_groups):
            vx, vy, vz = vels[c]
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
            if c == 3 and not is_bwd and ours:
                # Non-fluid cells warp their own centers
                # (tfluids.cc:157-160); their sampled value stays s.
                # 'Ours' variants only — Manta methods keep the raw
                # backtrace.
                flm = _scr(I_M, 0, j0) > 0.5
                px = jnp.where(flm, px, iif)
                py = jnp.where(flm, py, jjf)
                pz = jnp.where(flm, pz, jnp.full_like(pz, 1.0) * k_abs)
            comp.append(_weights(px, py, pz, k_abs))
        per_s.append(comp)

    # bf16 tap arithmetic (positions/weights were computed in f32 above;
    # value accumulation stays f32): the tap loop is the kernel's VPU
    # bound — the weight products and value multiplies drop to bfloat16
    # (packed VPU throughput) for a ~1e-3 relative rounding on warped
    # values (MacCormack-clamped; drift-gated by
    # tests/test_advect_fast.py::test_bf16_sweep_drift). Two Mosaic
    # target limits shape the split: dynamic_rotate (roll) and
    # compare/select are f32-only on this TPU, so the value-plane ROLLS
    # stay f32 (cast after the innermost roll), and ALL comparison work
    # — support indicators (> 0.5) and the min/max clamp bounds — stays
    # f32 end to end.
    vdt = jnp.bfloat16 if vals_bf16 else jnp.float32
    if vals_bf16:
        # Cast only the weight lists (wx, wy, wz); the support
        # indicator lists (sx, sy, sz) feed comparisons and stay f32.
        per_s = [[tuple([w.astype(vdt) if hasattr(w, "astype") else w
                         for w in lst] if li < 3 else lst
                        for li, lst in enumerate(group))
                  for group in comp_s] for comp_s in per_s]

    def _vcast(a):
        return a.astype(vdt) if vals_bf16 else a

    # Boolean per-axis support masks: the tap loop tests support with one
    # vector-mask AND instead of two f32 multiplies + a compare — each
    # per-axis indicator is exactly 0 or 1 (ind[o] and ind[o-1] are
    # mutually exclusive), so (sz*sy*sx) > 0.5 == szb & syb & sxb.
    # Converted once per (slice, component): 9 compares vs 27+ fused ops
    # in the tap loop.
    def _boolify(group):
        wx, wy, wz, sx, sy, sz = group
        return (wx, wy, wz,
                [a > 0.5 for a in sx],
                [a > 0.5 for a in sy],
                [a > 0.5 for a in sz])
    per_s = [[_boolify(g) for g in comp_s] for comp_s in per_s]

    I_WU = I_U if not is_bwd else I_FU   # warped velocity source
    # accumulators (value sums in f32 regardless of tap dtype)
    vacc = [[jnp.zeros((Y, X), jnp.float32) for _ in range(3)]
            for _ in range(S)]
    vmn = [[jnp.full((Y, X), jnp.inf, jnp.float32) for _ in range(3)]
           for _ in range(S)]
    vmx = [[jnp.full((Y, X), -jnp.inf, jnp.float32) for _ in range(3)]
           for _ in range(S)]
    if with_scalar:
        n_sacc = 3 if renorm else 1      # plain [, num, den]
        sacc = [[jnp.zeros((Y, X), jnp.float32) for _ in range(n_sacc)]
                for _ in range(S)]
        if not is_bwd:
            smn = [jnp.full((Y, X), jnp.inf, jnp.float32)
                   for _ in range(S)]
            smx = [jnp.full((Y, X), -jnp.inf, jnp.float32)
                   for _ in range(S)]

    big = jnp.asarray(_BIG, jnp.float32)
    for j in range(nsrc):
        svals = [s for s in range(S) if 0 <= j - s <= 2 * W]
        if not svals:
            continue
        wu = [_scr(I_WU, c, j) for c in range(3)]
        bu = wu if not is_bwd else [_scr(I_U, c, j) for c in range(3)]
        if with_scalar:
            m_pl = _scr(I_M, 0, j)
            if not is_bwd:
                s_pl = _scr(I_S, 0, j)
            else:
                s_pl = _scr(I_FS, 0, j)
            planes_s = [s_pl]
            if renorm:
                planes_s += [s_pl * m_pl, m_pl]
            if not is_bwd:
                if renorm:
                    bmin_pl = jnp.where(m_pl > 0.5, s_pl, big)
                    bmax_pl = jnp.where(m_pl > 0.5, s_pl, -big)
                else:
                    bmin_pl = bmax_pl = s_pl
        for oyi, oy in enumerate(range(-W, W + 1)):
            wu_y = [pltpu.roll(wu[c], (-oy) % Y, 0) for c in range(3)]
            bu_y = wu_y if not is_bwd else \
                [pltpu.roll(bu[c], (-oy) % Y, 0) for c in range(3)]
            if with_scalar:
                s_y = [pltpu.roll(p, (-oy) % Y, 0) for p in planes_s]
                if not is_bwd:
                    bn_y = pltpu.roll(bmin_pl, (-oy) % Y, 0)
                    bx_y = pltpu.roll(bmax_pl, (-oy) % Y, 0)
            # Hoist the z*y weight product and z&y support mask out of
            # the innermost x loop: per (source slice, oy) they are
            # fixed, so each of the 2W+1 x-taps pays one multiply (wzy *
            # wx) and one mask AND instead of two multiplies and a
            # product+compare.
            wzy = {}
            szy = {}
            for s in svals:
                ozi = j - s
                for c in range(n_groups):
                    wx, wy, wz, sxb, syb, szb = per_s[s][c]
                    wzy[s, c] = wz[ozi] * wy[oyi]
                    szy[s, c] = szb[ozi] & syb[oyi]
            for oxi, ox in enumerate(range(-W, W + 1)):
                # f32 rolled planes feed the (f32-only) min/max bound
                # tracking; a bf16 cast of the same plane feeds the
                # multiply-accumulate.
                wu_r = [pltpu.roll(wu_y[c], (-ox) % X, 1)
                        for c in range(3)]
                wu_v = [_vcast(r) for r in wu_r]
                bu_v = wu_r if not is_bwd else \
                    [pltpu.roll(bu_y[c], (-ox) % X, 1) for c in range(3)]
                if with_scalar:
                    s_v = [_vcast(pltpu.roll(p, (-ox) % X, 1))
                           for p in s_y]
                    if not is_bwd:
                        bn_v = pltpu.roll(bn_y, (-ox) % X, 1)
                        bx_v = pltpu.roll(bx_y, (-ox) % X, 1)
                for s in svals:
                    for c in range(3):
                        wx, wy, wz, sxb, syb, szb = per_s[s][c]
                        wfull = wzy[s, c] * wx[oxi]
                        vacc[s][c] = vacc[s][c] + wu_v[c] * wfull
                        s3 = szy[s, c] & sxb[oxi]
                        vmn[s][c] = jnp.where(
                            s3, jnp.minimum(vmn[s][c], bu_v[c]),
                            vmn[s][c])
                        vmx[s][c] = jnp.where(
                            s3, jnp.maximum(vmx[s][c], bu_v[c]),
                            vmx[s][c])
                    if with_scalar:
                        wx, wy, wz, sxb, syb, szb = per_s[s][3]
                        wfull = wzy[s, 3] * wx[oxi]
                        for a in range(n_sacc):
                            sacc[s][a] = sacc[s][a] + s_v[a] * wfull
                        if not is_bwd:
                            s3 = szy[s, 3] & sxb[oxi]
                            smn[s] = jnp.where(
                                s3, jnp.minimum(smn[s], bn_v), smn[s])
                            smx[s] = jnp.where(
                                s3, jnp.maximum(smx[s], bx_v), smx[s])

    f32 = jnp.float32
    if not fuse_ep:
        for s in range(S):
            for c in range(3):
                out_ref[0, c, s] = vacc[s][c]
                out_ref[0, 3 + c, s] = vmn[s][c].astype(f32)
                out_ref[0, 6 + c, s] = vmx[s][c].astype(f32)
            if with_scalar:
                base = 9
                for a in range(n_sacc):
                    out_ref[0, base + a, s] = sacc[s][a]
                if not is_bwd:
                    out_ref[0, base + n_sacc, s] = smn[s].astype(f32)
                    out_ref[0, base + n_sacc + 1, s] = smx[s].astype(f32)
        return

    # ---- fused epilogue (with_scalar production path) ----
    strength = dt_ref[1]
    for s in range(S):
        k_abs = ks * S + s
        j0 = s + W
        # Mosaic on this target rejects i1 ops mixing scalar and vector
        # bools ("unsupported target bitwidth for truncation"), so the
        # border mask keeps the in-plane part as a vector bool and the
        # z part as a scalar f32 factor.
        border_v = ((ii == 0) | (ii == Xt - 1) | (jj == 0) |
                    (jj == Yt - 1))
        zin = jnp.where((k_abs == 0) | (k_abs == Z - 1), 0.0, 1.0)

        def _border0(v):
            return jnp.where(border_v, 0.0, v) * zin
        fl_b = _scr(I_M, 0, j0) > 0.5
        if renorm:
            den = sacc[s][2]
            safe = den > 1e-6
            val = jnp.where(safe, sacc[s][1] / jnp.where(safe, den, 1.0),
                            sacc[s][0])
        else:
            val = sacc[s][0]
        if not is_bwd:
            # fwd: masked warped fields + bounds pass-through.
            s_c = _scr(I_S, 0, j0)
            for c in range(3):
                v = vacc[s][c]
                if ours:
                    v = jnp.where(fl_b, v, _scr(I_U, c, j0))
                out_ref[0, c, s] = _border0(v)
                out_ref[0, 3 + c, s] = vmn[s][c].astype(f32)
                out_ref[0, 6 + c, s] = vmx[s][c].astype(f32)
            if ours:
                val = jnp.where(fl_b, val, s_c)
            out_ref[0, 9, s] = _border0(val)
            out_ref[0, 10, s] = smn[s].astype(f32)
            out_ref[0, 11, s] = smx[s].astype(f32)
        else:
            # bwd: MacCormack-corrected velocity + corrected scalar.
            # Per-component fluid skips (tfluids.cc:660-699): skip where
            # the cell or its -axis neighbor is non-fluid; at the low
            # edge only the cell itself is tested (neighbor fills True).
            # Selects stay in the f32 domain (one compare at the end):
            # bool-valued wheres with scalar/literal arms hit the same
            # Mosaic i1-truncation limit as the border mask above.
            m_c = _scr(I_M, 0, j0)       # roll the f32 mask, not the
            fl_xm = jnp.where(ii == 0, 1.0,        # bool (32-bit-only
                              pltpu.roll(m_c, 1, 1)) > 0.5   # rotates)
            fl_ym = jnp.where(jj == 0, 1.0,
                              pltpu.roll(m_c, 1, 0)) > 0.5
            fl_zm = jnp.maximum(
                _scr(I_M, 0, j0 - 1),
                jnp.where(k_abs == 0, 1.0, 0.0)) > 0.5
            skips = (fl_xm, fl_ym, fl_zm)
            for c in range(3):
                bwd_c = vacc[s][c]
                fwd_c = _scr(I_FU, c, j0)
                if ours:
                    bwd_c = jnp.where(fl_b, bwd_c, fwd_c)
                bwd_c = _border0(bwd_c)
                corr = fwd_c + strength * 0.5 * (_scr(I_U, c, j0) - bwd_c)
                out_ref[0, c, s] = jnp.where(fl_b & skips[c], corr, fwd_c)
                out_ref[0, 3 + c, s] = vmn[s][c].astype(f32)
                out_ref[0, 6 + c, s] = vmx[s][c].astype(f32)
            fwd_s_c = _scr(I_FS, 0, j0)
            if ours:
                val = jnp.where(fl_b, val, fwd_s_c)
            bwd_s = _border0(val)
            dst_s = fwd_s_c + jnp.where(
                fl_b, strength * 0.5 * (_scr(I_S0, 0, j0) - bwd_s), 0.0)
            out_ref[0, 9, s] = dst_s


@functools.partial(jax.jit, static_argnames=("window", "ours", "renorm",
                                             "with_scalar", "vals_bf16",
                                             "fuse_ep"))
def _sweep_impl(u, s, m, fwd_u, fwd_s, free, dcoef, window, ours,
                with_scalar, renorm, vals_bf16=False, fuse_ep=False,
                strength=0.0):
    """See module docstring. u (b,3,Z,Y,X); s/m/fwd_s (b,1,Z,Y,X) or
    None; fwd_u (b,3,Z,Y,X) or None (None => forward sweep).
    Returns a dict of outputs."""
    W = int(window)
    b, _, Z, Y, X = u.shape
    is_bwd = fwd_u is not None
    if fuse_ep:
        assert with_scalar, "fused epilogue is the combined path only"
    srcs = [u]
    if with_scalar and not is_bwd:
        srcs += [s, m]
    if is_bwd:
        if with_scalar:
            srcs += [m]
        srcs += [fwd_u]
        if with_scalar:
            srcs += [fwd_s]
        if fuse_ep:
            srcs += [s]                  # original scalar for dst_s
    if free is None:
        free = jnp.zeros((b, 1, Z, Y, X), jnp.float32)

    Xp, Yp = _round_up(X, 128), _round_up(Y, 8)
    if (Xp, Yp) != (X, Y):
        fpads = ((0, 0),) * 3 + ((0, Yp - Y), (0, Xp - X))
        srcs = [jnp.pad(f, fpads) for f in srcs]
        free = jnp.pad(free, fpads)

    S = min(slices_per_program(), Z)
    Zs = _round_up(Z, S)
    zclamped = Zs == Z and Z >= S + 2 * W and S >= W
    if not zclamped:
        zpad = (W, Zs - Z + W)
        srcs = [jnp.pad(f, ((0, 0), (0, 0), zpad, (0, 0), (0, 0)))
                for f in srcs]
    if Zs != Z:
        free = jnp.pad(free, ((0, 0), (0, 0), (0, Zs - Z), (0, 0),
                              (0, 0)))
    freer = free.reshape(b, Zs, Yp, Xp)
    dt_arr = jnp.stack([jnp.asarray(dcoef, jnp.float32),
                        jnp.asarray(strength, jnp.float32)])

    n_sacc = (3 if renorm else 1) if with_scalar else 0
    if fuse_ep:
        C_out = 12 if not is_bwd else 10
    else:
        C_out = 9 + (n_sacc + (0 if is_bwd else 2) if with_scalar else 0)
    out = pl.pallas_call(
        functools.partial(_sweep_kernel, W=W, S=S, Z=Z, Y=Yp, X=Xp,
                          Yt=Y, Xt=X, ours=ours, is_bwd=is_bwd,
                          with_scalar=with_scalar, renorm=renorm,
                          zclamped=zclamped, vals_bf16=vals_bf16,
                          fuse_ep=fuse_ep),
        grid=(b, Zs // S),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, S, Yp, Xp), lambda bb, k: (bb, k, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(memory_space=pl.ANY) for _ in srcs],
        out_specs=pl.BlockSpec((1, C_out, S, Yp, Xp),
                               lambda bb, k: (bb, 0, k, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, C_out, Zs, Yp, Xp),
                                       jnp.float32),
        scratch_shapes=[pltpu.VMEM((f.shape[1], S + 2 * W, Yp, Xp),
                                   jnp.float32) for f in srcs] +
                       [pltpu.SemaphoreType.DMA for _ in srcs],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(dt_arr, freer, *srcs)
    out = out[..., :Z, :Y, :X]
    if fuse_ep:
        res = {"u_w": out[:, 0:3], "u_mn": out[:, 3:6],
               "u_mx": out[:, 6:9], "s_val": out[:, 9:10]}
        if not is_bwd:
            res["s_mn"] = out[:, 10:11]
            res["s_mx"] = out[:, 11:12]
        return res
    res = {"u_w": out[:, 0:3], "u_mn": out[:, 3:6], "u_mx": out[:, 6:9]}
    if with_scalar:
        if renorm:
            res["s_plain"] = out[:, 9:10]
            res["s_num"] = out[:, 10:11]
            res["s_den"] = out[:, 11:12]
            nx = 12
        else:
            res["s_plain"] = out[:, 9:10]
            nx = 10
        if not is_bwd:
            res["s_mn"] = out[:, nx:nx + 1]
            res["s_mx"] = out[:, nx + 1:nx + 2]
    return res


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11))
def _sweep(u, s, m, fwd_u, fwd_s, free, dcoef, window, ours, with_scalar,
           renorm, vals_bf16=False):
    return _sweep_impl(u, s, m, fwd_u, fwd_s, free, dcoef, window, ours,
                       with_scalar, renorm, vals_bf16)


def _sweep_fwd_rule(u, s, m, fwd_u, fwd_s, free, dcoef, window, ours,
                    with_scalar, renorm, vals_bf16=False):
    out = _sweep_impl(u, s, m, fwd_u, fwd_s, free, dcoef, window, ours,
                      with_scalar, renorm, vals_bf16)
    return out, (u, m, fwd_u is not None, free, dcoef)


def _positions_xla(u, free, dcoef, window, ours, center=False,
                   m=None):
    """The XLA position pipeline (VJP-only): mirrors the in-kernel
    computation."""
    from fluidnet_tpu.ops.interp import (cell_center_positions,
                                         get_at_mac_x, get_at_mac_y,
                                         get_at_mac_z)
    from fluidnet_tpu.ops.forces import get_centered
    px0, py0, pz0 = cell_center_positions(u.shape, u.dtype)
    allowed = None
    if ours:
        allowed = jnp.maximum(free[:, 0] - 0.5 - _EPS, 0.0)
    if center:
        vels = [get_centered(u, True)]
    else:
        vels = [get_at_mac_x(u, True), get_at_mac_y(u, True),
                get_at_mac_z(u, True)]
    pxs, pys, pzs = [], [], []
    for mac in vels:
        dx = dcoef * mac[:, 0]
        dy = dcoef * mac[:, 1]
        dz = dcoef * mac[:, 2]
        if ours:
            mag = jnp.maximum(jnp.maximum(jnp.abs(dx), jnp.abs(dy)),
                              jnp.abs(dz))
            scale = jnp.minimum(1.0, allowed / jnp.maximum(mag, 1e-12))
            dx, dy, dz = dx * scale, dy * scale, dz * scale
        lim = window - _EPS
        px = jnp.broadcast_to(px0, dx.shape) + jnp.clip(dx, -lim, lim)
        py = jnp.broadcast_to(py0, dy.shape) + jnp.clip(dy, -lim, lim)
        pz = jnp.broadcast_to(pz0, dz.shape) + jnp.clip(dz, -lim, lim)
        if center and m is not None:
            flm = m[:, 0] > 0.5
            px = jnp.where(flm, px, jnp.broadcast_to(px0, px.shape))
            py = jnp.where(flm, py, jnp.broadcast_to(py0, py.shape))
            pz = jnp.where(flm, pz, jnp.broadcast_to(pz0, pz.shape))
        pxs.append(px)
        pys.append(py)
        pzs.append(pz)
    return jnp.stack(pxs, 1), jnp.stack(pys, 1), jnp.stack(pzs, 1)


def _sweep_bwd_rule(window, ours, with_scalar, renorm, vals_bf16, res,
                    cots):
    # The adjoint always runs in f32 (training gradients are not part of
    # the bf16 tap-path experiment; the transpose kernel is f32-only).
    u, m, is_bwd, free, dcoef = res
    u_c = jax.lax.stop_gradient(u)
    g_u = cots["u_w"]
    px, py, pz = _positions_xla(u_c, free, dcoef, window, ours)
    grad_uw = _warp_transpose_pallas(g_u[:, :, None], px, py, pz,
                                     int(window), False)[:, :, 0]
    grad_s = grad_fs = None
    if with_scalar:
        mask_fwd = m if (not is_bwd and ours) else None
        cpx, cpy, cpz = _positions_xla(u_c, free, dcoef, window, ours,
                                       center=True, m=mask_fwd)
        g_sc = cots["s_plain"]
        if renorm:
            g_sc = jnp.stack([cots["s_plain"], cots["s_num"]], axis=1)
            gt = _warp_transpose_pallas(g_sc, cpx.repeat(2, 1),
                                        cpy.repeat(2, 1),
                                        cpz.repeat(2, 1), int(window),
                                        False)
            grad_plain, grad_num = gt[:, 0], gt[:, 1]
            grad_sval = grad_plain + m * grad_num
        else:
            gt = _warp_transpose_pallas(g_sc[:, :, None], cpx, cpy, cpz,
                                        int(window), False)[:, :, 0]
            grad_sval = gt
        if is_bwd:
            grad_fs = grad_sval
        else:
            grad_s = grad_sval

    def z(a):
        return jnp.zeros_like(a) if a is not None else None

    g_dcoef = jnp.zeros_like(jnp.asarray(dcoef, jnp.float32))
    if is_bwd:
        # s input is always None on the backward sweep.
        return (z(u), None, z(m), grad_uw, grad_fs, z(free), g_dcoef)
    return (grad_uw, grad_s, z(m), None, None, z(free), g_dcoef)


_sweep.defvjp(_sweep_fwd_rule, _sweep_bwd_rule)


def sweep_values_bf16() -> bool:
    """Call-time knob (like slices_per_program): bf16 tap arithmetic in
    the sweep kernels. Measured on TPU v5 lite at 128^3/S=4: 4.95 ms vs
    4.73 ms f32 — a NET LOSS. Mosaic on this target supports neither
    bf16 dynamic_rotate nor bf16 compare/select, so rolls, min/max
    bounds, and support indicators must stay f32; the leftover bf16 work
    (weight products + value multiplies) is outweighed by the extra
    f32->bf16 converts after every roll. Default OFF; kept as a gated,
    drift-tested experiment (tests/test_advect_fast.py::
    test_bf16_sweep_drift) in case a future target lifts the Mosaic
    limits."""
    import os as _os
    return _os.environ.get("FLUIDNET_SWEEP_BF16", "0") == "1"


def advect_sweep(u, s, m, fwd_u, fwd_s, free, dcoef, window, ours,
                 with_scalar, renorm, vals_bf16=None):
    """Public fused sweep. fwd_u=None => forward sweep (warps u [and s]),
    else backward sweep (warps fwd_u [and fwd_s], bounds from u).
    Returns the output dict of _sweep_impl."""
    if vals_bf16 is None:
        vals_bf16 = sweep_values_bf16()
    return _sweep(u, s, m, fwd_u, fwd_s, free, dcoef, window, ours,
                  with_scalar, renorm, vals_bf16)


def mac_vel_sweep(u, fwd, free, dcoef, window, ours, vals_bf16=None):
    """Velocity-only fused sweep: returns (warped, mn, mx)."""
    if vals_bf16 is None:
        vals_bf16 = sweep_values_bf16()
    out = _sweep(u, None, None, fwd, None, free, dcoef, window, ours,
                 False, False, vals_bf16)
    return out["u_w"], out["u_mn"], out["u_mx"]


def advect_sweep_fused_ep(u, s, m, fwd_u, fwd_s, free, dcoef, strength,
                          window, ours, renorm):
    """Fused-EPILOGUE sweep (primal only — no registered VJP; callers
    needing gradients differentiate the unfused composition instead, see
    advect_fast._fused_step's custom_vjp). fwd_u=None => forward sweep:
    returns masked {u_w, s_val, u_mn/mx, s_mn/mx}. Else backward sweep:
    returns MacCormack-corrected {u_w (=dst_u, unclamped), s_val (=dst_s,
    unclamped), u_mn/mx}."""
    return _sweep_impl(u, s, m, fwd_u, fwd_s, free, dcoef, window, ours,
                       True, renorm, False, fuse_ep=True,
                       strength=strength)
