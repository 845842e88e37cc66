"""Pallas TPU kernel: semi-Lagrangian windowed warp (the hot op).

The reference's semi-Lagrangian backtrace + trilinear interpolation is a
per-cell arbitrary gather (third_party/tfluids.cc advection kernels).
XLA:TPU executes such gathers at ~20 ns per element (measured on this
chip: one full 128^3 trilinear interp = ~350 ms via jnp gathers) — the #1
risk SURVEY.md §7 called out.

This kernel exploits the physics: the backtrace displacement is bounded by
the CFL number, so every sample lies within a static window of +-WINDOW
cells. Trilinear interpolation then becomes a *statically shaped* sum over
the (2W+1)^3 window offsets, with per-axis folded corner weights

    out = sum_o  src[z+oz, y+oy, x+ox] * wz(oz) * wy(oy) * wx(ox)
    wx(ox) = s0 * [xi == x+ox] + s1 * [xi == x+ox-1]        (etc.)

evaluated entirely in VMEM with lane/sublane rolls — no gathers at all
(~1 ms device time per 128^3 interpolation, ~350x over the gather
formulation).

Kernel layout: fields are grouped (b, G, F, Z, Y, X) — the F channels of a
group share one position set, so the (expensive) weight field is computed
once per group and reused across channels. Call sites map onto this:

  warp_trilinear          G=c, F=1   (per-channel positions: MAC advection)
  warp_trilinear_shared   G=1, F=c   (shared positions: scalar advection)
  gather_cells            G=1, F=c, nearest mode (clamp-bound lookups)

Grid: one program per (b*G, z-slice). The source stays in HBM (pl.ANY);
each program DMAs its (F, 2W+1, Y, X) z-window into VMEM scratch
(pallas_guide.md Async DMA pattern). Positions follow BUILD_INDEX
semantics (grid.cc:82-130) including domain-border clamps, so results are
bit-comparable with ops.interp.interpol for in-window positions.

Correctness of the circular rolls at block edges: corner indices are
clamped into the window by callers (clamp_displacement), so wrapped lanes
always carry zero weight.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_WINDOW = 2
# Output z-slices per forward-kernel program (DMA/roll sharing; 1 => the
# old slice-per-program layout).
# Output slices per Pallas program (z-block height). Larger S amortizes
# the per-program halo DMA ((S+2W)/S overhead) and lets rolled source
# planes serve more outputs; smaller S bounds VMEM. Env override for
# perf experiments AND for the CPU interpret-mode tests (the unrolled
# kernel body scales with S x (2W+1)^3; at W=2 the S=4 interpret-mode
# lowering takes XLA:CPU >25 min to compile, S=1 is ~4x smaller) — read
# at call time so tests can set it per case.
import os as _os


def slices_per_program() -> int:
    return int(_os.environ.get("FLUIDNET_SLICES_PER_PROGRAM", "4"))


DEFAULT_SLICES_PER_PROGRAM = slices_per_program()  # back-compat snapshot


def _interpret():
    return jax.default_backend() == "cpu"


def _round_up(v, m):
    return (v + m - 1) // m * m


def _corner_weights(p, n_idx, iota, W):
    """BUILD_INDEX (grid.cc:82-130) folded corner weights for offsets
    -W..W. p = position - 0.5; n_idx = true domain extent.

    Only 2W+1 taps are needed (not 2W+2): callers clamp displacements to
    +-(W - margin) (clamp_displacement), so the base corner i = floor(p)
    lies in [x-W, x+W-1] and i+1 in [x-W+1, x+W]; the border clamps below
    only pull i further inward. Tap x+o carries w0 when i == x+o and w1
    when i+1 == x+o, so o ranges over [-W, W]."""
    i = jnp.floor(p).astype(jnp.int32)
    w1 = p - i.astype(p.dtype)
    w0 = 1.0 - w1
    neg = p < 0.0
    i = jnp.where(neg, 0, i)
    w0 = jnp.where(neg, 1.0, w0)
    w1 = jnp.where(neg, 0.0, w1)
    hi = i >= n_idx - 1
    i = jnp.where(hi, n_idx - 2, i)
    w0 = jnp.where(hi, 0.0, w0)
    w1 = jnp.where(hi, 1.0, w1)
    # ind(o) = [i == x+o]; weight(o) = w0*ind(o) + w1*ind(o-1); the corner
    # SUPPORT indicator (cells {i, i+1}, used by the minmax outputs) is
    # sup(o) = ind(o) + ind(o-1).
    ind = [(i == iota + o).astype(p.dtype) for o in range(-W, W + 1)]
    weights = [w0 * ind[oi] + (w1 * ind[oi - 1] if oi > 0 else 0.0)
               for oi in range(2 * W + 1)]
    sup = [ind[oi] + (ind[oi - 1] if oi > 0 else 0.0)
           for oi in range(2 * W + 1)]
    return weights, sup


def _nearest_weights(p, n_idx, iota, W):
    """Single-cell indicator weights (offsets -W..W) for integer gathers:
    the cell index is trunc(p - 0.5 + 0.5) == floor(p) for cell-center
    positions produced by gather_cells."""
    i = jnp.clip(jnp.floor(p).astype(jnp.int32), 0, n_idx - 1)
    return [(i == iota + o).astype(p.dtype) for o in range(-W, W + 1)]


def _slice_weights(px, py, pz, k_abs, ii, jj, W, Z, Yt, Xt, nearest):
    """Per-output-slice folded corner weights (+ support indicators).
    Returns (wx, wy, wz_list, sx, sy, sz_list); wz_list[ozi] is the
    z-weight for source slice k_abs + ozi - W."""
    noff = 2 * W + 1
    sx = sy = sz_list = None
    if nearest:
        wx = _nearest_weights(px, Xt, ii, W)
        wy = _nearest_weights(py, Yt, jj, W)
        if Z > 1:
            zidx = jnp.clip(jnp.floor(pz).astype(jnp.int32), 0, Z - 1)
            wz_list = [(zidx == k_abs + o).astype(px.dtype)
                       for o in range(-W, W + 1)]
        else:
            wz_list = [jnp.full(px.shape, 1.0 if o == 0 else 0.0, px.dtype)
                       for o in range(-W, W + 1)]
    else:
        wx, sx = _corner_weights(px, Xt, ii, W)
        wy, sy = _corner_weights(py, Yt, jj, W)
        if Z > 1:
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
            wz_list = [f0 * indz[oi] + (f1 * indz[oi - 1] if oi > 0
                                        else 0.0)
                       for oi in range(noff)]
            sz_list = [indz[oi] + (indz[oi - 1] if oi > 0 else 0.0)
                       for oi in range(noff)]
        else:
            wz_list = [jnp.full(px.shape, 1.0 if o == 0 else 0.0, px.dtype)
                       for o in range(-W, W + 1)]
            sz_list = wz_list
    return wx, wy, wz_list, sx, sy, sz_list


def _warp_group_kernel(px_ref, py_ref, pz_ref, *refs, W, S, Z, Y, X, Yt,
                       Xt, Fs, nearest, minmax, zclamped=False):
    # Y/X: padded in-plane block sizes; Yt/Xt/Z: true domain extents for
    # the BUILD_INDEX border clamps; F channels share this program's
    # positions. Each program computes S consecutive output z-slices so
    # the in-plane rolls of the S + 2W source slices are computed ONCE and
    # shared by every output slice whose window covers them (the z-windows
    # of adjacent slices overlap in 2W slices; per-slice programs would
    # re-roll them). With minmax=True, two extra output channels carry
    # min/max of channel 0 over the interpolation's corner support
    # {i, i+1}^3 — exactly the corner set of the reference's MacCormack
    # clamp lookup cell (tfluids.cc doClampComponent: clamp(trunc(i +
    # sign*vel)) equals the window-clamped position's base corner).
    # refs layout: n source HBM refs, the output ref, n scratch buffers,
    # n DMA semaphores (n = len(Fs); channel f maps to the source holding
    # it, concatenation order).
    n_src = len(Fs)
    srcs_hbm = refs[:n_src]
    out_ref = refs[n_src]
    scratches = refs[n_src + 1:2 * n_src + 1]
    sems = refs[2 * n_src + 1:]
    F = sum(Fs)
    bg = pl.program_id(0)
    ks = pl.program_id(1)
    noff = 2 * W + 1
    nsrc = S + 2 * W

    if zclamped:
        # The source arrays are NOT z-padded (saves a full-field copy per
        # call): clamp the DMA window into the domain and shift the static
        # scratch indices back. Out-of-domain sources read a clamped
        # (garbage) slice whose z-weight is provably zero — the weight
        # indicators compare against the clamped zi in [0, Z-2] while the
        # out-of-domain slice index is outside [0, Z-1].
        start = jnp.clip(ks * S - W, 0, Z - nsrc)
        shift = ks * S - W - start
        dmas = [pltpu.make_async_copy(
            srcs_hbm[i].at[bg, :, pl.ds(start, nsrc)], scratches[i],
            sems[i]) for i in range(n_src)]
    else:
        shift = None
        dmas = [pltpu.make_async_copy(
            srcs_hbm[i].at[bg, :, pl.ds(ks * S, nsrc)], scratches[i],
            sems[i]) for i in range(n_src)]
    for dma in dmas:
        dma.start()

    _route = []
    for i, Fi in enumerate(Fs):
        _route += [(i, fi) for fi in range(Fi)]

    def _src(f, j):
        i, fi = _route[f]
        if not zclamped:
            return scratches[i][fi, j]
        return scratches[i][fi, jnp.clip(j + shift, 0, nsrc - 1)]

    ii = jax.lax.broadcasted_iota(jnp.int32, (Y, X), 1)
    jj = jax.lax.broadcasted_iota(jnp.int32, (Y, X), 0)

    per_s = []
    for s in range(S):
        px = px_ref[0, s] - 0.5
        py = py_ref[0, s] - 0.5
        pz = pz_ref[0, s] - 0.5
        k_abs = ks * S + s
        per_s.append(_slice_weights(px, py, pz, k_abs, ii, jj, W, Z,
                                    Yt, Xt, nearest))

    for dma in dmas:
        dma.wait()

    # minmax: False | True (bounds of channel 0) | (cmin, cmax) (min of
    # channel cmin / max of channel cmax — lets callers pass fluid-masked
    # +-sentinel bound sources; those channels' weighted accumulations are
    # skipped).
    cmin, cmax = (minmax if isinstance(minmax, tuple)
                  else (0, 0)) if minmax else (None, None)
    skip_acc = ({cmin, cmax} if isinstance(minmax, tuple) else set())
    accs = [[jnp.zeros((Y, X), jnp.float32) for _ in range(F)]
            for _ in range(S)]
    if minmax:
        mns = [jnp.full((Y, X), jnp.inf, jnp.float32) for _ in range(S)]
        mxs = [jnp.full((Y, X), -jnp.inf, jnp.float32) for _ in range(S)]
    # Loop over source slices and in-plane offsets; each rolled plane is
    # consumed by every output slice s with s <= j <= s + 2W. 2-D grids
    # (Z == 1, S == 1): only the zero z-offset carries weight.
    j_range = range(nsrc) if Z > 1 else [W]
    for j in j_range:
        svals = [s for s in range(S) if 0 <= j - s <= 2 * W] if Z > 1 \
            else [0]
        planes = [_src(f, j) for f in range(F)]
        for oyi, oy in enumerate(range(-W, W + 1)):
            rolled = [pltpu.roll(planes[f], (-oy) % Y, 0) if Y > 1
                      else planes[f] for f in range(F)]
            wzy = {}
            szy = {}
            for s in svals:
                wx, wy, wz_list, sx, sy, sz_list = per_s[s]
                ozi = j - s if Z > 1 else W
                wzy[s] = wz_list[ozi] * wy[oyi]
                if minmax:
                    szy[s] = sz_list[ozi] * sy[oyi]
            for oxi, ox in enumerate(range(-W, W + 1)):
                vals = [pltpu.roll(rolled[f], (-ox) % X, 1)
                        for f in range(F)]
                for s in svals:
                    wx, wy, wz_list, sx, sy, sz_list = per_s[s]
                    wfull = wzy[s] * wx[oxi]
                    for f in range(F):
                        if f not in skip_acc:
                            accs[s][f] = accs[s][f] + vals[f] * wfull
                    if minmax:
                        s3 = (szy[s] * sx[oxi]) > 0.5
                        mns[s] = jnp.where(
                            s3, jnp.minimum(mns[s], vals[cmin]), mns[s])
                        mxs[s] = jnp.where(
                            s3, jnp.maximum(mxs[s], vals[cmax]), mxs[s])
    for s in range(S):
        for f in range(F):
            out_ref[0, f, s] = accs[s][f]
        if minmax:
            out_ref[0, F, s] = mns[s]
            out_ref[0, F + 1, s] = mxs[s]


# --- differentiation -----------------------------------------------------
# The warp is linear in `fields` with weights fixed by the positions, so
# its VJP is the transposed windowed scatter. Production path: a second
# Pallas kernel (_warp_transpose_kernel) with the same roll-accumulate
# structure as the forward; _warp_transpose_xla is kept as the reference
# oracle for its parity tests. Positions get zero cotangents — matching
# the reference, whose backtraces are treated as constants in every
# hand-written adjoint (generic/tfluids.cc has hand adjoints only for
# divergence and velocityUpdate).

def _weights_xla(p, iota, n_idx, W, nearest):
    p = p - 0.5
    if nearest:
        i = jnp.clip(jnp.floor(p).astype(jnp.int32), 0, n_idx - 1)
        return [(i == iota + o).astype(p.dtype) for o in range(-W, W + 1)]
    i = jnp.floor(p).astype(jnp.int32)
    w1 = p - i.astype(p.dtype)
    w0 = 1.0 - w1
    neg = p < 0.0
    i = jnp.where(neg, 0, i)
    w0 = jnp.where(neg, 1.0, w0)
    w1 = jnp.where(neg, 0.0, w1)
    hi = i >= n_idx - 1
    i = jnp.where(hi, n_idx - 2, i)
    w0 = jnp.where(hi, 0.0, w0)
    w1 = jnp.where(hi, 1.0, w1)
    return [w0 * (i == iota + o) + w1 * (i == iota + o - 1)
            for o in range(-W, W + 1)]


def _shiftn(a, off, axis):
    """shift with zero fill: out[i] = a[i + off]."""
    from fluidnet_tpu.ops.stencil import shift
    return shift(a, off, axis)


def _warp_transpose_xla(g, px, py, pz, window, nearest, F, ZYX):
    """grad_fields(s) = sum_o shift(g * w_o, -o): the adjoint scatter.

    g may carry 2 extra minmax channels beyond the F field channels;
    their cotangents are dropped (clamp bounds are treated as constants
    under differentiation — the reference computes no advection adjoint
    at all, generic/tfluids.cc has hand adjoints only for divergence and
    velocityUpdate)."""
    W = int(window)
    Z, Y, X = ZYX
    b, G = px.shape[:2]
    g = g[:, :, :F]
    sh = px.shape
    ix = jax.lax.broadcasted_iota(jnp.int32, sh, 4)
    iy = jax.lax.broadcasted_iota(jnp.int32, sh, 3)
    iz = jax.lax.broadcasted_iota(jnp.int32, sh, 2)
    wx = _weights_xla(px, ix, X, W, nearest)
    wy = _weights_xla(py, iy, Y, W, nearest)
    if Z > 1:
        wz = _weights_xla(pz, iz, Z, W, nearest)
    else:
        n = len(wx)
        wz = [jnp.full(sh, 1.0 if o == W else 0.0, px.dtype)
              for o in range(n)]
    off_lo = -W
    grad = jnp.zeros_like(g)
    for ozi, wzo in enumerate(wz):
        for oyi, wyo in enumerate(wy):
            wzy = wzo * wyo
            for oxi, wxo in enumerate(wx):
                w = (wzy * wxo)[:, :, None]        # broadcast over F
                t = g * w
                oz, oy, ox = off_lo + ozi, off_lo + oyi, off_lo + oxi
                if oz and Z > 1:
                    t = _shiftn(t, -oz, -3)
                if oy:
                    t = _shiftn(t, -oy, -2)
                if ox:
                    t = _shiftn(t, -ox, -1)
                grad = grad + t
    return grad


def _warp_transpose_kernel(pos_hbm, g_hbm, out_ref, pscr, gscr, psem, gsem,
                           *, W, S, Z, Y, X, Yt, Xt, F, nearest,
                           zclamped):
    """Adjoint of the windowed warp, as a windowed roll-accumulate.

    grad[k] = sum_s roll(g_s * w_s->k): each program computes S output
    slices; every source slice in the (S + 2W)-wide window is processed
    once — its in-plane weight products are pre-rolled to target
    coordinates (roll(a*b) == roll(a)*roll(b) per axis) as the pair
    (P0, P1) = roll(g*f0*wy*wx), roll(g*f1*wy*wx) plus the rolled base
    corner Zr = roll(zi), and each covered output slice k keeps its z-tap
    with two comparisons: P0*(Zr == k) + P1*(Zr == k-1) — so the rolls
    are shared across the up-to-(2W+1) outputs a source reaches."""
    bg = pl.program_id(0)
    ks = pl.program_id(1)
    noff = 2 * W + 1
    nsrc = S + 2 * W

    if zclamped:
        start = jnp.clip(ks * S - W, 0, Z - nsrc)
        shift = ks * S - W - start
    else:
        start = ks * S
        shift = None
    pdma = pltpu.make_async_copy(pos_hbm.at[bg, :, pl.ds(start, nsrc)],
                                 pscr, psem)
    gdma = pltpu.make_async_copy(g_hbm.at[bg, :, pl.ds(start, nsrc)],
                                 gscr, gsem)
    pdma.start()
    gdma.start()

    ii = jax.lax.broadcasted_iota(jnp.int32, (Y, X), 1)
    jj = jax.lax.broadcasted_iota(jnp.int32, (Y, X), 0)
    pdma.wait()
    gdma.wait()

    def rd(scr, f, j):
        if not zclamped:
            return scr[f, j]
        return scr[f, jnp.clip(j + shift, 0, nsrc - 1)]

    accs = [[jnp.zeros((Y, X), jnp.float32) for _ in range(F)]
            for _ in range(S)]
    # j indexes the source-slice window: source s_abs = ks*S - W + j.
    j_range = range(nsrc) if Z > 1 else [W]
    for j in j_range:
        kvals = [s for s in range(S) if 0 <= j - s <= 2 * W] \
            if Z > 1 else [0]
        if not kvals:
            continue
        px = rd(pscr, 0, j) - 0.5
        py = rd(pscr, 1, j) - 0.5
        if nearest:
            wx = _nearest_weights(px, Xt, ii, W)
            wy = _nearest_weights(py, Yt, jj, W)
        else:
            wx, _ = _corner_weights(px, Xt, ii, W)
            wy, _ = _corner_weights(py, Yt, jj, W)
        if Z > 1:
            # With a clamped (padless) DMA window, an out-of-domain source
            # index reads a clamped slice whose garbage positions could
            # alias a real output: zero it by slice validity instead.
            s_abs = ks * S - W + j
            valid = jnp.logical_and(s_abs >= 0, s_abs < Z) if zclamped \
                else True
            pz = rd(pscr, 2, j) - 0.5
            if nearest:
                zi = jnp.clip(jnp.floor(pz).astype(jnp.int32), 0, Z - 1)
                A0 = [jnp.where(valid, rd(gscr, f, j), 0.0)
                      for f in range(F)]
                A1 = None
            else:
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
                if zclamped:
                    f0 = jnp.where(valid, f0, 0.0)
                    f1 = jnp.where(valid, f1, 0.0)
                A0 = [rd(gscr, f, j) * f0 for f in range(F)]
                A1 = [rd(gscr, f, j) * f1 for f in range(F)]
        else:
            zi = None
            A0 = [rd(gscr, f, j) for f in range(F)]
            A1 = None
        for oyi, oy in enumerate(range(-W, W + 1)):
            B0 = [pltpu.roll(A0[f] * wy[oyi], oy % Y, 0) if Y > 1
                  else A0[f] * wy[oyi] for f in range(F)]
            B1 = [pltpu.roll(A1[f] * wy[oyi], oy % Y, 0) if Y > 1
                  else A1[f] * wy[oyi] for f in range(F)] \
                if A1 is not None else None
            wxr = [pltpu.roll(wx[oxi], oy % Y, 0) if Y > 1 else wx[oxi]
                   for oxi in range(noff)]
            Zy = (pltpu.roll(zi, oy % Y, 0) if Y > 1 else zi) \
                if zi is not None else None
            for oxi, ox in enumerate(range(-W, W + 1)):
                P0 = [pltpu.roll(B0[f] * wxr[oxi], ox % X, 1)
                      for f in range(F)]
                P1 = [pltpu.roll(B1[f] * wxr[oxi], ox % X, 1)
                      for f in range(F)] if B1 is not None else None
                Zr = pltpu.roll(Zy, ox % X, 1) if Zy is not None else None
                for s in kvals:
                    if Zr is None:                    # 2-D
                        for f in range(F):
                            accs[s][f] = accs[s][f] + P0[f]
                        continue
                    k_abs = ks * S + s
                    i0 = (Zr == k_abs)
                    if P1 is None:                    # nearest
                        for f in range(F):
                            accs[s][f] = accs[s][f] + jnp.where(
                                i0, P0[f], 0.0)
                    else:
                        i1 = (Zr == k_abs - 1)
                        for f in range(F):
                            accs[s][f] = accs[s][f] + jnp.where(
                                i0, P0[f], 0.0) + jnp.where(
                                i1, P1[f], 0.0)
    for s in range(S):
        for f in range(F):
            out_ref[0, f, s] = accs[s][f]


@functools.partial(jax.jit, static_argnames=("window", "nearest"))
def _warp_transpose_pallas(g, px, py, pz, window, nearest):
    """Pallas adjoint scatter: g (b, G, F, Z, Y, X) cotangent (minmax
    channels already stripped), positions (b, G, Z, Y, X). Returns
    grad_fields with the same shape as g."""
    W = int(window)
    b, G, F, Z, Y, X = g.shape
    Xp, Yp = _round_up(X, 128), _round_up(Y, 8)
    if (Xp, Yp) != (X, Y):
        gpads = ((0, 0),) * 4 + ((0, Yp - Y), (0, Xp - X))
        ppads = ((0, 0),) * 3 + ((0, Yp - Y), (0, Xp - X))
        g = jnp.pad(g, gpads)
        px = jnp.pad(px, ppads, constant_values=0.5)
        py = jnp.pad(py, ppads, constant_values=0.5)
        pz = jnp.pad(pz, ppads, constant_values=0.5)

    S = min(slices_per_program(), Z) if Z > 1 else 1
    Zs = _round_up(Z, S)
    zclamped = Z > 1 and Zs == Z and Z >= S + 2 * W and S >= W
    pos = jnp.stack([px, py, pz], axis=2)           # (b, G, 3, Z, Yp, Xp)
    if zclamped:
        gp = g.reshape(b * G, F, Z, Yp, Xp)
        pos = pos.reshape(b * G, 3, Z, Yp, Xp)
    else:
        zpad = (W, Zs - Z + W)
        gp = jnp.pad(g, ((0, 0), (0, 0), (0, 0), zpad, (0, 0), (0, 0)))
        gp = gp.reshape(b * G, F, Zs + 2 * W, Yp, Xp)
        pos = jnp.pad(pos, ((0, 0), (0, 0), (0, 0), zpad, (0, 0),
                            (0, 0)), constant_values=0.5)
        pos = pos.reshape(b * G, 3, Zs + 2 * W, Yp, Xp)

    out = pl.pallas_call(
        functools.partial(_warp_transpose_kernel, W=W, S=S, Z=Z, Y=Yp,
                          X=Xp, Yt=Y, Xt=X, F=F, nearest=nearest,
                          zclamped=zclamped),
        grid=(b * G, Zs // S),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, F, S, Yp, Xp),
                               lambda bg, k: (bg, 0, k, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * G, F, Zs, Yp, Xp),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((3, S + 2 * W, Yp, Xp), jnp.float32),
            pltpu.VMEM((F, S + 2 * W, Yp, Xp), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(pos, gp)
    return out.reshape(b, G, F, Zs, Yp, Xp)[..., :Z, :Y, :X]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _warp_group(fields, px, py, pz, window, nearest, minmax=False):
    return _warp_group_impl(fields, px, py, pz, window, nearest, minmax)


def _warp_group_fwd(fields, px, py, pz, window, nearest, minmax):
    out = _warp_group_impl(fields, px, py, pz, window, nearest, minmax)
    fs = fields if isinstance(fields, tuple) else (fields,)
    Fs = tuple(f.shape[2] for f in fs)
    return out, (px, py, pz, Fs, isinstance(fields, tuple),
                 fs[0].shape[3:])


def _warp_group_bwd(window, nearest, minmax, res, g):
    px, py, pz, Fs, was_tuple, ZYX = res
    F = sum(Fs)
    grad_fields = _warp_transpose_pallas(g[:, :, :F], px, py, pz,
                                         int(window), nearest)
    if was_tuple:
        splits = []
        lo = 0
        for Fi in Fs:
            splits.append(grad_fields[:, :, lo:lo + Fi])
            lo += Fi
        grad_fields = tuple(splits)
    return (grad_fields, jnp.zeros_like(px), jnp.zeros_like(py),
            jnp.zeros_like(pz))


_warp_group.defvjp(_warp_group_fwd, _warp_group_bwd)


@functools.partial(jax.jit, static_argnames=("window", "nearest",
                                              "minmax"))
def _warp_group_impl(fields, px, py, pz, window, nearest, minmax=False):
    """fields: (b, G, F, Z, Y, X) — or a TUPLE of such arrays sharing
    (b, G, Z, Y, X) whose channels concatenate (each is DMA'd separately,
    avoiding a host-graph concatenate copy). positions (b, G, Z, Y, X)
    shared by the channels of each group. Returns (b, G, sumF, Z, Y, X)
    (+2 channels with minmax)."""
    W = int(window)
    fs = list(fields) if isinstance(fields, tuple) else [fields]
    b, G, _, Z, Y, X = fs[0].shape
    Fs = tuple(f.shape[2] for f in fs)
    F = sum(Fs)
    assert px.shape == (b, G, Z, Y, X)
    assert all(f.shape[:2] == (b, G) and f.shape[3:] == (Z, Y, X)
               for f in fs)
    assert not (minmax and nearest)
    Fo = F + (2 if minmax else 0)
    # Mosaic VMEM slices must be (8, 128)-tile aligned: pad y/x up. Padded
    # cells compute garbage that is sliced away; padded positions default
    # to in-range cell centers so the weight math stays finite.
    Xp, Yp = _round_up(X, 128), _round_up(Y, 8)
    if (Xp, Yp) != (X, Y):
        fpads = ((0, 0),) * 4 + ((0, Yp - Y), (0, Xp - X))
        ppads = ((0, 0),) * 3 + ((0, Yp - Y), (0, Xp - X))
        fs = [jnp.pad(f, fpads) for f in fs]
        px = jnp.pad(px, ppads, constant_values=0.5)
        py = jnp.pad(py, ppads, constant_values=0.5)
        pz = jnp.pad(pz, ppads, constant_values=0.5)

    # S output slices per program share the rolled source planes of their
    # overlapping z-windows (see _warp_group_kernel).
    S = min(slices_per_program(), Z) if Z > 1 else 1
    Zs = _round_up(Z, S)
    # When every program's clamped window fits the domain, skip the z-pad
    # entirely (it is a full-field copy per call) — the kernel clamps its
    # DMA window and shifts indices instead.
    zclamped = Z > 1 and Zs == Z and Z >= S + 2 * W and S >= W
    if zclamped:
        srcps = [f.reshape(b * G, Fi, Z, Yp, Xp)
                 for f, Fi in zip(fs, Fs)]
    else:
        zpad = (W, Zs - Z + W)
        srcps = [jnp.pad(f, ((0, 0), (0, 0), (0, 0), zpad, (0, 0),
                             (0, 0))).reshape(b * G, Fi, Zs + 2 * W, Yp,
                                              Xp)
                 for f, Fi in zip(fs, Fs)]
    if Zs != Z:
        ppadz = ((0, 0),) * 2 + ((0, Zs - Z), (0, 0), (0, 0))
        px = jnp.pad(px, ppadz, constant_values=0.5)
        py = jnp.pad(py, ppadz, constant_values=0.5)
        pz = jnp.pad(pz, ppadz, constant_values=0.5)
    pxr = px.reshape(b * G, Zs, Yp, Xp)
    pyr = py.reshape(b * G, Zs, Yp, Xp)
    pzr = pz.reshape(b * G, Zs, Yp, Xp)

    pos_spec = pl.BlockSpec((1, S, Yp, Xp), lambda bg, k: (bg, k, 0, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_warp_group_kernel, W=W, S=S, Z=Z, Y=Yp, X=Xp,
                          Yt=Y, Xt=X, Fs=Fs, nearest=nearest,
                          minmax=minmax, zclamped=zclamped),
        grid=(b * G, Zs // S),
        in_specs=[pos_spec, pos_spec, pos_spec] +
                 [pl.BlockSpec(memory_space=pl.ANY) for _ in srcps],
        out_specs=pl.BlockSpec((1, Fo, S, Yp, Xp),
                               lambda bg, k: (bg, 0, k, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * G, Fo, Zs, Yp, Xp),
                                       jnp.float32),
        scratch_shapes=[pltpu.VMEM((Fi, S + 2 * W, Yp, Xp), jnp.float32)
                        for Fi in Fs] +
                       [pltpu.SemaphoreType.DMA for _ in Fs],
        # The default scoped-vmem cap is 16 MB; multi-channel outputs at
        # 128^3 exceed it (v5e has 128 MB physical VMEM).
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(pxr, pyr, pzr, *srcps)
    return out.reshape(b, G, Fo, Zs, Yp, Xp)[..., :Z, :Y, :X]


def warp_trilinear(fields, px, py, pz, window: int = DEFAULT_WINDOW):
    """Per-channel positions: fields (b, c, Z, Y, X), px/py/pz
    (b, c, z, y, x). Returns (b, c, Z, Y, X)."""
    b, c = fields.shape[:2]
    out = _warp_group(fields[:, :, None], px, py, pz, window, False)
    return out[:, :, 0]


def warp_trilinear_shared(fields, px, py, pz, window: int = DEFAULT_WINDOW):
    """Shared positions for every channel: px/py/pz are (b, z, y, x)."""
    out = _warp_group(fields[:, None], px[:, None], py[:, None],
                      pz[:, None], window, False)
    return out[:, 0]


def warp_group(fields, px, py, pz, window: int = DEFAULT_WINDOW,
               nearest: bool = False, minmax: bool = False):
    """Raw grouped interface: fields (b, G, F, Z, Y, X), positions
    (b, G, z, y, x). With minmax=True the output gains two channels
    carrying min/max of channel 0 over the interpolation's corner
    support — fusing the MacCormack clamp-bound lookup into the sweep
    that already rolls those cells through the VPU (the support
    {i, i+1}^3 equals the corner set of the reference's clamp cell
    clamp(trunc(i + sign*vel)), tfluids.cc doClampComponent, for window-
    clamped positions). Bounds get zero cotangents under differentiation
    (the reference computes no advection adjoint)."""
    return _warp_group(fields, px, py, pz, window, nearest, minmax)


def warp_fluid(src, flags, px, py, pz, window: int = DEFAULT_WINDOW):
    """Fluid-aware interpolation, fast path.

    TPU-native replacement for RealGrid::interpolWithFluid
    (grid.cc:224-332): instead of the reference's pairwise cascade we use
    mask-renormalized trilinear interpolation —

        out = (sum w_i m_i v_i) / (sum w_i m_i)   if any fluid corner,
              plain trilinear                     otherwise

    which matches the cascade whenever the non-fluid corners form whole
    faces/edges (the common case at obstacle boundaries) and is smooth in
    general. The exact cascade remains available on the gather path
    (ops.interp.interpol_with_fluid). src: (b, 1, Z, Y, X).
    """
    from fluidnet_tpu.core.celltype import is_fluid
    m = is_fluid(flags).astype(src.dtype)
    out = _warp_group((src[:, None], (src * m)[:, None], m[:, None]),
                      px[:, None], py[:, None], pz[:, None], window,
                      False)[:, 0]
    plain, num, den = out[:, 0:1], out[:, 1:2], out[:, 2:3]
    safe = den > 1e-6
    return jnp.where(safe, num / jnp.where(safe, den, 1.0), plain)


def gather_cells(fields, xi, yi, zi, window: int = DEFAULT_WINDOW):
    """Windowed integer-cell gather: fields[..., zi, yi, xi] where the
    indices lie within +-window of each cell (replaces gather3d on the hot
    path). Uses the cheaper nearest mode ((2W+1)^3 indicator taps).

    fields: (b, c, Z, Y, X); xi/yi/zi: (b, z, y, x) int32.
    """
    px = xi.astype(jnp.float32) + 0.5
    py = yi.astype(jnp.float32) + 0.5
    pz = zi.astype(jnp.float32) + 0.5
    out = _warp_group(fields[:, None], px[:, None], py[:, None],
                      pz[:, None], window, True)
    return out[:, 0]


def clamp_displacement(dx, dy, dz, window: int, margin: float = 1e-3):
    """Clamps per-axis displacements so all interpolation corners stay in
    the +-window stencil (the windowed kernels' contract). Physically a CFL
    limiter; the reference instead relies on its velocity clamp
    (simulate.lua:326)."""
    lim = window - margin
    return (jnp.clip(dx, -lim, lim), jnp.clip(dy, -lim, lim),
            jnp.clip(dz, -lim, lim))
