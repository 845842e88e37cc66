"""Fused vorticity-confinement Pallas kernel (3-D).

The XLA formulation (ops.forces.vorticity_confinement) is a 4-stage
stencil chain — centered velocity, curl + |curl|, normalized gradient of
|curl|, cross-product force, face-wise apply — each stage a full-grid HBM
round trip. This kernel keeps the whole chain in VMEM: one program per
(batch, z-block) DMAs a (S + 6)-slice velocity/flags window and emits the
force-applied velocity for its S slices, mirroring
Main_vorticityConfinement (third_party/tfluids.cc:1312-1458) stage by
stage (same border zeroing, vec3-epsilon norm guards, and fluid/empty
face gating as the XLA port, which the golden/oracle suites pin).

Differentiation: the op is used inside training rollouts; the kernel gets
a custom VJP that replays the XLA formulation under jax.vjp (the chain is
deep enough that a hand adjoint isn't worth it; the XLA backward runs
only under 'full'-mode training).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fluidnet_tpu.ops.pallas.warp import (_interpret, _round_up,
                                          slices_per_program)

_VEC3_EPS = 1e-6
_HALO = 3          # out <- force(+-1) <- grad|w|(+-1) <- curl(cent(+-1))


def _vc_kernel(amp_ref, u_hbm, fl_hbm, out_ref, uscr, fscr, usem, fsem,
               *, S, Z, Y, X, Yt, Xt):
    b = pl.program_id(0)
    ks = pl.program_id(1)
    n = S + 2 * _HALO

    start = jnp.clip(ks * S - _HALO, 0, jnp.maximum(Z - n, 0))
    shift = ks * S - _HALO - start
    udma = pltpu.make_async_copy(u_hbm.at[b, :, pl.ds(start, n)], uscr,
                                 usem)
    fdma = pltpu.make_async_copy(fl_hbm.at[b, :, pl.ds(start, n)], fscr,
                                 fsem)
    udma.start()
    fdma.start()

    ii = jax.lax.broadcasted_iota(jnp.int32, (Y, X), 1)
    jj = jax.lax.broadcasted_iota(jnp.int32, (Y, X), 0)
    inplane_int = ((ii > 0) & (ii < Xt - 1) & (jj > 0) & (jj < Yt - 1))
    amp = amp_ref[0]

    def rd(scr, f, j):
        return scr[f, jnp.clip(j + shift, 0, n - 1)]

    udma.wait()
    fdma.wait()

    def xm(a):
        return jnp.where(ii == 0, 0.0, pltpu.roll(a, 1, 1))

    def xp(a):
        return jnp.where(ii == Xt - 1, 0.0, pltpu.roll(a, (-1) % X, 1))

    def ym(a):
        return jnp.where(jj == 0, 0.0, pltpu.roll(a, 1, 0))

    def yp(a):
        return jnp.where(jj == Yt - 1, 0.0, pltpu.roll(a, (-1) % Y, 0))

    # Stage 1: centered velocity, zero on the 1-cell border
    # (forces.get_centered). cent(j) needs u(j), u(j+1).
    def cent(j):
        c_abs = ks * S - _HALO + j
        interior = jnp.logical_and(c_abs >= 1, c_abs <= Z - 2)
        u0 = rd(uscr, 0, j)
        u1 = rd(uscr, 1, j)
        u2 = rd(uscr, 2, j)
        u2p = rd(uscr, 2, j + 1)
        m = jnp.where(interior, 1.0, 0.0) * inplane_int.astype(
            jnp.float32)
        return (0.5 * (u0 + xp(u0)) * m, 0.5 * (u1 + yp(u1)) * m,
                0.5 * (u2 + u2p) * m)

    cents = [cent(j) for j in range(n - 1)]

    # Stage 2: central-difference curl of cent + |curl|, interior only
    # (forces._curl + the interior masks in vorticity_confinement).
    def curl(j):
        c_abs = ks * S - _HALO + j
        interior = jnp.logical_and(c_abs >= 1, c_abs <= Z - 2)
        cxm1 = cents[j - 1]
        cxp1 = cents[j + 1]
        cx, cy, cz = cents[j]
        wx = 0.5 * ((yp(cz) - ym(cz)) - (cxp1[1] - cxm1[1]))
        wy = 0.5 * ((cxp1[0] - cxm1[0]) - (xp(cz) - xm(cz)))
        wz = 0.5 * ((xp(cy) - xm(cy)) - (yp(cx) - ym(cx)))
        m = jnp.where(interior, 1.0, 0.0) * inplane_int.astype(
            jnp.float32)
        wx, wy, wz = wx * m, wy * m, wz * m
        nsq = wx * wx + wy * wy + wz * wz
        nz = nsq > _VEC3_EPS
        wnorm = jnp.where(nz, jnp.sqrt(jnp.where(nz, nsq, 1.0)), 0.0) * m
        return wx, wy, wz, wnorm

    curls = [None] + [curl(j) for j in range(1, n - 2)]

    # Stage 3+4: normalized grad|w| x w force, interior only.
    def force(j):
        c_abs = ks * S - _HALO + j
        interior = jnp.logical_and(c_abs >= 1, c_abs <= Z - 2)
        nm1 = curls[j - 1][3]
        np1 = curls[j + 1][3]
        wx, wy, wz, wn = curls[j]
        gx = 0.5 * (xp(wn) - xm(wn))
        gy = 0.5 * (yp(wn) - ym(wn))
        gz = 0.5 * (np1 - nm1)
        gsq = gx * gx + gy * gy + gz * gz
        ok = gsq > _VEC3_EPS
        gn = jnp.where(ok, jnp.sqrt(jnp.where(ok, gsq, 1.0)), 0.0)
        inv = jnp.where(ok, 1.0 / jnp.where(ok, gn, 1.0), 0.0)
        gx, gy, gz = gx * inv, gy * inv, gz * inv
        m = jnp.where(interior, amp, 0.0) * inplane_int.astype(
            jnp.float32)
        return ((gy * wz - gz * wy) * m, (gz * wx - gx * wz) * m,
                (gx * wy - gy * wx) * m)

    forces = {j: force(j) for j in range(2, n - 3)}

    # Stage 5: face-wise AddForceField apply (forces._add_force_field):
    # cur = (fluid|empty) & interior; face m = cur & (fl_m | (fl & em_m)).
    for s in range(S):
        j = s + _HALO
        c_abs = ks * S + s
        fli = rd(fscr, 0, j).astype(jnp.int32)
        fl = (fli & 1) > 0
        em = (fli & 4) > 0
        interior = jnp.logical_and(c_abs >= 1, c_abs <= Z - 2)
        cur = (fl | em) & inplane_int & interior
        fx, fy, fz = forces[j]
        fxm1, fym1, fzm1 = forces[j - 1]

        # Mosaic can't rotate i1 vectors: roll the int flag plane instead
        # and re-derive the bit tests.
        fli_xm = jnp.where(ii == 0, 0, pltpu.roll(fli, 1, 1))
        fli_ym = jnp.where(jj == 0, 0, pltpu.roll(fli, 1, 0))
        flm_x = (fli_xm & 1) > 0
        emm_x = (fli_xm & 4) > 0
        flm_y = (fli_ym & 1) > 0
        emm_y = (fli_ym & 4) > 0
        flim1 = rd(fscr, 0, j - 1).astype(jnp.int32)
        zok = c_abs > 0
        flm_z = jnp.logical_and(zok, (flim1 & 1) > 0)
        emm_z = jnp.logical_and(zok, (flim1 & 4) > 0)

        mx = cur & (flm_x | (fl & emm_x))
        my = cur & (flm_y | (fl & emm_y))
        mz = cur & (flm_z | (fl & emm_z))
        u0 = rd(uscr, 0, j)
        u1 = rd(uscr, 1, j)
        u2 = rd(uscr, 2, j)
        out_ref[0, 0, s] = jnp.where(
            mx, u0 + 0.5 * (jnp.where(ii == 0, 0.0,
                                      pltpu.roll(fx, 1, 1)) + fx), u0)
        out_ref[0, 1, s] = jnp.where(
            my, u1 + 0.5 * (jnp.where(jj == 0, 0.0,
                                      pltpu.roll(fy, 1, 0)) + fy), u1)
        out_ref[0, 2, s] = jnp.where(mz, u2 + 0.5 * (fzm1 + fz), u2)


@functools.partial(jax.jit, static_argnames=())
def _vc_pallas_impl(u, flags, amp):
    b, _, Z, Y, X = u.shape
    Xp, Yp = _round_up(X, 128), _round_up(Y, 8)
    if (Xp, Yp) != (X, Y):
        pads = ((0, 0),) * 3 + ((0, Yp - Y), (0, Xp - X))
        u = jnp.pad(u, pads)
        flags = jnp.pad(flags, pads, constant_values=2)  # obstacle
    S = min(slices_per_program(), Z)
    Zs = _round_up(Z, S)
    n = S + 2 * _HALO
    # Sources must cover one full DMA window; the interior masks (keyed
    # on the true Z) zero every contribution from pad slices.
    Zsrc = max(Zs, n)
    if Zsrc != Z:
        u = jnp.pad(u, ((0, 0), (0, 0), (0, Zsrc - Z), (0, 0), (0, 0)))
        flags = jnp.pad(flags, ((0, 0), (0, 0), (0, Zsrc - Z), (0, 0),
                                (0, 0)), constant_values=2)
    amp_arr = jnp.asarray(amp, jnp.float32).reshape(1)

    out = pl.pallas_call(
        functools.partial(_vc_kernel, S=S, Z=Z, Y=Yp, X=Xp, Yt=Y, Xt=X),
        grid=(b, Zs // S),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, 3, S, Yp, Xp),
                               lambda bb, k: (bb, 0, k, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 3, Zs, Yp, Xp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((3, n, Yp, Xp), jnp.float32),
            pltpu.VMEM((1, n, Yp, Xp), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(amp_arr, u, flags.astype(jnp.int32))
    return out[..., :Z, :Y, :X]


_FB_HALO = 4       # vc's 3 + one more slice below for buoyancy's rho(k-1)


def _fb_kernel(sc_ref, u_hbm, fl_hbm, rho_hbm, *refs, S, Z, Y, X, Yt, Xt,
               epi=False, has_ubc=False):
    """Fused forces block: u' = buoyancy+gravity(u), then the
    vorticity-confinement chain of _vc_kernel on u'.

    sc_ref (SMEM, 7): [bx, by, bz, gx, gy, gz, amp] where b* is
    add_buoyancy's per-face strength (-buoy_g * dt / dx), g* is
    add_gravity's force (grav_g * dt / dx).

    epi=True is the fused *projection prologue* (ops.prologue): the
    kernel additionally applies the frozen slab boundary conditions
    (sim.simulate.apply_boundaries) to u before the forces (has_ubc) and
    again after, then applies setWallBcs (ops.boundary semantics incl.
    Stick) and emits the Manta-RHS velocity divergence as a 4th output
    channel — everything the convnet projection consumes, one HBM pass."""
    b = pl.program_id(0)
    ks = pl.program_id(1)
    n = S + 2 * _FB_HALO

    if has_ubc:
        ubc_hbm, uinv_hbm = refs[0], refs[1]
        refs = refs[2:]
    out_ref, uscr, fscr, rscr = refs[:4]
    refs = refs[4:]
    if has_ubc:
        bscr, iscr = refs[0], refs[1]
        refs = refs[2:]
    usem, fsem, rsem = refs[:3]

    start = jnp.clip(ks * S - _FB_HALO, 0, jnp.maximum(Z - n, 0))
    shift = ks * S - _FB_HALO - start
    dmas = [pltpu.make_async_copy(h.at[b, :, pl.ds(start, n)], s, sem)
            for h, s, sem in ((u_hbm, uscr, usem), (fl_hbm, fscr, fsem),
                              (rho_hbm, rscr, rsem))]
    if has_ubc:
        dmas.append(pltpu.make_async_copy(
            ubc_hbm.at[b, :, pl.ds(start, n)], bscr, refs[3]))
        dmas.append(pltpu.make_async_copy(
            uinv_hbm.at[b, :, pl.ds(start, n)], iscr, refs[4]))
    for dma in dmas:
        dma.start()

    ii = jax.lax.broadcasted_iota(jnp.int32, (Y, X), 1)
    jj = jax.lax.broadcasted_iota(jnp.int32, (Y, X), 0)
    inplane_int = ((ii > 0) & (ii < Xt - 1) & (jj > 0) & (jj < Yt - 1))
    sx, sy, sz = sc_ref[0], sc_ref[1], sc_ref[2]
    gfx, gfy, gfz = sc_ref[3], sc_ref[4], sc_ref[5]
    amp = sc_ref[6]

    def rd(scr, f, j):
        return scr[f, jnp.clip(j + shift, 0, n - 1)]

    for dma in dmas:
        dma.wait()

    def xm(a):
        return jnp.where(ii == 0, 0.0, pltpu.roll(a, 1, 1))

    def xp(a):
        return jnp.where(ii == Xt - 1, 0.0, pltpu.roll(a, (-1) % X, 1))

    def ym(a):
        return jnp.where(jj == 0, 0.0, pltpu.roll(a, 1, 0))

    def yp(a):
        return jnp.where(jj == Yt - 1, 0.0, pltpu.roll(a, (-1) % Y, 0))

    def ixm(a):
        return jnp.where(ii == 0, 0, pltpu.roll(a, 1, 1))

    def iym(a):
        return jnp.where(jj == 0, 0, pltpu.roll(a, 1, 0))

    def ixp(a):
        return jnp.where(ii == Xt - 1, 0, pltpu.roll(a, (-1) % X, 1))

    def iyp(a):
        return jnp.where(jj == Yt - 1, 0, pltpu.roll(a, (-1) % Y, 0))

    # Slab boundary conditions (apply_boundaries): bc/inv are stored at
    # an 8-row y-extent; expand to full planes (pad rows are neutral:
    # bc 0 / inv 1 from the host-side padding).
    if has_ubc:
        Yb = bscr.shape[2]
        _zrest = jnp.zeros((Y - Yb, X), jnp.float32)
        _orest = jnp.ones((Y - Yb, X), jnp.float32)

        def bc_apply(c, j, v):
            """Slab update at LOGICAL slice j (same shift mapping as
            rd; the storage loop below passes pre-shifted indices)."""
            js = jnp.clip(j + shift, 0, n - 1)
            bcf = jnp.concatenate([bscr[c, js], _zrest], axis=0)
            invf = jnp.concatenate([iscr[c, js], _orest], axis=0)
            return v * invf + bcf

        # BC #1: pre-forces (simulate step 3) — mutate the scratch so
        # the whole chain below reads bc'ed velocity. Storage index =
        # logical index - shift.
        for j in range(n):
            for c in range(3):
                uscr[c, j] = bc_apply(c, j - shift, uscr[c, j])

    # Stage 0: u' = buoyancy + gravity applied to every slice the vc
    # chain reads (logical 1..n-1; slice 0 would need rho(-1)).
    def uprime(j):
        c_abs = ks * S - _FB_HALO + j
        interior = jnp.logical_and(c_abs >= 1, c_abs <= Z - 2)
        cur_in = inplane_int & interior
        u0 = rd(uscr, 0, j)
        u1 = rd(uscr, 1, j)
        u2 = rd(uscr, 2, j)
        fli = rd(fscr, 0, j).astype(jnp.int32)
        fl = (fli & 1) > 0
        em = (fli & 4) > 0
        rho = rd(rscr, 0, j)
        fli_xm = ixm(fli)
        fli_ym = iym(fli)
        flim1 = rd(fscr, 0, j - 1).astype(jnp.int32)
        zok = c_abs > 0
        fl_xm = (fli_xm & 1) > 0
        fl_ym = (fli_ym & 1) > 0
        fl_zm = jnp.logical_and(zok, (flim1 & 1) > 0)
        em_xm = (fli_xm & 4) > 0
        em_ym = (fli_ym & 4) > 0
        em_zm = jnp.logical_and(zok, (flim1 & 4) > 0)
        rho_zm = jnp.where(zok, rd(rscr, 0, j - 1), 0.0)

        # add_buoyancy (tfluids.cc:1190-1227): fluid-fluid faces.
        bmask = fl & cur_in
        u0 = jnp.where(bmask & fl_xm, u0 + 0.5 * sx * (rho + xm(rho)), u0)
        u1 = jnp.where(bmask & fl_ym, u1 + 0.5 * sy * (rho + ym(rho)), u1)
        u2 = jnp.where(bmask & fl_zm, u2 + 0.5 * sz * (rho + rho_zm), u2)

        # add_gravity (tfluids.cc:1280-1300): fluid/empty faces.
        cur = (fl | em) & cur_in
        u0 = jnp.where(cur & (fl_xm | (fl & em_xm)), u0 + gfx, u0)
        u1 = jnp.where(cur & (fl_ym | (fl & em_ym)), u1 + gfy, u1)
        u2 = jnp.where(cur & (fl_zm | (fl & em_zm)), u2 + gfz, u2)
        return u0, u1, u2

    ups = [None] + [uprime(j) for j in range(1, n)]

    # Stages 1-4: the _vc_kernel chain on u' (same offsets, shifted +1
    # because the outer halo is 4).
    def cent(j):
        c_abs = ks * S - _FB_HALO + j
        interior = jnp.logical_and(c_abs >= 1, c_abs <= Z - 2)
        u0, u1, u2 = ups[j]
        u2p = ups[j + 1][2]
        m = jnp.where(interior, 1.0, 0.0) * inplane_int.astype(
            jnp.float32)
        return (0.5 * (u0 + xp(u0)) * m, 0.5 * (u1 + yp(u1)) * m,
                0.5 * (u2 + u2p) * m)

    cents = [None] + [cent(j) for j in range(1, n - 1)]

    def curl(j):
        c_abs = ks * S - _FB_HALO + j
        interior = jnp.logical_and(c_abs >= 1, c_abs <= Z - 2)
        cxm1 = cents[j - 1]
        cxp1 = cents[j + 1]
        cx, cy, cz = cents[j]
        wx = 0.5 * ((yp(cz) - ym(cz)) - (cxp1[1] - cxm1[1]))
        wy = 0.5 * ((cxp1[0] - cxm1[0]) - (xp(cz) - xm(cz)))
        wz = 0.5 * ((xp(cy) - xm(cy)) - (yp(cx) - ym(cx)))
        m = jnp.where(interior, 1.0, 0.0) * inplane_int.astype(
            jnp.float32)
        wx, wy, wz = wx * m, wy * m, wz * m
        nsq = wx * wx + wy * wy + wz * wz
        nz = nsq > _VEC3_EPS
        wnorm = jnp.where(nz, jnp.sqrt(jnp.where(nz, nsq, 1.0)), 0.0) * m
        return wx, wy, wz, wnorm

    curls = [None, None] + [curl(j) for j in range(2, n - 2)]

    def force(j):
        c_abs = ks * S - _FB_HALO + j
        interior = jnp.logical_and(c_abs >= 1, c_abs <= Z - 2)
        nm1 = curls[j - 1][3]
        np1 = curls[j + 1][3]
        wx, wy, wz, wn = curls[j]
        gx = 0.5 * (xp(wn) - xm(wn))
        gy = 0.5 * (yp(wn) - ym(wn))
        gz = 0.5 * (np1 - nm1)
        gsq = gx * gx + gy * gy + gz * gz
        ok = gsq > _VEC3_EPS
        gn = jnp.where(ok, jnp.sqrt(jnp.where(ok, gsq, 1.0)), 0.0)
        inv = jnp.where(ok, 1.0 / jnp.where(ok, gn, 1.0), 0.0)
        gx, gy, gz = gx * inv, gy * inv, gz * inv
        m = jnp.where(interior, amp, 0.0) * inplane_int.astype(
            jnp.float32)
        return ((gy * wz - gz * wy) * m, (gz * wx - gx * wz) * m,
                (gx * wy - gy * wx) * m)

    forces = {j: force(j) for j in range(3, n - 3)}

    def applied(j):
        """AddForceField face-apply at slice j -> force-applied u'."""
        c_abs = ks * S - _FB_HALO + j
        fli = rd(fscr, 0, j).astype(jnp.int32)
        fl = (fli & 1) > 0
        em = (fli & 4) > 0
        interior = jnp.logical_and(c_abs >= 1, c_abs <= Z - 2)
        cur = (fl | em) & inplane_int & interior
        fx, fy, fz = forces[j]
        fzm1 = forces[j - 1][2]

        fli_xm = ixm(fli)
        fli_ym = iym(fli)
        flm_x = (fli_xm & 1) > 0
        emm_x = (fli_xm & 4) > 0
        flm_y = (fli_ym & 1) > 0
        emm_y = (fli_ym & 4) > 0
        flim1 = rd(fscr, 0, j - 1).astype(jnp.int32)
        zok = c_abs > 0
        flm_z = jnp.logical_and(zok, (flim1 & 1) > 0)
        emm_z = jnp.logical_and(zok, (flim1 & 4) > 0)

        mx = cur & (flm_x | (fl & emm_x))
        my = cur & (flm_y | (fl & emm_y))
        mz = cur & (flm_z | (fl & emm_z))
        u0, u1, u2 = ups[j]
        w0 = jnp.where(mx, u0 + 0.5 * (xm(fx) + fx), u0)
        w1 = jnp.where(my, u1 + 0.5 * (ym(fy) + fy), u1)
        w2 = jnp.where(mz, u2 + 0.5 * (fzm1 + fz), u2)
        return w0, w1, w2

    if not epi:
        for s in range(S):
            w0, w1, w2 = applied(s + _FB_HALO)
            out_ref[0, 0, s] = w0
            out_ref[0, 1, s] = w1
            out_ref[0, 2, s] = w2
        return

    # ---- fused projection-prologue epilogue ----
    # For each output slice (and one extra +z slice for the divergence):
    # BC #2 (post-forces apply_boundaries, simulate step 7) then
    # setWallBcs (ops.boundary.set_wall_bcs semantics incl. Stick).
    def wallbc(j):
        c_abs = ks * S - _FB_HALO + j
        u0, u1, u2 = applied(j)
        if has_ubc:
            u0 = bc_apply(0, j, u0)
            u1 = bc_apply(1, j, u1)
            u2 = bc_apply(2, j, u2)
        fli = rd(fscr, 0, j).astype(jnp.int32)
        flim1 = rd(fscr, 0, j - 1).astype(jnp.int32)
        flip1 = rd(fscr, 0, j + 1).astype(jnp.int32)
        fl = (fli & 1) > 0
        ob = (fli & 2) > 0
        cur = fl | ob
        fli_xm = ixm(fli)
        fli_ym = iym(fli)
        fli_xp = ixp(fli)
        fli_yp = iyp(fli)
        zok = c_abs > 0
        zhi = c_abs < Z - 1
        zero_x = cur & (((fli_xm & 2) > 0) | (ob & ((fli_xm & 1) > 0)))
        zero_y = cur & (((fli_ym & 2) > 0) | (ob & ((fli_ym & 1) > 0)))
        zero_z = cur & (jnp.logical_and(zok, (flim1 & 2) > 0) |
                        (ob & jnp.logical_and(zok, (flim1 & 1) > 0)))
        st_xpm = ((fli_xm & 128) > 0) | ((fli_xp & 128) > 0)
        st_ypm = ((fli_ym & 128) > 0) | ((fli_yp & 128) > 0)
        st_zpm = (jnp.logical_and(zok, (flim1 & 128) > 0) |
                  jnp.logical_and(zhi, (flip1 & 128) > 0))
        u0 = jnp.where(zero_x, 0.0, u0)
        u0 = jnp.where(fl & st_ypm, 0.0, u0)
        u0 = jnp.where(fl & st_zpm, 0.0, u0)
        u1 = jnp.where(zero_y, 0.0, u1)
        u1 = jnp.where(fl & st_xpm, 0.0, u1)
        u1 = jnp.where(fl & st_zpm, 0.0, u1)
        u2 = jnp.where(zero_z, 0.0, u2)
        u2 = jnp.where(fl & (st_xpm | st_ypm), 0.0, u2)
        return u0, u1, u2

    wbc = {j: wallbc(j) for j in range(_FB_HALO, _FB_HALO + S + 1)}
    for s in range(S):
        j = s + _FB_HALO
        c_abs = ks * S + s
        u0, u1, u2 = wbc[j]
        out_ref[0, 0, s] = u0
        out_ref[0, 1, s] = u1
        out_ref[0, 2, s] = u2
        # Manta-RHS divergence (ops.divergence.velocity_divergence):
        # div = (u - xp(u)) + (v - yp(v)) + (w - zp(w)), fluid interior.
        fli = rd(fscr, 0, j).astype(jnp.int32)
        interior = jnp.logical_and(c_abs >= 1, c_abs <= Z - 2)
        keep = ((fli & 1) > 0) & inplane_int & interior
        div = (u0 - xp(u0)) + (u1 - yp(u1)) + (u2 - wbc[j + 1][2])
        out_ref[0, 3, s] = jnp.where(keep, div, 0.0)


@jax.jit
def _fb_pallas_impl(u, flags, density, scal7):
    b, _, Z, Y, X = u.shape
    Xp, Yp = _round_up(X, 128), _round_up(Y, 8)
    if (Xp, Yp) != (X, Y):
        pads = ((0, 0),) * 3 + ((0, Yp - Y), (0, Xp - X))
        u = jnp.pad(u, pads)
        density = jnp.pad(density, pads)
        flags = jnp.pad(flags, pads, constant_values=2)
    S = min(slices_per_program(), Z)
    Zs = _round_up(Z, S)
    n = S + 2 * _FB_HALO
    Zsrc = max(Zs, n)
    if Zsrc != Z:
        zpad = ((0, 0), (0, 0), (0, Zsrc - Z), (0, 0), (0, 0))
        u = jnp.pad(u, zpad)
        density = jnp.pad(density, zpad)
        flags = jnp.pad(flags, zpad, constant_values=2)

    out = pl.pallas_call(
        functools.partial(_fb_kernel, S=S, Z=Z, Y=Yp, X=Xp, Yt=Y, Xt=X),
        grid=(b, Zs // S),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, 3, S, Yp, Xp),
                               lambda bb, k: (bb, 0, k, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 3, Zs, Yp, Xp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((3, n, Yp, Xp), jnp.float32),
            pltpu.VMEM((1, n, Yp, Xp), jnp.int32),
            pltpu.VMEM((1, n, Yp, Xp), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(scal7, u, flags.astype(jnp.int32), density)
    return out[..., :Z, :Y, :X]


@functools.partial(jax.jit, static_argnames=("has_ubc",))
def _pro_pallas_impl(u, flags, density, scal7, ubc, uinv, has_ubc):
    """Fused projection prologue: returns (b, 4, Z, Y, X) — channels
    0-2 the slab-BC'ed, force-applied, wall-BC'ed velocity; channel 3
    its Manta-RHS divergence. ubc/uinv: (b, 3, Z, YB<=8, X) slab masks
    or any arrays when has_ubc=False (ignored)."""
    b, _, Z, Y, X = u.shape
    Xp, Yp = _round_up(X, 128), _round_up(Y, 8)
    if (Xp, Yp) != (X, Y):
        pads = ((0, 0),) * 3 + ((0, Yp - Y), (0, Xp - X))
        u = jnp.pad(u, pads)
        density = jnp.pad(density, pads)
        flags = jnp.pad(flags, pads, constant_values=2)
    S = min(slices_per_program(), Z)
    Zs = _round_up(Z, S)
    n = S + 2 * _FB_HALO
    Zsrc = max(Zs, n)
    if Zsrc != Z:
        zpad = ((0, 0), (0, 0), (0, Zsrc - Z), (0, 0), (0, 0))
        u = jnp.pad(u, zpad)
        density = jnp.pad(density, zpad)
        flags = jnp.pad(flags, zpad, constant_values=2)

    inputs = [scal7, u, flags.astype(jnp.int32), density]
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + \
        [pl.BlockSpec(memory_space=pl.ANY)] * 3
    scratch = [
        pltpu.VMEM((3, n, Yp, Xp), jnp.float32),
        pltpu.VMEM((1, n, Yp, Xp), jnp.int32),
        pltpu.VMEM((1, n, Yp, Xp), jnp.float32),
    ]
    sems = [pltpu.SemaphoreType.DMA] * 3
    if has_ubc:
        YB = ubc.shape[3]
        assert YB <= 8, "slab BC masks wider than 8 rows can't fuse"
        # Neutral padding: bc 0 / inv 1 in the padded rows/slices.
        bpad = ((0, 0), (0, 0), (0, Zsrc - ubc.shape[2]), (0, 8 - YB),
                (0, Xp - X))
        ubc = jnp.pad(jnp.asarray(ubc, jnp.float32), bpad)
        uinv = jnp.pad(jnp.asarray(uinv, jnp.float32), bpad,
                       constant_values=1.0)
        inputs += [ubc, uinv]
        in_specs += [pl.BlockSpec(memory_space=pl.ANY)] * 2
        scratch += [pltpu.VMEM((3, n, 8, Xp), jnp.float32)] * 2
        sems += [pltpu.SemaphoreType.DMA] * 2

    out = pl.pallas_call(
        functools.partial(_fb_kernel, S=S, Z=Z, Y=Yp, X=Xp, Yt=Y, Xt=X,
                          epi=True, has_ubc=has_ubc),
        grid=(b, Zs // S),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 4, S, Yp, Xp),
                               lambda bb, k: (bb, 0, k, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 4, Zs, Yp, Xp), jnp.float32),
        scratch_shapes=scratch + sems,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(*inputs)
    return out[..., :Z, :Y, :X]


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def forces_block_pallas(u, flags, density, buoy_g, grav_g, amp, dt):
    """Fused 3-D forces block; matches ops.forces.forces_block_xla
    exactly (tested)."""
    return _fb_run(u, flags, density, buoy_g, grav_g, amp, dt)


def _fb_run(u, flags, density, buoy_g, grav_g, amp, dt):
    from fluidnet_tpu.core.grids import get_dx
    dx = get_dx(flags)
    buoy_g = jnp.broadcast_to(jnp.asarray(buoy_g, jnp.float32), (3,))
    grav_g = jnp.broadcast_to(jnp.asarray(grav_g, jnp.float32), (3,))
    scal7 = jnp.concatenate([
        -buoy_g * (dt / dx), grav_g * (dt / dx),
        jnp.asarray(amp, jnp.float32).reshape(1)])
    return _fb_pallas_impl(u, flags, density[:, 0:1], scal7)


def _fb_fwd(u, flags, density, buoy_g, grav_g, amp, dt):
    out = _fb_run(u, flags, density, buoy_g, grav_g, amp, dt)
    return out, (u, flags, density, buoy_g, grav_g, amp, dt)


def _fb_bwd(res, g):
    u, flags, density, buoy_g, grav_g, amp, dt = res
    from fluidnet_tpu.ops.forces import forces_block_xla
    _, vjp = jax.vjp(
        lambda uu, rr, bb, gg, aa: forces_block_xla(
            uu, flags, rr, bb, gg, aa, dt), u, density, buoy_g, grav_g,
        jnp.asarray(amp, jnp.float32))
    gu, grho, gb, gg_, ga = vjp(g)
    return gu, None, grho, gb, gg_, ga, None


forces_block_pallas.defvjp(_fb_fwd, _fb_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def vorticity_confinement_pallas(u, flags, amp):
    """Fused 3-D vorticity confinement; matches
    ops.forces.vorticity_confinement exactly (tested)."""
    return _vc_pallas_impl(u, flags, amp)


def _vc_fwd(u, flags, amp):
    return _vc_pallas_impl(u, flags, amp), (u, flags, amp)


def _vc_bwd(res, g):
    u, flags, amp = res
    from fluidnet_tpu.ops.forces import vorticity_confinement_xla
    _, vjp = jax.vjp(lambda uu, aa: vorticity_confinement_xla(
        uu, flags, aa), u, amp)
    gu, gamp = vjp(g)
    return gu, None, gamp


vorticity_confinement_pallas.defvjp(_vc_fwd, _vc_bwd)
