"""Windowed (Pallas) advection fast path vs the exact gather path.

Runs on CPU in pallas interpret mode (tiny grids). Where the fast path is
exact by construction (plain trilinear sampling, in-window displacements)
we require tight equality with the gather path; the 'Ours' deviations
(free-space clamp, renormalized fluid interp) get property tests.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fluidnet_tpu.core.grids import empty_domain
from fluidnet_tpu.ops.advect import advect_scalar, advect_vel
from fluidnet_tpu.ops.advect_fast import chebyshev_free_space

from tests import reference_impl as ref

TOL = 1e-4


def small_case(rng, is3d, vel_scale=0.9, p_obstacle=0.0):
    if is3d:
        B, Z, Y, X = 1, 6, 8, 16
        C = 3
    else:
        B, Z, Y, X = 1, 1, 8, 16
        C = 2
    flags = ref.random_flags(rng, (B, 1, Z, Y, X), p_obstacle)
    u = (rng.standard_normal((B, C, Z, Y, X)) * vel_scale).astype(np.float32)
    s = rng.random((B, 1, Z, Y, X)).astype(np.float32)
    return jnp.asarray(flags), jnp.asarray(u), jnp.asarray(s)


@pytest.mark.parametrize("is3d", [False, True])
@pytest.mark.parametrize("method", ["euler", "maccormack"])
def test_manta_fast_matches_exact(is3d, method):
    """Manta-path semantics are preserved exactly for in-window
    displacements (the fast trilinear kernel implements BUILD_INDEX
    bit-for-bit)."""
    rng = np.random.default_rng(90)
    flags, u, s = small_case(rng, is3d, vel_scale=0.8, p_obstacle=0.15)
    dt = 0.5
    exact = advect_scalar(dt, s, u, flags, method=method, window=None)
    fast = advect_scalar(dt, s, u, flags, method=method, window=2)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(exact), atol=TOL)


@pytest.mark.parametrize("is3d", [False, True])
@pytest.mark.parametrize("method", ["euler", "maccormack"])
def test_manta_fast_vel_matches_exact(is3d, method):
    rng = np.random.default_rng(91)
    flags, u, _ = small_case(rng, is3d, vel_scale=0.8, p_obstacle=0.15)
    dt = 0.5
    exact = advect_vel(dt, u, flags, method=method, window=None)
    fast = advect_vel(dt, u, flags, method=method, window=2)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(exact), atol=TOL)


@pytest.mark.parametrize("is3d", [False, True])
def test_ours_fast_matches_exact_in_open_fluid(is3d):
    """With no obstacles in reach, the free-space clamp is inactive and all
    corners are fluid, so eulerOurs fast == eulerOurs exact."""
    rng = np.random.default_rng(92)
    flags, u, s = small_case(rng, is3d, vel_scale=0.5, p_obstacle=0.0)
    dt = 0.5
    exact = np.asarray(advect_scalar(dt, s, u, flags, method="eulerOurs",
                                     window=None))
    fast = np.asarray(advect_scalar(dt, s, u, flags, method="eulerOurs",
                                    window=2))
    # Compare deep interior (the free-space clamp engages near the border
    # walls; the exact trace stops there too but lands slightly elsewhere).
    sl = (slice(None), slice(None), slice(None), slice(3, -3), slice(3, -3))
    if is3d:
        sl = (slice(None), slice(None), slice(2, -2), slice(3, -3),
              slice(3, -3))
    np.testing.assert_allclose(fast[sl], exact[sl], atol=1e-3)


@pytest.mark.parametrize("method", ["eulerOurs", "maccormackOurs"])
@pytest.mark.parametrize("is3d", [False, True])
def test_ours_fast_properties_with_obstacles(method, is3d):
    rng = np.random.default_rng(93)
    flags, u, s = small_case(rng, is3d, vel_scale=1.5, p_obstacle=0.25)
    out = np.asarray(advect_scalar(0.4, s, u, flags, method=method,
                                   window=2))
    assert np.isfinite(out).all()
    fl = (np.asarray(flags) & 1) > 0
    interior = np.ones_like(fl)
    interior[..., :1, :] = interior[..., -1:, :] = False
    interior[..., :, :1] = interior[..., :, -1:] = False
    if is3d:
        interior[:, :, :1] = interior[:, :, -1:] = False
    if method == "eulerOurs":
        # Non-fluid interior cells keep their value (the MacCormack clamp
        # pass touches non-fluid cells too, in the reference as well:
        # tfluids.cc:563-583 clamps every interior cell).
        m = interior & ~fl
        np.testing.assert_allclose(out[m], np.asarray(s)[m], atol=TOL)
    # Interior values bounded by the source range (border is zeroed).
    assert out[interior].min() >= float(s.min()) - 1e-3
    assert out[interior].max() <= float(s.max()) + 1e-3


def test_ours_fast_vel_with_obstacles():
    rng = np.random.default_rng(94)
    flags, u, _ = small_case(rng, True, vel_scale=1.5, p_obstacle=0.25)
    out = np.asarray(advect_vel(0.4, u, flags, method="maccormackOurs",
                                window=2))
    assert np.isfinite(out).all()
    assert np.abs(out).max() <= np.abs(np.asarray(u)).max() + 1e-3


@pytest.mark.parametrize("p_obstacle", [0.15, 0.4])
def test_warp_fluid_drift_vs_cascade(p_obstacle):
    """Quantifies the renormalized-vs-cascade fluid-interp deviation on
    obstacle-heavy scenes (a documented fast-path deviation): identical
    where the non-fluid corners form whole faces/edges, bounded by the
    local value range in general, and small on average."""
    from fluidnet_tpu.ops.interp import interpol_with_fluid
    from fluidnet_tpu.ops.pallas.warp import clamp_displacement, warp_fluid
    rng = np.random.default_rng(95)
    flags, u, s = small_case(rng, True, vel_scale=0.0,
                             p_obstacle=p_obstacle)
    B, _, Z, Y, X = flags.shape
    W = 2
    dx = jnp.asarray(rng.uniform(-1.8, 1.8, (B, Z, Y, X)), jnp.float32)
    dy = jnp.asarray(rng.uniform(-1.8, 1.8, (B, Z, Y, X)), jnp.float32)
    dz = jnp.asarray(rng.uniform(-1.8, 1.8, (B, Z, Y, X)), jnp.float32)
    dx, dy, dz = clamp_displacement(dx, dy, dz, W)
    ii = jnp.asarray(np.arange(X, dtype=np.float32)) + 0.5
    px = jnp.clip(ii[None, None, None] + dx, 0.6, X - 0.6)
    jj = jnp.asarray(np.arange(Y, dtype=np.float32)) + 0.5
    py = jnp.clip(jj[None, None, :, None] + dy, 0.6, Y - 0.6)
    kk = jnp.asarray(np.arange(Z, dtype=np.float32)) + 0.5
    pz = jnp.clip(kk[None, :, None, None] + dz, 0.6, Z - 0.6)

    fast = np.asarray(warp_fluid(s, flags, px, py, pz, window=W))[:, 0]
    exact = np.asarray(interpol_with_fluid(s, flags, px, py, pz, True))[:, 0]
    diff = np.abs(fast - exact)
    # Both interpolate within the corner-value range, so the drift is
    # bounded by the source range; on random scenes the mean drift stays
    # well under the field scale.
    rng_span = float(np.asarray(s).max() - np.asarray(s).min())
    assert diff.max() <= rng_span + 1e-5
    assert diff.mean() < 0.05 * rng_span, (diff.mean(), rng_span)
    # Where every corner is fluid, the two are identical (weights sum 1).
    fl_all = np.asarray((np.asarray(flags) & 1) > 0)[0, 0]
    interior_fluid = fl_all.copy()
    for ax in range(3):
        interior_fluid &= np.roll(fl_all, 1, ax) & np.roll(fl_all, -1, ax)
    # Positions landing fully inside fluid regions: sample a conservative
    # subset (cells whose whole +-2 window is fluid).
    safe = interior_fluid.copy()
    for ax in range(3):
        for o in (1, 2, -1, -2):
            safe &= np.roll(interior_fluid, o, ax)
    if safe.any():
        np.testing.assert_allclose(fast[0][safe], exact[0][safe],
                                   atol=1e-4)


def test_chebyshev_free_space():
    flags = np.asarray(empty_domain((1, 1, 1, 8, 16), False)).copy()
    flags[0, 0, 0, 4, 8] = 2
    d = np.asarray(chebyshev_free_space(jnp.asarray(flags), 4))[0, 0, 0]
    assert d[4, 8] == 0           # the obstacle itself
    assert d[4, 9] == 1           # adjacent
    assert d[4, 11] == 3
    assert d[4, 12] == 3          # border wall at x == 15 caps it
    assert d[1, 1] == 1           # border wall adjacency


def test_simulate_uses_fast_path():
    """End-to-end: a plume sim step with the windowed path stays sane."""
    from fluidnet_tpu.core.config import ModelConfig
    from fluidnet_tpu.core.grids import FluidState
    from fluidnet_tpu.sim.simulate import create_plume_bcs, simulate
    mconf = ModelConfig(is_3d=False, sim_method="jacobi", max_iter=100,
                        buoyancy_scale=1.0,
                        advection_method="maccormackOurs",
                        advection_window=2)
    B, Z, Y, X = 1, 1, 16, 16
    flags = empty_domain((B, 1, Z, Y, X), False)
    state = FluidState(
        u=jnp.zeros((B, 2, Z, Y, X)), p=jnp.zeros((B, 1, Z, Y, X)),
        flags=flags, density=jnp.zeros((B, 1, Z, Y, X)))
    bcs = create_plume_bcs(state, [1.0], u_scale=0.5, rad=0.2)
    step = jax.jit(lambda s, b: simulate(s, mconf, None, None, b))
    for _ in range(3):
        state = step(state, bcs)
    assert np.isfinite(np.asarray(state.u)).all()
    assert float(state.density.sum()) > 0


@pytest.mark.parametrize("is3d", [False, True])
@pytest.mark.parametrize("window", [1, 2])
@pytest.mark.parametrize("nearest", [False, True])
def test_warp_transpose_pallas_matches_xla(is3d, window, nearest):
    """The Pallas adjoint kernel equals the XLA shifted-add oracle."""
    from fluidnet_tpu.ops.pallas import warp as W

    rng = np.random.default_rng(7 + window + 10 * is3d)
    b, G, F = 2, 2, 2
    Z, Y, X = (5, 8, 16) if is3d else (1, 8, 16)
    ZYX = (Z, Y, X)
    g = jnp.asarray(rng.standard_normal((b, G, F, Z, Y, X)),
                    jnp.float32)
    # cell-center base positions + in-window displacement
    ix = np.arange(X) + 0.5
    iy = np.arange(Y) + 0.5
    iz = np.arange(Z) + 0.5
    base = np.broadcast_to(
        ix[None, None, None, None, :], (b, G, Z, Y, X))
    px = base + rng.uniform(-window + 1e-3, window - 1e-3,
                            (b, G, Z, Y, X))
    py = (np.broadcast_to(iy[None, None, None, :, None],
                          (b, G, Z, Y, X))
          + rng.uniform(-window + 1e-3, window - 1e-3, (b, G, Z, Y, X)))
    pz = (np.broadcast_to(iz[None, None, :, None, None],
                          (b, G, Z, Y, X))
          + (rng.uniform(-window + 1e-3, window - 1e-3,
                         (b, G, Z, Y, X)) if is3d else 0.0))
    px, py, pz = (jnp.asarray(p, jnp.float32) for p in (px, py, pz))
    if nearest:
        # gather_cells-style integer-cell positions
        px = jnp.floor(px) + 0.5
        py = jnp.floor(py) + 0.5
        pz = jnp.floor(pz) + 0.5

    want = W._warp_transpose_xla(g, px, py, pz, window, nearest, F, ZYX)
    got = W._warp_transpose_pallas(g, px, py, pz, window, nearest)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_warp_vjp_adjoint_identity():
    """<warp(v), g> == <v, warp^T(g)> through the public custom-vjp path."""
    from fluidnet_tpu.ops.pallas import warp as W

    rng = np.random.default_rng(11)
    b, G, F, Z, Y, X = 1, 3, 1, 4, 8, 16
    v = jnp.asarray(rng.standard_normal((b, G, F, Z, Y, X)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((b, G, F, Z, Y, X)), jnp.float32)
    base = np.stack(np.meshgrid(np.arange(Z), np.arange(Y), np.arange(X),
                                indexing="ij"), 0) + 0.5
    disp = rng.uniform(-0.9, 0.9, (3, b, G, Z, Y, X))
    pz = jnp.asarray(base[0] + disp[0], jnp.float32)
    py = jnp.asarray(base[1] + disp[1], jnp.float32)
    px = jnp.asarray(base[2] + disp[2], jnp.float32)

    fwd = lambda vv: W.warp_group(vv, px, py, pz, window=1)
    out, vjp = jax.vjp(fwd, v)
    (grad_v,) = vjp(g)
    lhs = float(jnp.vdot(out, g))
    rhs = float(jnp.vdot(v, grad_v))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-4)


@pytest.mark.parametrize("method", ["maccormackOurs", "eulerOurs", "euler",
                                    "rk2Ours"])
@pytest.mark.parametrize("sof", [False, True])
def test_combined_sweep_matches_separate(method, sof):
    """advect_vel_scalar_fast (one fused kernel per sweep) equals the
    separate advect_scalar_fast + advect_vel_fast paths."""
    from fluidnet_tpu.ops.advect_fast import (advect_scalar_fast,
                                              advect_vel_fast,
                                              advect_vel_scalar_fast)

    rng = np.random.default_rng(5)
    flags, u, s = small_case(rng, True, vel_scale=0.9, p_obstacle=0.1)
    dt, strength, W = 0.3, 0.6, 1

    s_sep = advect_scalar_fast(dt, s, u, flags, method, sof, strength, W)
    u_sep = advect_vel_fast(dt, u, flags, method, strength, W)
    s_cmb, u_cmb = advect_vel_scalar_fast(dt, s, u, flags, method, sof,
                                          strength, W)
    np.testing.assert_allclose(np.asarray(u_cmb), np.asarray(u_sep),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s_cmb), np.asarray(s_sep),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("method,sof", [
    ("maccormackOurs", False), ("maccormackOurs", True),
    ("eulerOurs", False), ("euler", True)])
def test_fused_epilogue_matches_unfused(method, sof):
    """FLUIDNET_FUSED_EPILOGUE=1 (in-kernel fluid/border masks, renorm
    combine, MacCormack correction) must match the unfused composition
    exactly, and its custom-VJP gradients (computed via the unfused
    path) must match the unfused gradients."""
    from fluidnet_tpu.ops.advect_fast import advect_vel_scalar_fast

    rng = np.random.default_rng(23)
    flags, u, s = small_case(rng, True, vel_scale=0.9, p_obstacle=0.15)
    dt, strength, W = 0.3, 0.6, 1

    def run(fused):
        return advect_vel_scalar_fast(dt, s, u, flags, method, sof,
                                      strength, W, fused_epilogue=fused)

    s0, u0 = run(False)
    s1, u1 = run(True)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s0),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(u1), np.asarray(u0),
                               rtol=1e-5, atol=1e-6)

    def loss(fused):
        def f(s_, u_):
            sn, un = advect_vel_scalar_fast(
                dt, s_, u_, flags, method, sof, strength, W,
                fused_epilogue=fused)
            return jnp.sum(sn * sn) + jnp.sum(un * jnp.cos(un))
        return jax.grad(f, argnums=(0, 1))(jnp.asarray(s),
                                           jnp.asarray(u))

    gs0, gu0 = loss(False)
    gs1, gu1 = loss(True)
    np.testing.assert_allclose(np.asarray(gs1), np.asarray(gs0),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gu1), np.asarray(gu0),
                               rtol=1e-5, atol=1e-6)


def test_bf16_sweep_drift():
    """Production bf16 tap-arithmetic path (FLUIDNET_SWEEP_BF16): the
    per-step deviation from the f32 sweep must stay within the bf16
    rounding budget (clamp bounds keep values in-range; weights sum to 1
    so the weighted-average error is ~2^-8 relative), and a multi-step
    rollout must stay bounded and close to the f32 trajectory."""
    from fluidnet_tpu.ops.advect_fast import advect_vel_scalar_fast

    rng = np.random.default_rng(17)
    flags, u, s = small_case(rng, True, vel_scale=0.9, p_obstacle=0.1)
    dt, strength, W = 0.3, 0.6, 1

    def run(bf16, n_steps=4):
        uu, ss = u, s
        for _ in range(n_steps):
            import os
            os.environ["FLUIDNET_SWEEP_BF16"] = "1" if bf16 else "0"
            try:
                ss, uu = advect_vel_scalar_fast(
                    dt, ss, uu, flags, "maccormackOurs", False, strength,
                    W)
            finally:
                os.environ["FLUIDNET_SWEEP_BF16"] = "0"
        return np.asarray(ss), np.asarray(uu)

    s32, u32 = run(False)
    s16, u16 = run(True)
    assert np.isfinite(u16).all() and np.isfinite(s16).all()
    # 4-step accumulated drift budget: ~4x the single-step bf16 rounding.
    scale_u = max(np.abs(u32).max(), 1e-6)
    scale_s = max(np.abs(s32).max(), 1e-6)
    assert np.abs(u16 - u32).max() / scale_u < 0.05
    assert np.abs(s16 - s32).max() / scale_s < 0.05


@pytest.mark.parametrize("window", [1, 2])
def test_warp_transpose_pallas_zclamped(window):
    """Padless (clamped-DMA) transpose path: Z a multiple of the slice
    block and large enough that no z-padding is used."""
    from fluidnet_tpu.ops.pallas import warp as W

    rng = np.random.default_rng(23 + window)
    b, G, F, Z, Y, X = 1, 2, 2, 16, 8, 16
    g = jnp.asarray(rng.standard_normal((b, G, F, Z, Y, X)), jnp.float32)
    base = np.stack(np.meshgrid(np.arange(Z), np.arange(Y), np.arange(X),
                                indexing="ij"), 0) + 0.5
    disp = rng.uniform(-window + 1e-3, window - 1e-3, (3, b, G, Z, Y, X))
    pz = jnp.asarray(base[0] + disp[0], jnp.float32)
    py = jnp.asarray(base[1] + disp[1], jnp.float32)
    px = jnp.asarray(base[2] + disp[2], jnp.float32)
    want = W._warp_transpose_xla(g, px, py, pz, window, False, F,
                                 (Z, Y, X))
    got = W._warp_transpose_pallas(g, px, py, pz, window, False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("p_obstacle", [0.0, 0.15])
def test_vorticity_confinement_pallas_matches_xla(p_obstacle):
    """Fused vorticity-confinement kernel == the 4-stage XLA chain."""
    from fluidnet_tpu.ops.forces import (vorticity_confinement,
                                         vorticity_confinement_xla)

    rng = np.random.default_rng(31)
    flags, u, _ = small_case(rng, True, vel_scale=1.0,
                             p_obstacle=p_obstacle)
    want = vorticity_confinement_xla(u, flags, 0.7)
    got = vorticity_confinement(u, flags, 0.7)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)

    # Gradient path (full-rollout training) stays finite and matches.
    g1 = jax.grad(lambda uu: jnp.sum(
        vorticity_confinement(uu, flags, 0.7) ** 2))(u)
    g2 = jax.grad(lambda uu: jnp.sum(
        vorticity_confinement_xla(uu, flags, 0.7) ** 2))(u)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("p_obstacle", [0.0, 0.15])
@pytest.mark.parametrize("scales", [(1.3, 0.0, 0.7), (0.9, 0.4, 0.0),
                                    (0.0, 0.0, 0.9)])
def test_forces_block_pallas_matches_xla(p_obstacle, scales):
    """Fused buoyancy+gravity+vorticity kernel == the XLA composition
    (simulate.lua:216-239 ordering), incl. zero-scale no-op cases."""
    from fluidnet_tpu.ops.forces import forces_block, forces_block_xla

    rng = np.random.default_rng(47)
    flags, u, s = small_case(rng, True, vel_scale=1.0,
                             p_obstacle=p_obstacle)
    bs, gs, amp = scales
    buoy_g = jnp.asarray([0.1, -0.8, 0.05], jnp.float32) * bs
    grav_g = jnp.asarray([0.0, -1.0, 0.0], jnp.float32) * gs
    dt = 0.3
    want = forces_block_xla(u, flags, s, buoy_g, grav_g, amp, dt)
    got = forces_block(u, flags, s, buoy_g, grav_g, amp, dt)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)

    # Gradient path (full-rollout training): u AND density cotangents.
    def loss(fb):
        def f(uu, ss):
            return jnp.sum(fb(uu, flags, ss, buoy_g, grav_g, amp, dt) ** 2)
        return f
    g1 = jax.grad(loss(forces_block), argnums=(0, 1))(u, s)
    g2 = jax.grad(loss(forces_block_xla), argnums=(0, 1))(u, s)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_per_sample_force_scales_match_per_scene():
    """Batched (B,) buoyancy/vorticity scales (batched scene generation,
    data/generate.py) == stacking B independent scalar-scale calls."""
    from fluidnet_tpu.core.grids import empty_domain
    from fluidnet_tpu.ops.forces import forces_block_xla

    rng = np.random.default_rng(31)
    B, Z, Y, X = 3, 6, 8, 16
    flags = empty_domain((B, 1, Z, Y, X), True)
    u = jnp.asarray(rng.standard_normal((B, 3, Z, Y, X)), jnp.float32)
    rho = jnp.asarray(rng.random((B, 1, Z, Y, X)), jnp.float32)
    g = jnp.asarray([0.0, -1.0, 0.0], jnp.float32)
    bs = jnp.asarray([1.3, 0.0, 0.6], jnp.float32)
    amp = jnp.asarray([0.0, 0.8, 0.4], jnp.float32)
    dt = 0.3

    got = forces_block_xla(u, flags, rho, g[None, :] * bs[:, None],
                           jnp.zeros((3,), jnp.float32), amp, dt)
    for i in range(B):
        want_i = forces_block_xla(
            u[i:i + 1], flags[i:i + 1], rho[i:i + 1], g * bs[i],
            jnp.zeros((3,), jnp.float32), float(amp[i]), dt)
        np.testing.assert_allclose(np.asarray(got[i:i + 1]),
                                   np.asarray(want_i),
                                   rtol=1e-5, atol=1e-6)

    # End-to-end: simulate() with (B,) overrides == per-scene simulate.
    from fluidnet_tpu.core.config import ModelConfig
    from fluidnet_tpu.core.grids import FluidState
    from fluidnet_tpu.sim.simulate import simulate

    mconf = ModelConfig(is_3d=True, dt=0.1, sim_method="jacobi",
                        max_iter=4, advection_method="maccormackOurs",
                        advection_window=1, adaptive_window=False)
    sim = jax.jit(lambda s, b, v: simulate(s, mconf, buoyancy_scale=b,
                                           vorticity_amp=v))
    st = FluidState(u=u, p=jnp.zeros((B, 1, Z, Y, X), jnp.float32),
                    flags=flags, density=rho)
    out = sim(st, bs, amp)
    sim1 = jax.jit(lambda s, b, v: simulate(s, mconf, buoyancy_scale=b,
                                            vorticity_amp=v))
    for i in range(B):
        st_i = FluidState(u=u[i:i + 1], p=st.p[i:i + 1],
                          flags=flags[i:i + 1], density=rho[i:i + 1])
        out_i = sim1(st_i, bs[i], amp[i])
        np.testing.assert_allclose(np.asarray(out.u[i:i + 1]),
                                   np.asarray(out_i.u),
                                   rtol=1e-4, atol=1e-5)
