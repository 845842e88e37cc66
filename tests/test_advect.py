"""Advection tests: Manta-path golden parity vs the NumPy oracle, plus
property tests for the line-traced "Ours" variants (which the reference
itself only tests by CPU/GPU agreement, SURVEY.md §4.2)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fluidnet_tpu.ops.advect import advect_scalar, advect_vel
from fluidnet_tpu.core.grids import empty_domain

from tests import reference_impl as ref

TOL = 1e-4


def make_case(rng, is3d, p_obstacle=0.15, vel_scale=1.5):
    if is3d:
        B, Z, Y, X = 2, 6, 8, 7
        C = 3
    else:
        B, Z, Y, X = 2, 1, 10, 9
        C = 2
    flags = ref.random_flags(rng, (B, 1, Z, Y, X), p_obstacle)
    u = (rng.standard_normal((B, C, Z, Y, X)) * vel_scale).astype(np.float32)
    s = rng.random((B, 1, Z, Y, X)).astype(np.float32)
    return flags, u, s


@pytest.mark.parametrize("is3d", [False, True])
def test_euler_scalar_matches_oracle(is3d):
    rng = np.random.default_rng(10)
    flags, u, s = make_case(rng, is3d)
    dt = 0.3
    got = np.asarray(advect_scalar(dt, jnp.asarray(s), jnp.asarray(u),
                                   jnp.asarray(flags), method="euler"))
    want = ref.semi_lagrange_euler_scalar(dt, s, u, flags)
    np.testing.assert_allclose(got, want, atol=TOL)


@pytest.mark.parametrize("is3d", [False, True])
def test_euler_mac_matches_oracle(is3d):
    rng = np.random.default_rng(11)
    flags, u, _ = make_case(rng, is3d)
    dt = 0.25
    got = np.asarray(advect_vel(dt, jnp.asarray(u), jnp.asarray(flags),
                                method="euler"))
    want = ref.semi_lagrange_euler_mac(dt, u, flags)
    np.testing.assert_allclose(got, want, atol=TOL)


@pytest.mark.parametrize("is3d", [False, True])
def test_maccormack_scalar_matches_oracle(is3d):
    rng = np.random.default_rng(12)
    flags, u, s = make_case(rng, is3d)
    dt = 0.3
    got = np.asarray(advect_scalar(dt, jnp.asarray(s), jnp.asarray(u),
                                   jnp.asarray(flags), method="maccormack",
                                   maccormack_strength=0.8))
    want = ref.maccormack_scalar_manta(dt, s, u, flags, 0.8)
    np.testing.assert_allclose(got, want, atol=TOL)


@pytest.mark.parametrize("is3d", [False, True])
def test_maccormack_mac_matches_oracle(is3d):
    rng = np.random.default_rng(13)
    flags, u, _ = make_case(rng, is3d)
    dt = 0.25
    got = np.asarray(advect_vel(dt, jnp.asarray(u), jnp.asarray(flags),
                                method="maccormack", maccormack_strength=0.7))
    want = ref.maccormack_mac_manta(dt, u, flags, 0.7)
    np.testing.assert_allclose(got, want, atol=TOL)


@pytest.mark.parametrize("method", ["eulerOurs", "rk2Ours", "rk3Ours",
                                    "maccormackOurs"])
@pytest.mark.parametrize("is3d", [False, True])
def test_ours_zero_velocity_identity(method, is3d):
    """With U == 0 the backtrace stays at the cell center, so fluid cells keep
    their value; border zeroed (maccormack correction is also zero)."""
    rng = np.random.default_rng(14)
    flags, u, s = make_case(rng, is3d)
    u = np.zeros_like(u)
    got = np.asarray(advect_scalar(0.3, jnp.asarray(s), jnp.asarray(u),
                                   jnp.asarray(flags), method=method))
    interior = np.ones_like(s, bool)
    interior[..., :1, :] = interior[..., -1:, :] = False
    interior[..., :, :1] = interior[..., :, -1:] = False
    if is3d:
        interior[:, :, :1] = interior[:, :, -1:] = False
    fluid = (flags & 1) > 0
    m = interior & fluid
    np.testing.assert_allclose(got[m], s[m], atol=TOL)
    assert np.all(np.isfinite(got))


@pytest.mark.parametrize("method", ["eulerOurs", "maccormackOurs"])
def test_ours_matches_manta_in_open_fluid(method):
    """In an obstacle-free interior with small velocities, the line trace
    never hits anything and fluid-aware interp reduces to plain interp, so
    "Ours" Euler == Manta Euler away from the border."""
    rng = np.random.default_rng(15)
    B, Z, Y, X = 1, 1, 16, 16
    flags = np.asarray(empty_domain((B, 1, Z, Y, X), False))
    u = (rng.standard_normal((B, 2, Z, Y, X)) * 0.5).astype(np.float32)
    s = rng.random((B, 1, Z, Y, X)).astype(np.float32)
    dt = 0.5
    ours = np.asarray(advect_scalar(dt, jnp.asarray(s), jnp.asarray(u),
                                    jnp.asarray(flags), method="eulerOurs"
                                    if method == "eulerOurs" else method))
    euler = ref.semi_lagrange_euler_scalar(dt, s, u, flags)
    # Compare in the deep interior (>= 3 cells from the border) where
    # backtraces can't touch border/obstacle cells.
    sl = (slice(None), slice(None), slice(None), slice(3, -3), slice(3, -3))
    if method == "eulerOurs":
        np.testing.assert_allclose(ours[sl], euler[sl], atol=1e-4)
    else:
        # MacCormack is clamped to the local value range.
        lo = s.min() - 1e-4
        hi = s.max() + 1e-4
        assert ours[sl].min() >= lo and ours[sl].max() <= hi


@pytest.mark.parametrize("is3d", [False, True])
def test_ours_vel_bounded_with_obstacles(is3d):
    """maccormackOurs MAC advection with obstacles stays finite and the
    non-fluid cells keep src (after border zeroing)."""
    rng = np.random.default_rng(16)
    flags, u, _ = make_case(rng, is3d, p_obstacle=0.3, vel_scale=2.0)
    got = np.asarray(advect_vel(0.2, jnp.asarray(u), jnp.asarray(flags),
                                method="maccormackOurs"))
    assert np.all(np.isfinite(got))
    assert np.abs(got).max() <= np.abs(u).max() + 1e-4


def test_advect_scalar_grad_wrt_src():
    """Advection is linear in the advected field; grads must be exact."""
    from jax.test_util import check_grads
    rng = np.random.default_rng(17)
    flags, u, s = make_case(rng, False)
    u_j = jnp.asarray(u)
    f_j = jnp.asarray(flags)

    def f(s_):
        return advect_scalar(0.3, s_, u_j, f_j, method="euler")

    check_grads(f, (jnp.asarray(s),), order=1, modes=["rev"], atol=1e-2,
                rtol=1e-2)
