"""Pressure solver tests.

Mirrors the reference targets (SURVEY.md §6): post-solve ||div(U)||_inf
< 1e-4 for PCG and < 1e-5 for Jacobi (run to convergence), plus sweep-level
golden parity of the Jacobi iteration against the NumPy oracle and
connected-component mean normalization behavior.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from fluidnet_tpu.core.grids import empty_domain
from fluidnet_tpu.ops.boundary import set_wall_bcs
from fluidnet_tpu.ops.divergence import velocity_divergence
from fluidnet_tpu.ops.velocity_update import velocity_update
from fluidnet_tpu.solvers.cg import solve_pcg
from fluidnet_tpu.solvers.components import (connected_components,
                                             normalize_pressure_mean)
from fluidnet_tpu.solvers.jacobi import solve_jacobi

from tests import reference_impl as ref


def _setup(rng, is3d, with_obstacles=True):
    if is3d:
        B, Z, Y, X = 1, 12, 12, 12
        C = 3
    else:
        B, Z, Y, X = 2, 1, 24, 24
        C = 2
    flags = np.asarray(empty_domain((B, 1, Z, Y, X), is3d)).copy()
    if with_obstacles:
        # Drop a small obstacle block inside.
        flags[..., Y // 3:Y // 3 + 3, X // 2:X // 2 + 2] = ref.OBSTACLE
    u = rng.standard_normal((B, C, Z, Y, X)).astype(np.float32)
    u = np.asarray(set_wall_bcs(jnp.asarray(u), jnp.asarray(flags)))
    return jnp.asarray(flags), jnp.asarray(u)


@pytest.mark.parametrize("is3d", [False, True])
def test_jacobi_sweep_matches_oracle(is3d):
    rng = np.random.default_rng(20)
    flags, u = _setup(rng, is3d)
    div = velocity_divergence(u, flags)
    p1, _ = solve_jacobi(flags, div, p_tol=0.0, max_iter=1)
    want1 = ref.jacobi_iteration(np.zeros_like(np.asarray(div)),
                                 np.asarray(flags), np.asarray(div))
    np.testing.assert_allclose(np.asarray(p1), want1, atol=1e-5)
    p3, _ = solve_jacobi(flags, div, p_tol=0.0, max_iter=3)
    want3 = want1
    for _ in range(2):
        want3 = ref.jacobi_iteration(want3, np.asarray(flags),
                                     np.asarray(div))
    np.testing.assert_allclose(np.asarray(p3), want3, atol=1e-5)


def test_jacobi_converges_divergence_free():
    rng = np.random.default_rng(21)
    flags, u = _setup(rng, False)
    div = velocity_divergence(u, flags)
    p, res = solve_jacobi(flags, div, p_tol=1e-7, max_iter=20000)
    u2 = velocity_update(u, flags, p)
    div2 = velocity_divergence(u2, flags)
    assert float(jnp.abs(div2).max()) < 1e-5


@pytest.mark.parametrize("is3d", [False, True])
def test_pcg_divergence_free(is3d):
    rng = np.random.default_rng(22)
    flags, u = _setup(rng, is3d)
    div = velocity_divergence(u, flags)
    p, res = solve_pcg(flags, div, tol=1e-6, max_iter=600)
    u2 = velocity_update(u, flags, p)
    div2 = velocity_divergence(u2, flags)
    assert float(jnp.abs(div2).max()) < 1e-4
    assert np.isfinite(float(res))


def test_pcg_matches_jacobi_solution():
    """Both solve the same SPD system on a single component -> same p up to
    the DC offset (pressure equality modulo mean, like the reference's
    test which skips absolute pressure comparison, SURVEY.md §4.1)."""
    rng = np.random.default_rng(23)
    flags, u = _setup(rng, False, with_obstacles=False)
    div = velocity_divergence(u, flags)
    p_cg, _ = solve_pcg(flags, div, tol=1e-8, max_iter=2000)
    p_j, _ = solve_jacobi(flags, div, p_tol=1e-8, max_iter=50000)
    p_cg = normalize_pressure_mean(p_cg, flags)
    p_j = normalize_pressure_mean(p_j, flags)
    fl = (np.asarray(flags) & 1) > 0
    np.testing.assert_allclose(np.asarray(p_cg)[fl], np.asarray(p_j)[fl],
                               atol=2e-4)


def test_connected_components_two_regions():
    B, Z, Y, X = 1, 1, 10, 10
    flags = np.asarray(empty_domain((B, 1, Z, Y, X), False)).copy()
    flags[..., :, 5] = ref.OBSTACLE  # wall splits the domain in two
    labels = np.asarray(connected_components(jnp.asarray(flags)))
    fl = (flags & 1) > 0
    left = labels[..., :, :5][fl[..., :, :5]]
    right = labels[..., :, 6:][fl[..., :, 6:]]
    assert len(np.unique(left)) == 1
    assert len(np.unique(right)) == 1
    assert np.unique(left)[0] != np.unique(right)[0]


def test_normalize_pressure_mean_per_component():
    rng = np.random.default_rng(24)
    B, Z, Y, X = 1, 1, 10, 10
    flags = np.asarray(empty_domain((B, 1, Z, Y, X), False)).copy()
    flags[..., :, 5] = ref.OBSTACLE
    p = rng.standard_normal((B, 1, Z, Y, X)).astype(np.float32)
    p2 = np.asarray(normalize_pressure_mean(jnp.asarray(p),
                                            jnp.asarray(flags)))
    fl = (flags & 1) > 0
    left_m = p2[..., :, :5][fl[..., :, :5]].mean()
    right_m = p2[..., :, 6:][fl[..., :, 6:]].mean()
    assert abs(left_m) < 1e-6 and abs(right_m) < 1e-6
    # Non-fluid cells untouched.
    np.testing.assert_array_equal(p2[~fl], p[~fl])


@pytest.mark.parametrize("is3d", [False, True])
def test_pallas_jacobi_matches_xla(is3d):
    """The fused VMEM Jacobi kernel is sweep-for-sweep identical to the
    while_loop XLA formulation."""
    from fluidnet_tpu.solvers.pallas_jacobi import jacobi_pallas
    rng = np.random.default_rng(25)
    if is3d:
        B, Z, Y, X = 1, 12, 16, 128
    else:
        B, Z, Y, X = 2, 1, 16, 128
    flags = np.asarray(empty_domain((B, 1, Z, Y, X), is3d)).copy()
    flags[..., Y // 2, X // 3] = ref.OBSTACLE
    flags = jnp.asarray(flags)
    C = 3 if is3d else 2
    u = set_wall_bcs(jnp.asarray(
        rng.standard_normal((B, C, Z, Y, X)).astype(np.float32)), flags)
    div = velocity_divergence(u, flags)
    p_ref, _ = solve_jacobi(flags, div, p_tol=0.0, max_iter=25,
                            allow_pallas=False)
    p_pal = jacobi_pallas(flags, div, 25)
    np.testing.assert_allclose(np.asarray(p_pal), np.asarray(p_ref),
                               atol=1e-6)
