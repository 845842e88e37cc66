"""Stored golden fixtures: fast regression pinning for every core op.

The reference pins op outputs against binary mantaflow frames
(test_tfluids.lua); here the fixtures (tests/fixtures/golden_ops.npz) were
produced by the oracle-validated implementations (tests/make_fixtures.py)
— any future change to the vectorized ops or kernels that shifts results
past float tolerance fails here immediately, without re-running the slow
loop-based oracle.
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "golden_ops.npz")

_data = np.load(FIX)


def _inputs(tag):
    return (jnp.asarray(_data[f"{tag}/flags"]),
            jnp.asarray(_data[f"{tag}/u"]),
            jnp.asarray(_data[f"{tag}/s"]))


@pytest.mark.parametrize("tag", ["2d", "3d"])
def test_core_ops_fixture(tag):
    from fluidnet_tpu.ops.boundary import set_wall_bcs
    from fluidnet_tpu.ops.divergence import velocity_divergence
    from fluidnet_tpu.ops.forces import (add_buoyancy, add_gravity,
                                         vorticity_confinement)
    from fluidnet_tpu.ops.sdf import rectangular_blur, signed_distance_field
    from fluidnet_tpu.ops.velocity_update import velocity_update
    flags, u, s = _inputs(tag)
    g = np.array([0.4, -1.0, 0.3], np.float32)
    is3d = tag == "3d"
    checks = {
        "set_wall_bcs": set_wall_bcs(u, flags),
        "divergence": velocity_divergence(u, flags),
        "velocity_update": velocity_update(u, flags, s),
        "buoyancy": add_buoyancy(u, flags, s, g, 0.13),
        "gravity": add_gravity(u, flags, g, 0.13),
        "vort": vorticity_confinement(u, flags, 0.6),
        "sdf": signed_distance_field(flags, 3),
        "blur": rectangular_blur(s, 2, is3d),
    }
    for name, got in checks.items():
        np.testing.assert_allclose(
            np.asarray(got), _data[f"{tag}/{name}"], atol=2e-5,
            err_msg=f"{tag}/{name}")


@pytest.mark.parametrize("tag", ["2d", "3d"])
@pytest.mark.parametrize("method", ["euler", "maccormack", "eulerOurs",
                                    "maccormackOurs"])
def test_advect_fixture(tag, method):
    from fluidnet_tpu.ops.advect import advect_scalar, advect_vel
    flags, u, s = _inputs(tag)
    got_s = advect_scalar(0.3, s, u, flags, method=method, window=None)
    np.testing.assert_allclose(np.asarray(got_s),
                               _data[f"{tag}/advect_s_{method}"], atol=2e-5)
    got_u = advect_vel(0.25, u, flags, method=method, window=None)
    np.testing.assert_allclose(np.asarray(got_u),
                               _data[f"{tag}/advect_u_{method}"], atol=2e-5)


@pytest.mark.parametrize("tag", ["2d", "3d"])
def test_solver_fixture(tag):
    from fluidnet_tpu.ops.boundary import set_wall_bcs
    from fluidnet_tpu.ops.divergence import velocity_divergence
    from fluidnet_tpu.solvers.cg import solve_pcg
    from fluidnet_tpu.solvers.jacobi import solve_jacobi
    flags, u, _ = _inputs(tag)
    div = velocity_divergence(set_wall_bcs(u, flags), flags)
    p_j, _ = solve_jacobi(flags, div, p_tol=0.0, max_iter=40)
    np.testing.assert_allclose(np.asarray(p_j), _data[f"{tag}/jacobi_p"],
                               atol=2e-5)
    p_cg, _ = solve_pcg(flags, div, tol=1e-5, max_iter=120)
    np.testing.assert_allclose(np.asarray(p_cg), _data[f"{tag}/pcg_p"],
                               atol=5e-4)
