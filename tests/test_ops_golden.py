"""Golden parity: vectorized JAX ops vs the loop-based NumPy oracle.

Mirrors the reference's golden-data strategy (SURVEY.md §4): element-wise
parity at tight tolerance on random grids with random obstacle layouts,
in both 2-D and 3-D.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from fluidnet_tpu.core.grids import empty_domain, flags_to_occupancy, get_dx
from fluidnet_tpu.ops.boundary import set_wall_bcs
from fluidnet_tpu.ops.divergence import velocity_divergence
from fluidnet_tpu.ops.forces import (add_buoyancy, add_gravity,
                                     vorticity_confinement)
from fluidnet_tpu.ops.velocity_update import velocity_update

from tests import reference_impl as ref

TOL = 1e-5


def make_case(rng, is3d, with_empty=False, with_stick=False):
    if is3d:
        B, Z, Y, X = 2, 6, 8, 7
        C = 3
    else:
        B, Z, Y, X = 2, 1, 9, 8
        C = 2
    flags = ref.random_flags(rng, (B, 1, Z, Y, X))
    if with_empty:
        inner = (flags == ref.FLUID) & (rng.random(flags.shape) < 0.3)
        flags = np.where(inner, ref.EMPTY, flags)
        outflow = (flags == ref.EMPTY) & (rng.random(flags.shape) < 0.3)
        flags = np.where(outflow, ref.EMPTY | ref.OUTFLOW, flags)
    if with_stick:
        stick = (flags == ref.OBSTACLE) & (rng.random(flags.shape) < 0.5)
        flags = np.where(stick, ref.OBSTACLE | ref.STICK, flags)
    u = rng.standard_normal((B, C, Z, Y, X)).astype(np.float32)
    p = rng.standard_normal((B, 1, Z, Y, X)).astype(np.float32)
    rho = rng.random((B, 1, Z, Y, X)).astype(np.float32)
    return flags, u, p, rho


@pytest.mark.parametrize("is3d", [False, True])
@pytest.mark.parametrize("with_stick", [False, True])
def test_set_wall_bcs(is3d, with_stick):
    rng = np.random.default_rng(0)
    flags, u, _, _ = make_case(rng, is3d, with_stick=with_stick)
    got = np.asarray(set_wall_bcs(jnp.asarray(u), jnp.asarray(flags)))
    want = ref.set_wall_bcs(u, flags)
    np.testing.assert_allclose(got, want, atol=TOL)


@pytest.mark.parametrize("is3d", [False, True])
def test_velocity_divergence(is3d):
    rng = np.random.default_rng(1)
    flags, u, _, _ = make_case(rng, is3d)
    got = np.asarray(velocity_divergence(jnp.asarray(u), jnp.asarray(flags)))
    want = ref.velocity_divergence(u, flags)
    np.testing.assert_allclose(got, want, atol=TOL)


@pytest.mark.parametrize("is3d", [False, True])
@pytest.mark.parametrize("with_empty", [False, True])
def test_velocity_update(is3d, with_empty):
    rng = np.random.default_rng(2)
    flags, u, p, _ = make_case(rng, is3d, with_empty=with_empty)
    got = np.asarray(velocity_update(jnp.asarray(u), jnp.asarray(flags),
                                     jnp.asarray(p)))
    want = ref.velocity_update(u, flags, p)
    np.testing.assert_allclose(got, want, atol=TOL)


@pytest.mark.parametrize("is3d", [False, True])
def test_add_buoyancy(is3d):
    rng = np.random.default_rng(3)
    flags, u, _, rho = make_case(rng, is3d)
    g = np.array([0.3, -1.0, 0.5 if is3d else 0.0], np.float32)
    dt = 0.13
    got = np.asarray(add_buoyancy(jnp.asarray(u), jnp.asarray(flags),
                                  jnp.asarray(rho), g, dt))
    want = ref.add_buoyancy(u, flags, rho, g, dt)
    np.testing.assert_allclose(got, want, atol=TOL)


@pytest.mark.parametrize("is3d", [False, True])
@pytest.mark.parametrize("with_empty", [False, True])
def test_add_gravity(is3d, with_empty):
    rng = np.random.default_rng(4)
    flags, u, _, _ = make_case(rng, is3d, with_empty=with_empty)
    g = np.array([-0.2, 1.0, 0.7 if is3d else 0.0], np.float32)
    dt = 0.07
    got = np.asarray(add_gravity(jnp.asarray(u), jnp.asarray(flags), g, dt))
    want = ref.add_gravity(u, flags, g, dt)
    np.testing.assert_allclose(got, want, atol=TOL)


@pytest.mark.parametrize("is3d", [False, True])
def test_vorticity_confinement(is3d):
    rng = np.random.default_rng(5)
    flags, u, _, _ = make_case(rng, is3d)
    got = np.asarray(vorticity_confinement(jnp.asarray(u), jnp.asarray(flags),
                                           0.5))
    want = ref.vorticity_confinement(u, flags, 0.5)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_empty_domain_and_occupancy():
    flags = np.asarray(empty_domain((1, 1, 4, 5, 6), True, bnd=1))
    assert flags[0, 0, 0, 0, 0] == ref.OBSTACLE
    assert flags[0, 0, 2, 2, 2] == ref.FLUID
    occ = np.asarray(flags_to_occupancy(jnp.asarray(flags)))
    np.testing.assert_array_equal(occ, (flags == ref.OBSTACLE).astype(np.float32))
    # 2-D: z border not obstacled.
    flags2 = np.asarray(empty_domain((1, 1, 1, 5, 6), False, bnd=1))
    assert flags2[0, 0, 0, 2, 2] == ref.FLUID


def test_get_dx():
    assert get_dx((1, 1, 1, 64, 128)) == 1.0 / 128
    assert get_dx((1, 1, 32, 16, 8)) == 1.0 / 32
