"""Fused projection prologue (ops.prologue) vs the unfused composition.

Runs on the CPU mesh in pallas interpret mode. The fused kernel must
match prologue_xla (slab BC -> forces block -> slab BC -> setWallBcs ->
divergence) exactly, its custom-VJP gradients must match the unfused
gradients, and a whole simulate() step must be identical with the knob
on and off.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fluidnet_tpu.core.celltype import CellType
from fluidnet_tpu.core.config import ModelConfig
from fluidnet_tpu.core.grids import FluidState
from fluidnet_tpu.ops.prologue import projection_prologue, prologue_xla

from tests import reference_impl as ref


def _case(rng, with_stick=False, Z=10, Y=16, X=24):
    flags = ref.random_flags(rng, (1, 1, Z, Y, X), p_obstacle=0.15)
    if with_stick:
        stick = rng.random(flags.shape) < 0.08
        flags = np.where(stick & (flags == CellType.TypeFluid),
                         CellType.TypeStick, flags)
        # Mark a few EMPTY cells too (gravity/buoyancy gating paths).
        empty = rng.random(flags.shape) < 0.05
        flags = np.where(empty & (flags == CellType.TypeFluid),
                         CellType.TypeEmpty, flags)
    u = rng.standard_normal((1, 3, Z, Y, X)).astype(np.float32)
    rho = rng.random((1, 1, Z, Y, X)).astype(np.float32)
    return jnp.asarray(flags.astype(np.int32)), jnp.asarray(u), \
        jnp.asarray(rho)


def _slab_masks(rng, Z, X, yb=4):
    u_bc = (rng.standard_normal((1, 3, Z, yb, X)) * 0.3).astype(
        np.float32)
    u_inv = (rng.random((1, 3, Z, yb, X)) < 0.5).astype(np.float32)
    return jnp.asarray(u_bc), jnp.asarray(u_inv)


@pytest.mark.parametrize("with_stick", [False, True])
@pytest.mark.parametrize("with_bc", [False, True])
def test_prologue_matches_unfused(with_stick, with_bc):
    rng = np.random.default_rng(31)
    flags, u, rho = _case(rng, with_stick)
    u_bc = u_inv = None
    if with_bc:
        u_bc, u_inv = _slab_masks(rng, flags.shape[2], flags.shape[4])
    buoy_g = jnp.asarray([0.0, -0.17, 0.02], jnp.float32)
    grav_g = jnp.asarray([0.01, -0.05, 0.0], jnp.float32)
    amp, dt = jnp.asarray(0.6, jnp.float32), 0.25

    u0, d0 = prologue_xla(u, flags, rho, buoy_g, grav_g, amp, dt,
                          u_bc, u_inv)
    u1, d1 = projection_prologue(u, flags, rho, buoy_g, grav_g, amp,
                                 dt, u_bc, u_inv)
    np.testing.assert_allclose(np.asarray(u1), np.asarray(u0),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d0),
                               rtol=1e-5, atol=1e-6)


def test_prologue_grads_match_unfused():
    rng = np.random.default_rng(32)
    flags, u, rho = _case(rng, with_stick=True, Z=8, Y=8, X=16)
    u_bc, u_inv = _slab_masks(rng, flags.shape[2], flags.shape[4])
    buoy_g = jnp.asarray([0.0, -0.17, 0.02], jnp.float32)
    grav_g = jnp.asarray([0.01, -0.05, 0.0], jnp.float32)
    amp, dt = jnp.asarray(0.6, jnp.float32), 0.25

    def loss(fn, uu, rr, bb, gg, aa):
        un, dn = fn(uu, flags, rr, bb, gg, aa, dt, u_bc, u_inv)
        return jnp.sum(un * jnp.sin(un)) + jnp.sum(dn * dn)

    g0 = jax.grad(lambda *a: loss(prologue_xla, *a),
                  argnums=(0, 1, 2, 3, 4))(u, rho, buoy_g, grav_g, amp)
    g1 = jax.grad(lambda *a: loss(projection_prologue, *a),
                  argnums=(0, 1, 2, 3, 4))(u, rho, buoy_g, grav_g, amp)
    for a, b in zip(g1, g0):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_simulate_step_fused_prologue_matches(monkeypatch):
    """A whole convnet simulate() step is identical with the prologue
    knob on and off (plume BCs, forces on, tiny random model)."""
    from fluidnet_tpu.models.fluidnet import apply_model
    from fluidnet_tpu.sim.simulate import create_plume_bcs, simulate
    from fluidnet_tpu.train.train import init_train_state

    rng = np.random.default_rng(33)
    Z = Y = X = 16
    flags, u, rho = _case(rng, with_stick=False, Z=Z, Y=Y, X=X)
    mconf = ModelConfig(is_3d=True, sim_method="convnet", dt=0.1,
                        buoyancy_scale=1.5, gravity_scale=0.2,
                        vorticity_confinement_amp=2.0,
                        advection_method="maccormackOurs",
                        adaptive_window=False, advection_window=1)
    params = init_train_state(jax.random.PRNGKey(0), mconf).params
    state = FluidState(u=u, p=jnp.zeros((1, 1, Z, Y, X), jnp.float32),
                       flags=flags, density=rho)
    bcs = create_plume_bcs(state, [1.0], u_scale=0.6, rad=0.2)

    def model_fn(pr, p, uu, f, **kw):
        return apply_model(pr, mconf, p, uu, f, **kw)

    outs = {}
    for knob in ("0", "1"):
        monkeypatch.setenv("FLUIDNET_FUSED_PROLOGUE", knob)
        s = simulate(state, mconf, model_fn, params, bcs)
        outs[knob] = (np.asarray(s.u), np.asarray(s.p),
                      np.asarray(s.density))
    for a, b in zip(outs["1"], outs["0"]):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
