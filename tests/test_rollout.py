"""Tests for the on-device scanned rollout, slab boundary masks, and the
hybrid ConvNet+Jacobi polish projection.

rollout() is the TPU-native analogue of the reference's frame loop
(fluid_net_3d_sim.lua:261): a lax.scan over simulate() steps so offline
workloads pay zero per-step host dispatch. Slab BCs store the plume's
4-row inflow masks at their true extent (simulate.lua:47-123 writes rows
y=1..4 only). polish_iters is a TPU-era improvement with no reference
counterpart (ModelConfig.polish_iters docs).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fluidnet_tpu.core.config import ModelConfig
from fluidnet_tpu.core.grids import FluidState, empty_domain
from fluidnet_tpu.models.fluidnet import apply_model, init_model
from fluidnet_tpu.ops.divergence import velocity_divergence
from fluidnet_tpu.sim.simulate import (Boundaries, apply_boundaries,
                                       create_plume_bcs, rollout, simulate)


def _plume_setup(is3d=False, n=24):
    mconf = ModelConfig(is_3d=is3d, sim_method="convnet", buoyancy_scale=1.0,
                        advection_method="maccormackOurs")
    params = init_model(jax.random.PRNGKey(7), mconf)
    B = 1
    Z, Y, X = (n, n, n) if is3d else (1, n, n)
    C = 3 if is3d else 2
    flags = empty_domain((B, 1, Z, Y, X), is3d)
    state = FluidState(
        u=jnp.zeros((B, C, Z, Y, X)), p=jnp.zeros((B, 1, Z, Y, X)),
        flags=flags, density=jnp.zeros((B, 1, Z, Y, X)))
    bcs = create_plume_bcs(state, [1.0], u_scale=0.6, rad=0.15)

    def model_fn(prm, p, u, f):
        return apply_model(prm, mconf, p, u, f)

    return mconf, params, state, bcs, model_fn


def test_rollout_matches_stepwise():
    """rollout(n) == n sequential simulate() calls, bitwise."""
    mconf, params, state, bcs, model_fn = _plume_setup()
    n = 5
    ref = state
    step = jax.jit(lambda s: simulate(s, mconf, model_fn, params, bcs))
    for _ in range(n):
        ref = step(ref)
    out = jax.jit(lambda s: rollout(s, mconf, n, model_fn, params, bcs))(
        state)
    np.testing.assert_array_equal(np.asarray(out.u), np.asarray(ref.u))
    np.testing.assert_array_equal(np.asarray(out.density),
                                  np.asarray(ref.density))


@pytest.mark.parametrize("save_every", [1, 2])
def test_rollout_save_every_frames(save_every):
    """save_every stacks density every save_every steps — the .vbox export
    cadence (fluid_net_3d_sim.lua:266-291)."""
    mconf, params, state, bcs, model_fn = _plume_setup()
    n = 4
    ref = state
    step = jax.jit(lambda s: simulate(s, mconf, model_fn, params, bcs))
    want = []
    for i in range(n):
        ref = step(ref)
        if (i + 1) % save_every == 0:
            want.append(np.asarray(ref.density))
    out, frames = jax.jit(lambda s: rollout(
        s, mconf, n, model_fn, params, bcs, save_every=save_every))(state)
    assert frames.shape[0] == n // save_every
    np.testing.assert_array_equal(np.asarray(frames[-1]),
                                  np.asarray(ref.density))
    for i, w in enumerate(want):
        np.testing.assert_array_equal(np.asarray(frames[i]), w)


def test_slab_bc_equals_full_field():
    """A y-slab bc/mask pair applies exactly like the equivalent
    full-field multiply-add (simulate.lua:125-160 setConstVals)."""
    rng = np.random.default_rng(11)
    B, C, Z, Y, X = 1, 2, 1, 16, 16
    u = jnp.asarray(rng.standard_normal((B, C, Z, Y, X)), jnp.float32)
    state = FluidState(u=u, p=jnp.zeros((B, 1, Z, Y, X)),
                       flags=empty_domain((B, 1, Z, Y, X), False),
                       density=jnp.zeros((B, 1, Z, Y, X)))
    YB = 4
    bc_slab = jnp.asarray(rng.standard_normal((B, C, Z, YB, X)), jnp.float32)
    inv_slab = jnp.asarray(rng.integers(0, 2, (B, C, Z, YB, X)), jnp.float32)

    # Full-field equivalent: identity outside the slab.
    bc_full = jnp.zeros_like(u).at[:, :, :, :YB].set(bc_slab)
    inv_full = jnp.ones_like(u).at[:, :, :, :YB].set(inv_slab)

    got = apply_boundaries(
        state, Boundaries(u_bc=bc_slab, u_bc_inv_mask=inv_slab)).u
    want = u * inv_full + bc_full
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_plume_bcs_are_slab_sized():
    """create_plume_bcs stores masks at the plume's true 4-row extent."""
    _, _, state, bcs, _ = _plume_setup()
    assert bcs.u_bc.shape[3] == 4
    assert bcs.density_bc.shape[3] == 4
    # Velocity rows are frozen to the bc (inv mask all-zero in the slab).
    assert float(jnp.abs(bcs.u_bc_inv_mask).max()) == 0.0


def test_polish_reduces_residual_divergence():
    """convnet + N Jacobi polish sweeps leaves lower interior divergence
    than the raw ConvNet projection after one step.

    Few-sweep counts transiently smear the large near-plume residual into
    the interior before killing it (Jacobi is a local smoother), so the
    check uses the reference's matched-cost scale of sweeps (maxIter=34,
    fluid_net_3d_sim.lua:80)."""
    mconf, params, state, bcs, model_fn = _plume_setup()
    # Warm the plume a few steps so there is real divergence to remove.
    warm = jax.jit(lambda s: rollout(s, mconf, 4, model_fn, params, bcs))(
        state)

    def resid(polish):
        mc = mconf.replace(polish_iters=polish)
        out = jax.jit(lambda s: simulate(s, mc, model_fn, params, bcs))(warm)
        div = velocity_divergence(out.u, out.flags)
        # Interior only: the frozen plume rows re-inject divergence.
        return float(jnp.abs(div[:, :, :, 6:]).max())

    r0, r34 = resid(0), resid(34)
    assert np.isfinite(r0) and np.isfinite(r34)
    assert r34 < r0 * 0.5, (r0, r34)
