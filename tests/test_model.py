"""Model tests: shapes, variants, normalization invariance, gradients,
and the simulate() integration with a convnet projection."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fluidnet_tpu.core.config import InputChannels, ModelConfig
from fluidnet_tpu.core.grids import FluidState, empty_domain
from fluidnet_tpu.models.fluidnet import (apply_model, init_model,
                                          layer_spec, num_input_channels)
from fluidnet_tpu.sim.simulate import create_plume_bcs, simulate


def _inputs(rng, is3d, n=8):
    B = 2
    Z, Y, X = (n, n, n) if is3d else (1, n, n)
    C = 3 if is3d else 2
    flags = empty_domain((B, 1, Z, Y, X), is3d)
    p = jnp.asarray(rng.standard_normal((B, 1, Z, Y, X)), jnp.float32)
    u = jnp.asarray(rng.standard_normal((B, C, Z, Y, X)), jnp.float32)
    return p, u, flags


@pytest.mark.parametrize("is3d", [False, True])
@pytest.mark.parametrize("model_type", ["default", "tog", "yang"])
def test_model_shapes(is3d, model_type):
    rng = np.random.default_rng(30)
    mconf = ModelConfig(is_3d=is3d, model_type=model_type)
    if model_type == "yang":
        mconf = mconf.replace(nonlin_type="sigmoid",
                              input_channels=InputChannels(u_div=False))
    params = init_model(jax.random.PRNGKey(0), mconf)
    p, u, flags = _inputs(rng, is3d)
    p_out, u_out = apply_model(params, mconf, p, u, flags)
    assert p_out.shape == p.shape
    assert u_out.shape == u.shape
    assert np.all(np.isfinite(np.asarray(p_out)))
    assert np.all(np.isfinite(np.asarray(u_out)))


@pytest.mark.parametrize("model_type", ["default", "yang"])
def test_trunk_nhwc_matches_generic(model_type, monkeypatch):
    """The channels-last fused trunk is a pure layout change: with f32
    compute it must match the generic stage path to summation-order
    tolerance."""
    import fluidnet_tpu.models.fluidnet as fnet
    rng = np.random.default_rng(31)
    mconf = ModelConfig(is_3d=True, model_type=model_type,
                        conv_compute_dtype="float32")
    if model_type == "yang":
        mconf = mconf.replace(nonlin_type="sigmoid",
                              input_channels=InputChannels(u_div=False))
    params = init_model(jax.random.PRNGKey(0), mconf)
    p, u, flags = _inputs(rng, True)
    osize, _, psize, usize = layer_spec(mconf)
    assert fnet._trunk_fast_ok(mconf, params, osize, psize, usize)
    p_fast, u_fast = apply_model(params, mconf, p, u, flags)
    monkeypatch.setattr(fnet, "_trunk_fast_ok",
                        lambda *a, **k: False)
    p_gen, u_gen = apply_model(params, mconf, p, u, flags)
    np.testing.assert_allclose(np.asarray(p_fast), np.asarray(p_gen),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(u_fast), np.asarray(u_gen),
                               atol=2e-4)


def test_trunk_zy_fold_matches_z_fold(monkeypatch):
    """FLUIDNET_TRUNK_FOLD=zy (ky+kz folded into MXU output lanes) is a
    pure summation-order change vs the default z-fold."""
    import fluidnet_tpu.models.fluidnet as fnet
    rng = np.random.default_rng(32)
    mconf = ModelConfig(is_3d=True, conv_compute_dtype="float32")
    params = init_model(jax.random.PRNGKey(0), mconf)
    p, u, flags = _inputs(rng, True)
    p_z, u_z = apply_model(params, mconf, p, u, flags)
    monkeypatch.setenv("FLUIDNET_TRUNK_FOLD", "zy")
    p_zy, u_zy = apply_model(params, mconf, p, u, flags)
    np.testing.assert_allclose(np.asarray(p_zy), np.asarray(p_z),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(u_zy), np.asarray(u_z),
                               atol=2e-4)


@pytest.mark.parametrize("agg", ["concat", "add"])
def test_model_mres_banks(agg):
    rng = np.random.default_rng(31)
    mconf = ModelConfig(is_3d=False, banks_num=2, banks_split_stage=1,
                        banks_join_stage=3, banks_aggregate_method=agg)
    params = init_model(jax.random.PRNGKey(0), mconf)
    p, u, flags = _inputs(rng, False, n=16)
    p_out, u_out = apply_model(params, mconf, p, u, flags)
    assert p_out.shape == p.shape and u_out.shape == u.shape


def test_model_dilation_banks():
    rng = np.random.default_rng(32)
    mconf = ModelConfig(is_3d=False, banks_num=2, banks_type="dilate",
                        banks_aggregate_method="add")
    params = init_model(jax.random.PRNGKey(0), mconf)
    p, u, flags = _inputs(rng, False, n=16)
    p_out, _ = apply_model(params, mconf, p, u, flags)
    assert p_out.shape == p.shape


def test_model_pressure_skip_and_udiv_input():
    rng = np.random.default_rng(33)
    mconf = ModelConfig(is_3d=False, add_pressure_skip=True,
                        input_channels=InputChannels(u_div=True))
    params = init_model(jax.random.PRNGKey(0), mconf)
    assert num_input_channels(mconf) == 5  # p + 2u + div + occ
    p, u, flags = _inputs(rng, False)
    p_out, _ = apply_model(params, mconf, p, u, flags)
    assert p_out.shape == p.shape


def test_normalization_scale_invariance():
    """With std input normalization, scaling (p, U) by a constant scales the
    output by the same constant (model.lua:92-131 + 384-387): the network
    sees identical normalized inputs."""
    rng = np.random.default_rng(34)
    mconf = ModelConfig(is_3d=False)
    params = init_model(jax.random.PRNGKey(1), mconf)
    p, u, flags = _inputs(rng, False)
    p1, u1 = apply_model(params, mconf, p, u, flags)
    k = 37.5
    p2, u2 = apply_model(params, mconf, p * k, u * k, flags)
    np.testing.assert_allclose(np.asarray(p2), np.asarray(p1) * k,
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(u2), np.asarray(u1) * k,
                               rtol=2e-3, atol=2e-3)


def test_model_grads_finite():
    rng = np.random.default_rng(35)
    mconf = ModelConfig(is_3d=False)
    params = init_model(jax.random.PRNGKey(2), mconf)
    p, u, flags = _inputs(rng, False)

    def loss(prm):
        p_o, u_o = apply_model(prm, mconf, p, u, flags)
        return jnp.mean(p_o ** 2) + jnp.mean(u_o ** 2)

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


def test_simulate_with_convnet_reduces_nothing_but_runs():
    """End-to-end slice: plume scene stepped with a randomly initialized
    model — the full step loop exercises every layer (SURVEY.md §7 stage 3)."""
    mconf = ModelConfig(is_3d=False, sim_method="convnet", buoyancy_scale=1.0,
                        advection_method="maccormackOurs")
    params = init_model(jax.random.PRNGKey(3), mconf)
    B, Z, Y, X = 1, 1, 32, 32
    flags = empty_domain((B, 1, Z, Y, X), False)
    state = FluidState(
        u=jnp.zeros((B, 2, Z, Y, X)), p=jnp.zeros((B, 1, Z, Y, X)),
        flags=flags, density=jnp.zeros((B, 1, Z, Y, X)))
    bcs = create_plume_bcs(state, [1.0], u_scale=0.6, rad=0.15)

    def model_fn(prm, p, u, f):
        return apply_model(prm, mconf, p, u, f)

    step = jax.jit(lambda s: simulate(s, mconf, model_fn, params, bcs))
    for _ in range(4):
        state = step(state)
    assert np.all(np.isfinite(np.asarray(state.u)))
    assert np.all(np.isfinite(np.asarray(state.density)))
    # plume injects density
    assert float(state.density.sum()) > 0


@pytest.mark.parametrize("method,max_iter,thresh", [
    # Jacobi converges slowly (spectral radius ~1 - pi^2/(2 n^2)); 400
    # sweeps at 32^2 only buy ~1 order of magnitude. Additionally, the
    # sealed-box plume has an INCONSISTENT Poisson RHS (frozen inflow with
    # no outlet): the least-squares answer spreads flux/n_cells ~ 6e-3
    # uniformly — the physical floor any solver hits here.
    ("jacobi", 400, 2e-2),
    ("pcg", 200, 1e-2),
])
def test_simulate_plume_divergence_floor(method, max_iter, thresh):
    """Model-free slice: the plume with a classical projection keeps the
    post-projection divergence near the scene's physical floor."""
    from fluidnet_tpu.ops.divergence import velocity_divergence
    mconf = ModelConfig(is_3d=False, sim_method=method, max_iter=max_iter,
                        buoyancy_scale=1.0, advection_method="maccormackOurs")
    B, Z, Y, X = 1, 1, 32, 32
    flags = empty_domain((B, 1, Z, Y, X), False)
    state = FluidState(
        u=jnp.zeros((B, 2, Z, Y, X)), p=jnp.zeros((B, 1, Z, Y, X)),
        flags=flags, density=jnp.zeros((B, 1, Z, Y, X)))
    bcs = create_plume_bcs(state, [1.0], u_scale=0.6, rad=0.15)
    step = jax.jit(lambda s: simulate(s, mconf, None, None, bcs))
    for _ in range(6):
        state = step(state)
    div = velocity_divergence(state.u, state.flags)
    # The frozen plume BC rows re-inject divergence (simulate.lua:320-321
    # applies them after the projection); exclude them.
    assert float(jnp.abs(div[..., 5:, :]).max()) < thresh
    assert float(state.density.sum()) > 0


def test_simulate_pcg_buoyant_blob_divergence_free():
    """Consistent scene (no forced inflow): PCG projection must drive the
    divergence to the solver tolerance."""
    from fluidnet_tpu.ops.divergence import velocity_divergence
    mconf = ModelConfig(is_3d=False, sim_method="pcg", max_iter=300,
                        buoyancy_scale=2.0, advection_method="maccormackOurs")
    B, Z, Y, X = 1, 1, 32, 32
    flags = empty_domain((B, 1, Z, Y, X), False)
    yy, xx = np.meshgrid(np.arange(Y), np.arange(X), indexing="ij")
    blob = (((yy - 8) ** 2 + (xx - 16) ** 2) < 25).astype(np.float32)
    state = FluidState(
        u=jnp.zeros((B, 2, Z, Y, X)), p=jnp.zeros((B, 1, Z, Y, X)),
        flags=flags, density=jnp.asarray(blob)[None, None, None])
    step = jax.jit(lambda s: simulate(s, mconf, None, None, None))
    for _ in range(5):
        state = step(state)
    div = velocity_divergence(state.u, state.flags)
    assert float(jnp.abs(div).max()) < 2e-4
    assert float(jnp.abs(state.u).max()) > 1e-3  # buoyancy actually acted
