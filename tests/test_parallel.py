"""Sharding tests on the virtual 8-device CPU mesh (SURVEY.md §4: the
multi-chip tests the reference never had)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from fluidnet_tpu.core.config import ModelConfig
from fluidnet_tpu.core.grids import empty_domain
from fluidnet_tpu.ops.boundary import set_wall_bcs
from fluidnet_tpu.ops.divergence import velocity_divergence
from fluidnet_tpu.parallel.halo import halo_jacobi_solve
from fluidnet_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                        shard_batch)
from fluidnet_tpu.solvers.jacobi import solve_jacobi
from fluidnet_tpu.train.train import init_train_state, train_step


def test_halo_jacobi_matches_single_device():
    rng = np.random.default_rng(50)
    B, Z, Y, X = 1, 16, 16, 16
    flags = np.asarray(empty_domain((B, 1, Z, Y, X), True)).copy()
    flags[..., 6:9, 4:8, 5:9] = 2
    flags = jnp.asarray(flags)
    u = jnp.asarray(rng.standard_normal((B, 3, Z, Y, X)), jnp.float32)
    u = set_wall_bcs(u, flags)
    div = velocity_divergence(u, flags)

    p_ref, _ = solve_jacobi(flags, div, p_tol=0.0, max_iter=50)

    mesh = make_mesh(n_dp=2, n_sp=4)
    p_sharded = halo_jacobi_solve(flags, div, mesh, n_iter=50)
    np.testing.assert_allclose(np.asarray(p_sharded), np.asarray(p_ref),
                               atol=1e-5)


def test_batch_sharded_train_step():
    """The full training step jits and runs with dp-sharded batches; the
    result matches the unsharded step (SPMD correctness)."""
    rng = np.random.default_rng(51)
    from tests.test_train import make_batch
    # f32 convs: bf16 rounding is reduction-order sensitive across
    # shardings, which would mask genuine SPMD bugs here.
    mconf = ModelConfig(is_3d=False, time_scale_sigma=0.0,
                        conv_compute_dtype="float32")
    batch = make_batch(rng, n=16, B=8)
    state = init_train_state(jax.random.PRNGKey(0), mconf)
    key = jax.random.PRNGKey(1)

    state1, terms1 = train_step(state, batch, key, mconf, n_future=1)

    mesh = make_mesh(n_dp=8, n_sp=1)
    sharded = shard_batch(batch, mesh)
    state2, terms2 = train_step(state, sharded, key, mconf, n_future=1)
    np.testing.assert_allclose(float(terms1["total"]),
                               float(terms2["total"]), rtol=1e-4)
    l1 = jax.tree_util.tree_leaves(state1.params)
    l2 = jax.tree_util.tree_leaves(state2.params)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)


def test_z_sharded_advect_w2_multiplane_halo(monkeypatch):
    """W=2 (advection_window=2) exchanges TWO-plane halos across the sp
    axis — a failure mode the W=1 cases cannot catch (a bug that reads
    only 1 halo plane is invisible at W=1). Z=16 over n_sp=2 gives
    8-plane shards with 2-plane windows spanning the cut.

    Runs at FLUIDNET_SLICES_PER_PROGRAM=1: XLA:CPU takes >25 min to
    compile the interpret-mode W=2 kernel body at the production S=4
    (it scales with S x (2W+1)^3); S=1 compiles in ~1 min and covers
    identical halo semantics."""
    monkeypatch.setenv("FLUIDNET_SLICES_PER_PROGRAM", "1")
    from fluidnet_tpu.ops.advect_fast import (advect_scalar_fast,
                                              advect_vel_fast)
    from fluidnet_tpu.parallel.advect_sharded import advect_step_z_sharded
    rng = np.random.default_rng(83)
    B, Z, Y, X = 1, 16, 12, 16
    W = 2
    flags = np.asarray(empty_domain((B, 1, Z, Y, X), True)).copy()
    flags[..., 6:10, 4:8, 5:9] = 2       # obstacle spanning the shard cut
    flags = jnp.asarray(flags)
    u = jnp.asarray(rng.standard_normal((B, 3, Z, Y, X)) * 1.6, jnp.float32)
    rho = jnp.asarray(rng.random((B, 1, Z, Y, X)), jnp.float32)
    dt = 0.8   # CFL ~1.3: displacements actually use the second plane

    u_ref = advect_vel_fast(dt, u, flags, "maccormackOurs", 0.6, W)
    d_ref = advect_scalar_fast(dt, rho, u, flags, "maccormackOurs", False,
                               0.6, W)

    mesh = make_mesh(n_dp=1, n_sp=2)
    u_sh, d_sh = advect_step_z_sharded(dt, u, rho, flags, mesh,
                                       "maccormackOurs", 0.6, W)
    np.testing.assert_allclose(np.asarray(d_sh), np.asarray(d_ref),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(u_sh), np.asarray(u_ref),
                               atol=1e-5)


@pytest.mark.parametrize("method", ["maccormack", "maccormackOurs"])
def test_z_sharded_advect_matches_unsharded(method):
    """shard_map halo-exchange advection (the 256^3 stretch path): the
    Pallas warp runs per-shard on halo-extended slabs and must equal the
    single-device windowed result exactly (non-border cells never consult
    the array extent; border cells use the global border mask)."""
    from fluidnet_tpu.ops.advect_fast import (advect_scalar_fast,
                                              advect_vel_fast)
    from fluidnet_tpu.parallel.advect_sharded import advect_step_z_sharded
    rng = np.random.default_rng(52)
    B, Z, Y, X = 1, 48, 12, 16
    W = 1
    flags = np.asarray(empty_domain((B, 1, Z, Y, X), True)).copy()
    flags[..., 10:14, 4:8, 5:9] = 2      # obstacles spanning shard cuts
    flags[..., 22:26, 2:5, 10:14] = 2
    flags[..., 34:38, 6:9, 3:7] = 2
    flags = jnp.asarray(flags)
    u = jnp.asarray(rng.standard_normal((B, 3, Z, Y, X)) * 0.8, jnp.float32)
    rho = jnp.asarray(rng.random((B, 1, Z, Y, X)), jnp.float32)
    dt = 0.4

    u_ref = advect_vel_fast(dt, u, flags, method, 0.6, W)
    d_ref = advect_scalar_fast(dt, rho, u, flags, method, False, 0.6, W)

    mesh = make_mesh(n_dp=1, n_sp=8)
    u_sh, d_sh = advect_step_z_sharded(dt, u, rho, flags, mesh, method,
                                       0.6, W)
    np.testing.assert_allclose(np.asarray(d_sh), np.asarray(d_ref),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(u_sh), np.asarray(u_ref),
                               atol=1e-5)


def test_spatially_sharded_simulate_step():
    """GSPMD path: a 3-D sim step with the grid z-sharded over sp; XLA
    inserts the stencil halo exchanges automatically."""
    from fluidnet_tpu.core.grids import FluidState
    from fluidnet_tpu.sim.simulate import simulate
    mesh = make_mesh(n_dp=1, n_sp=8)
    mconf = ModelConfig(is_3d=True, sim_method="jacobi", max_iter=10,
                        buoyancy_scale=1.0, advection_method="euler")
    B, Z, Y, X = 1, 16, 16, 16
    sh = jax.sharding.NamedSharding(mesh, P(None, None, "sp", None, None))
    state = FluidState(
        u=jax.device_put(jnp.zeros((B, 3, Z, Y, X)), sh),
        p=jax.device_put(jnp.zeros((B, 1, Z, Y, X)), sh),
        flags=jax.device_put(empty_domain((B, 1, Z, Y, X), True), sh),
        density=jax.device_put(jnp.ones((B, 1, Z, Y, X)) * 0.5, sh))
    step = jax.jit(lambda s: simulate(s, mconf))
    out = step(state)
    assert np.all(np.isfinite(np.asarray(out.u)))


def test_sharded_convnet_rollout():
    """The production offline path under GSPMD: a scanned multi-step
    rollout (sim.rollout) with the ConvNet projection + fused forces
    block on a z-sharded state, checked against the unsharded rollout."""
    from fluidnet_tpu.core.grids import FluidState
    from fluidnet_tpu.models.fluidnet import apply_model, init_model
    from fluidnet_tpu.sim.simulate import create_plume_bcs, rollout

    mconf = ModelConfig(is_3d=True, sim_method="convnet",
                        buoyancy_scale=1.0,
                        vorticity_confinement_amp=2.0,
                        advection_method="maccormackOurs",
                        adaptive_window=False, advection_window=1,
                        conv_compute_dtype="float32")
    params = init_model(jax.random.PRNGKey(2), mconf)
    B, Z, Y, X = 1, 16, 16, 16
    state = FluidState(
        u=jnp.zeros((B, 3, Z, Y, X)), p=jnp.zeros((B, 1, Z, Y, X)),
        flags=empty_domain((B, 1, Z, Y, X), True),
        density=jnp.zeros((B, 1, Z, Y, X)))
    bcs = create_plume_bcs(state, [1.0], u_scale=0.6, rad=0.15)

    def model_fn(pr, p, u, f):
        return apply_model(pr, mconf, p, u, f)

    roll = jax.jit(lambda s: rollout(s, mconf, 3, model_fn, params, bcs))
    want = roll(state)

    mesh = make_mesh(n_dp=1, n_sp=8)
    sh = jax.sharding.NamedSharding(mesh, P(None, None, "sp", None, None))
    sharded = jax.tree_util.tree_map(
        lambda a: jax.device_put(a, sh), state)
    got = roll(sharded)
    np.testing.assert_allclose(np.asarray(got.u), np.asarray(want.u),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got.density),
                               np.asarray(want.density),
                               rtol=1e-5, atol=1e-6)
