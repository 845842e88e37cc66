"""Training-step tests: the full loss (immediate + long-term unroll) runs,
gradients are finite, the optimizer fits a tiny batch, and both unroll
gradient modes work."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fluidnet_tpu.core.config import ModelConfig
from fluidnet_tpu.core.grids import empty_domain
from fluidnet_tpu.ops.boundary import set_wall_bcs
from fluidnet_tpu.ops.divergence import velocity_divergence
from fluidnet_tpu.ops.velocity_update import velocity_update
from fluidnet_tpu.solvers.cg import solve_pcg
from fluidnet_tpu.train.train import (init_train_state, loss_fn,
                                      sample_future_steps, train_step)


def make_batch(rng, is3d=False, n=16, B=2):
    """Synthetic supervised batch: targets from the PCG ground truth, like
    trainTargetSource='pcg' (simulate.lua:332-372)."""
    Z, Y, X = (n, n, n) if is3d else (1, n, n)
    C = 3 if is3d else 2
    flags = empty_domain((B, 1, Z, Y, X), is3d)
    u_div = jnp.asarray(rng.standard_normal((B, C, Z, Y, X)), jnp.float32)
    u_div = set_wall_bcs(u_div, flags)
    p_div = jnp.zeros((B, 1, Z, Y, X), jnp.float32)
    div = velocity_divergence(u_div, flags)
    p_t, _ = solve_pcg(flags, div, tol=1e-6, max_iter=400)
    u_t = set_wall_bcs(velocity_update(u_div, flags, p_t), flags)
    return {
        "p_div": p_div, "u_div": u_div, "flags": flags,
        "p_target": p_t, "u_target": u_t,
        "density": jnp.asarray(rng.random((B, 1, Z, Y, X)), jnp.float32),
    }


def test_loss_fn_runs_with_unroll():
    rng = np.random.default_rng(40)
    mconf = ModelConfig(is_3d=False, loss_p_lambda=0.5, loss_u_lambda=0.5,
                        time_scale_sigma=1.0, train_buoyancy_prob=0.5,
                        train_gravity_prob=0.5,
                        train_vorticity_confinement_prob=0.5)
    batch = make_batch(rng)
    state = init_train_state(jax.random.PRNGKey(0), mconf)
    total, terms = loss_fn(state.params, batch, jax.random.PRNGKey(1), mconf,
                           n_future=2)
    assert np.isfinite(float(total))
    for k in ("p", "u", "div", "long_term_div"):
        assert np.isfinite(float(terms[k])), k
    assert float(terms["long_term_div"]) > 0


@pytest.mark.parametrize("grad_mode", ["last", "full"])
def test_train_step_decreases_loss(grad_mode):
    rng = np.random.default_rng(41)
    mconf = ModelConfig(is_3d=False, long_term_grad_mode=grad_mode,
                        time_scale_sigma=0.0)
    batch = make_batch(rng)
    state = init_train_state(jax.random.PRNGKey(0), mconf)
    key = jax.random.PRNGKey(2)
    losses = []
    for i in range(30):
        key, sub = jax.random.split(key)
        state, terms = train_step(state, batch, sub, mconf, n_future=2)
        losses.append(float(terms["total"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.7, losses[:3] + losses[-3:]


def test_sample_future_steps():
    import random
    mconf = ModelConfig()
    rng = random.Random(0)
    vals = {sample_future_steps(rng, mconf) for _ in range(200)}
    assert vals == {4, 16}


@pytest.mark.parametrize("source", ["jacobi", "pcg"])
def test_solver_targets_and_augmentation(source):
    """trainTargetSource='jacobi'|'pcg' (simulate.lua:332-414 wired per
    run_epoch.lua:160-179): manta targets are ignored, augmentation adds
    divergence to UDiv, solver GT replaces the targets, and the p target
    is DC-normalized."""
    rng = np.random.default_rng(43)
    mconf = ModelConfig(is_3d=False, loss_p_lambda=0.5, loss_u_lambda=0.5,
                        train_target_source=source, max_iter=60,
                        train_buoyancy_prob=1.0, train_gravity_prob=1.0,
                        train_vorticity_confinement_prob=1.0)
    batch = make_batch(rng)
    state = init_train_state(jax.random.PRNGKey(0), mconf)
    # Poison the manta targets: the solver path must not read them.
    poisoned = dict(batch)
    poisoned["p_target"] = batch["p_target"] * jnp.nan
    poisoned["u_target"] = batch["u_target"] * jnp.nan
    total, terms = loss_fn(state.params, poisoned, jax.random.PRNGKey(1),
                           mconf, n_future=1)
    assert np.isfinite(float(total))
    for k in ("p", "u", "div", "long_term_div"):
        assert np.isfinite(float(terms[k])), k
    # And gradients flow.
    grads = jax.grad(lambda pr: loss_fn(pr, poisoned, jax.random.PRNGKey(1),
                                        mconf, n_future=0)[0])(state.params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    assert any(float(np.abs(np.asarray(l)).max()) > 0 for l in leaves)


def test_data_augmentation_changes_udiv_only():
    """dataAugmentation perturbs UDiv (more divergence is fine) but the
    manta-loaded fields it must not touch stay intact
    (simulate.lua:374-414: only UDiv is written)."""
    from fluidnet_tpu.train.train import _data_augmentation
    rng = np.random.default_rng(44)
    mconf = ModelConfig(is_3d=False)
    batch = make_batch(rng)
    before = {k: np.asarray(v).copy() for k, v in batch.items()}
    gravity = jnp.asarray([0.0, 1.0, 0.0])
    u_aug = _data_augmentation(batch["u_div"], batch["flags"],
                               batch["density"], mconf, gravity,
                               jnp.asarray(2.0), jnp.asarray(2.0),
                               jnp.asarray(2.0))
    assert float(np.abs(np.asarray(u_aug) - before["u_div"]).max()) > 0
    for k in ("p_div", "flags", "p_target", "u_target", "density"):
        np.testing.assert_array_equal(np.asarray(batch[k]), before[k])


def test_pressure_mean_normalized_when_p_loss():
    """With loss_p_lambda > 0 the target pressure entering the loss has
    zero mean over each fluid component (run_epoch.lua:172-179): adding a
    constant to p_target on fluid cells (the DC null space of the Poisson
    solve) must not change the loss."""
    rng = np.random.default_rng(45)
    mconf = ModelConfig(is_3d=False, loss_p_lambda=1.0, loss_u_lambda=0.0,
                        long_term_div_lambda=0.0)
    batch = make_batch(rng)
    state = init_train_state(jax.random.PRNGKey(0), mconf)
    t1, _ = loss_fn(state.params, batch, jax.random.PRNGKey(1), mconf, 0)
    shifted = dict(batch)
    fl = ((np.asarray(batch["flags"]) & 1) > 0).astype(np.float32)
    shifted["p_target"] = batch["p_target"] + 7.5 * fl
    t2, _ = loss_fn(state.params, shifted, jax.random.PRNGKey(1), mconf, 0)
    np.testing.assert_allclose(float(t1), float(t2), rtol=1e-5)


def test_set_learning_rate_changes_update():
    """lr_epoch_mults must actually change the step size
    (run_epoch.lua:40-48): same batch, lr x0.1 -> smaller update norm."""
    from fluidnet_tpu.train.train import set_learning_rate
    rng = np.random.default_rng(46)
    mconf = ModelConfig(is_3d=False, long_term_div_lambda=0.0)
    batch = make_batch(rng)

    def update_norm(scale):
        state = init_train_state(jax.random.PRNGKey(0), mconf)
        state = set_learning_rate(
            state, mconf.optim.learning_rate * scale)
        state2, _ = train_step(state, batch, jax.random.PRNGKey(1), mconf,
                               n_future=0)
        diffs = jax.tree_util.tree_map(lambda a, b: a - b, state2.params,
                                       state.params)
        import optax
        return float(optax.global_norm(diffs))

    n_full, n_small = update_norm(1.0), update_norm(0.1)
    assert n_small < n_full * 0.5, (n_full, n_small)


def test_grad_norm_clipped():
    rng = np.random.default_rng(42)
    mconf = ModelConfig(is_3d=False, grad_norm_threshold=1.0)
    batch = make_batch(rng)
    # Blow up targets to force large grads.
    batch["u_target"] = batch["u_target"] * 1e4
    mconf = mconf.replace(loss_u_lambda=1.0)
    state = init_train_state(jax.random.PRNGKey(0), mconf)
    state2, terms = train_step(state, batch, jax.random.PRNGKey(1), mconf,
                               n_future=0)
    # raw grad norm reported can exceed threshold; update must be finite.
    leaves = jax.tree_util.tree_leaves(state2.params)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)


def test_grad_safe_sqrt_guards():
    """Full-rollout ('full' grad mode) differentiates through vorticity
    confinement and input normalization; their norm guards must use the
    double-where pattern or 0 * d(sqrt(0)) = NaN poisons every gradient
    (the classic jnp.where NaN trap)."""
    import jax
    import jax.numpy as jnp
    from fluidnet_tpu.core.config import ModelConfig
    from fluidnet_tpu.core.grids import empty_domain
    from fluidnet_tpu.ops.forces import vorticity_confinement
    from fluidnet_tpu.models.fluidnet import apply_model
    from fluidnet_tpu.train.train import init_train_state

    B, Z, Y, X = 1, 6, 8, 16
    flags = empty_domain((B, 1, Z, Y, X), True)
    # Sparse curl: most of the grid has |curl| == 0 (the trap trigger).
    u = jnp.zeros((B, 3, Z, Y, X), jnp.float32).at[:, 0, 3, 4, 8].set(1.0)
    g = jax.grad(lambda uu: jnp.sum(
        vorticity_confinement(uu, flags, 0.5) ** 2))(u)
    assert bool(jnp.isfinite(g).all())

    for func in ("std", "norm"):
        mconf = ModelConfig(is_3d=True, normalize_input_func=func)
        st = init_train_state(jax.random.PRNGKey(0), mconf)
        uz = jnp.zeros((B, 3, Z, Y, X), jnp.float32)   # uniform: std == 0
        gz = jax.grad(lambda uu: jnp.sum(apply_model(
            st.params, mconf, uz[:, :1], uu, flags)[1] ** 2))(uz)
        assert bool(jnp.isfinite(gz).all()), func


def test_augment_without_targets():
    """Input augmentation under the div-only loss: UDiv changes, targets
    don't, and the loss stays finite."""
    import jax
    import jax.numpy as jnp
    from fluidnet_tpu.core.config import ModelConfig
    from fluidnet_tpu.core.grids import empty_domain
    from fluidnet_tpu.train.train import init_train_state, loss_fn
    import numpy as np

    rng = np.random.default_rng(2)
    B, Z, Y, X = 2, 1, 16, 16
    mconf = ModelConfig(is_3d=False, augment_without_targets=True,
                        train_buoyancy_prob=1.0,
                        train_vorticity_confinement_prob=1.0,
                        long_term_div_num_steps=(1, 1),
                        time_scale_sigma=0.0)
    flags = empty_domain((B, 1, Z, Y, X), False)
    batch = {
        "p_div": jnp.zeros((B, 1, Z, Y, X), jnp.float32),
        "u_div": jnp.asarray(rng.standard_normal((B, 2, Z, Y, X)),
                             jnp.float32),
        "flags": flags,
        "p_target": jnp.zeros((B, 1, Z, Y, X), jnp.float32),
        "u_target": jnp.zeros((B, 2, Z, Y, X), jnp.float32),
        "density": jnp.asarray(rng.random((B, 1, Z, Y, X)), jnp.float32),
    }
    st = init_train_state(jax.random.PRNGKey(0), mconf)
    loss, terms = loss_fn(st.params, batch, jax.random.PRNGKey(3), mconf,
                          1)
    assert np.isfinite(float(loss))
    # The same batch without augmentation gives a different div loss.
    mconf2 = mconf.replace(augment_without_targets=False)
    loss2, _ = loss_fn(st.params, batch, jax.random.PRNGKey(3), mconf2, 1)
    assert float(loss) != float(loss2)
