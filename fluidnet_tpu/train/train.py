"""Training step: divergence loss + unrolled long-term divergence loss.

Functional port of the feval closure in torch.runEpoch
(torch/lib/run_epoch.lua:191-320):

  1. model forward on the divergent input; FluidCriterion loss.
  2. long-term loss: run `simulate` forward n in {4, 16} steps with a random
     per-batch dt scale and randomized forces; model forward on the final
     divergent state; divergence loss only (no manta GT for future frames,
     run_epoch.lua:273-277).
  3. global-norm gradient clip to mconf.gradNormThreshold; Adam.

Two gradient modes (mconf.long_term_grad_mode):
  'last': gradients flow through the final projection only — exactly the
          reference (state copies break its graph, simulate.lua:267-272).
  'full': the whole unroll is differentiated, each step rematerialized with
          jax.checkpoint — the improvement SURVEY.md §7 calls for.

Everything is one jitted function per (mconf, n_future_steps); the horizon
is sampled host-side per batch like the reference's lua RNG
(run_epoch.lua:254-257), giving two cached executables.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax

from fluidnet_tpu.core.config import ModelConfig
from fluidnet_tpu.core.grids import FluidState, get_dx
from fluidnet_tpu.models.fluidnet import apply_model, init_model
from fluidnet_tpu.ops.boundary import set_wall_bcs
from fluidnet_tpu.ops.divergence import velocity_divergence
from fluidnet_tpu.ops.forces import (add_buoyancy, add_gravity,
                                     vorticity_confinement)
from fluidnet_tpu.ops.velocity_update import velocity_update
from fluidnet_tpu.sim.simulate import simulate
from fluidnet_tpu.solvers.cg import solve_pcg
from fluidnet_tpu.solvers.components import normalize_pressure_mean
from fluidnet_tpu.solvers.jacobi import solve_jacobi
from fluidnet_tpu.train.loss import fluid_loss


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jax.Array


def make_optimizer(mconf: ModelConfig):
    """Gradient clip + the selected optimizer (run_epoch.lua:304-320,
    default_conf.lua:99-119; the reference carries local adam/rmsprop
    copies, torch/lib/adam.lua / rmsprop.lua — optax provides them all).

    The LR schedule multipliers (conf.lrEpochMults) are applied by the
    training driver through optax's injected hyperparams."""
    o = mconf.optim
    method = mconf.optimization_method
    if method == "adam":
        opt = optax.inject_hyperparams(optax.adam)(
            learning_rate=o.learning_rate, b1=o.beta1, b2=o.beta2,
            eps=o.epsilon)
    elif method == "sgd":
        opt = optax.inject_hyperparams(optax.sgd)(
            learning_rate=o.learning_rate, momentum=o.momentum)
    elif method == "adagrad":
        opt = optax.inject_hyperparams(optax.adagrad)(
            learning_rate=o.learning_rate)
    elif method == "rmsprop":
        opt = optax.inject_hyperparams(optax.rmsprop)(
            learning_rate=o.learning_rate, eps=o.epsilon)
    else:
        raise ValueError(f"bad optimization_method {method}")
    return optax.chain(
        optax.clip_by_global_norm(mconf.grad_norm_threshold),
        opt,
        optax.add_decayed_weights(o.weight_decay)
        if o.weight_decay else optax.identity(),
    )


def init_train_state(key, mconf: ModelConfig) -> TrainState:
    params = init_model(key, mconf)
    opt = make_optimizer(mconf)
    return TrainState(params=params, opt_state=opt.init(params),
                      step=jnp.zeros((), jnp.int32))


def set_learning_rate(state: TrainState, lr: float) -> TrainState:
    """Epoch-boundary LR multiplier application (run_epoch.lua:40-48)."""
    state.opt_state[1].hyperparams["learning_rate"] = jnp.asarray(lr)
    return state


def _random_forces(key, mconf: ModelConfig, dtype=jnp.float32):
    """Per-batch force randomization (run_epoch.lua:133-158): random cardinal
    gravity direction; buoyancy/gravity/vorticity switched on with their
    train probabilities. Returns traced (gravity, b_scale, g_scale, v_amp)."""
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    axis = jax.random.randint(k1, (), 0, 3)
    sign = jax.random.randint(k2, (), 0, 2) * 2 - 1
    gravity = jnp.zeros(3, dtype).at[axis].set(sign.astype(dtype))
    b_on = jax.random.uniform(k3) < mconf.train_buoyancy_prob
    g_on = jax.random.uniform(k4) < mconf.train_gravity_prob
    v_on = jax.random.uniform(k5) < mconf.train_vorticity_confinement_prob
    b_scale = jnp.where(b_on, mconf.train_buoyancy_scale, 0.0)
    g_scale = jnp.where(g_on, mconf.train_gravity_scale, 0.0)
    v_amp = jnp.where(v_on, mconf.train_vorticity_confinement_amp, 0.0)
    return gravity, b_scale, g_scale, v_amp


def _random_dt(key, mconf: ModelConfig):
    """Random time-scale perturbation (run_epoch.lua:243-249): scale =
    0.2028 + |N(0,1) * timeScaleSigma| (the constant makes E[scale] ~= 1)."""
    if mconf.time_scale_sigma <= 0:
        return jnp.asarray(mconf.dt)
    scale = 0.2028 + jnp.abs(jax.random.normal(key) * mconf.time_scale_sigma)
    return mconf.dt * scale


def _data_augmentation(u_div, flags, density, mconf: ModelConfig,
                       gravity, b_scale, g_scale, v_amp):
    """tfluids.dataAugmentation (simulate.lua:374-414): adds extra
    buoyancy/gravity/vorticity-confinement divergence to UDiv (targets are
    recomputed by the solver afterwards, so any extra divergence is fair
    game). The reference passes the RAW cardinal gravity vector to
    addBuoyancy (simulate.lua:395-400) but the dx-scaled one to addGravity
    (:403-408); we keep both quirks."""
    dx = get_dx(flags)
    if density is not None:
        g_buoy = gravity * jnp.where(b_scale > 0, 1.0, 0.0)
        u_div = add_buoyancy(u_div, flags, density[:, 0:1], g_buoy, mconf.dt)
    u_div = add_gravity(u_div, flags, gravity * (-(dx / 4.0) * g_scale),
                        mconf.dt)
    u_div = vorticity_confinement(u_div, flags, dx * v_amp)
    return u_div


def _calc_pu_targets(u_div, flags, mconf: ModelConfig):
    """tfluids.calcPUTargets (simulate.lua:332-372): solver-sourced ground
    truth. Returns (u_div', p_target, u_target) where u_div' is the
    wall-bc'd input the reference leaves in the batch (:344). Callers wrap
    in stop_gradient (the reference computes targets outside the autograd
    closure, run_epoch.lua:160-170)."""
    u_div = set_wall_bcs(u_div, flags)
    div = velocity_divergence(u_div, flags)
    if mconf.train_target_source == "pcg":
        p_t, _ = solve_pcg(flags, div, tol=1e-4,
                           max_iter=mconf.max_iter or 100)
    elif mconf.train_target_source == "jacobi":
        p_t, _ = solve_jacobi(flags, div, p_tol=0.0,
                              max_iter=mconf.max_iter or 50)
    else:
        raise ValueError(
            f"bad train_target_source {mconf.train_target_source}")
    u_t = set_wall_bcs(velocity_update(u_div, flags, p_t), flags)
    return u_div, p_t, u_t


def sample_future_steps(py_rng, mconf: ModelConfig) -> int:
    """Host-side horizon sampling (run_epoch.lua:254-257)."""
    if py_rng.random() <= mconf.long_term_div_probability:
        return mconf.long_term_div_num_steps[0]
    return mconf.long_term_div_num_steps[1]


def _batch_state(batch) -> FluidState:
    return FluidState(u=batch["u_div"], p=batch["p_div"],
                      flags=batch["flags"], density=batch.get("density"))


def loss_fn(params, batch, key, mconf: ModelConfig, n_future: int,
            loss_weights=None):
    """Total loss for one batch. batch keys: p_div, u_div, flags,
    p_target, u_target, optional density.

    When mconf.train_target_source is 'jacobi'/'pcg' and a p/u loss is
    active, the manta targets are replaced in-graph: dataAugmentation on
    UDiv, then solver ground truth (run_epoch.lua:160-170 — note the
    reference gates this on the misspelled `trainTrainSource`, which is
    always nil there; we implement the intended train_target_source gate).
    With loss_p_lambda > 0 the target pressure's per-component DC mode is
    removed before the loss (run_epoch.lua:172-179)."""
    flags = batch["flags"]
    kdt, kforce = jax.random.split(key)
    dt = _random_dt(kdt, mconf)
    gravity, b_scale, g_scale, v_amp = _random_forces(kforce, mconf)

    u_div = batch["u_div"]
    # Target fields are optional when the p/u losses are off (the div
    # losses never read them) — the device cache then skips uploading
    # them, nearly doubling the HBM dataset budget.
    p_target = batch.get("p_target")
    u_target = batch.get("u_target")
    if p_target is None or u_target is None:
        assert mconf.loss_p_lambda == 0 and mconf.loss_u_lambda == 0, \
            "p/u losses need target fields in the batch"
        p_target = jnp.zeros_like(batch["p_div"])
        u_target = jnp.zeros_like(u_div)
    use_solver_gt = (mconf.train_target_source != "manta" and
                     (mconf.loss_p_lambda > 0 or mconf.loss_u_lambda > 0))
    if use_solver_gt:
        u_aug = _data_augmentation(u_div, flags, batch.get("density"),
                                   mconf, gravity, b_scale, g_scale, v_amp)
        u_div, p_target, u_target = jax.lax.stop_gradient(
            _calc_pu_targets(u_aug, flags, mconf))
    elif mconf.augment_without_targets:
        # Input-side augmentation with the targets untouched: valid only
        # while the p/u losses are off (div losses never read them).
        assert mconf.loss_p_lambda == 0 and mconf.loss_u_lambda == 0, \
            "augment_without_targets requires p/u losses off"
        u_div = jax.lax.stop_gradient(_data_augmentation(
            u_div, flags, batch.get("density"), mconf, gravity, b_scale,
            g_scale, v_amp))
    if mconf.loss_p_lambda > 0:
        p_target = normalize_pressure_mean(p_target, flags)

    p_pred, u_pred = apply_model(params, mconf, batch["p_div"], u_div, flags)
    total, terms = fluid_loss(mconf, p_pred, u_pred, p_target,
                              u_target, flags, weights=loss_weights)

    if n_future > 0 and mconf.long_term_div_lambda > 0:
        state = _batch_state(batch).replace(u=u_div)

        def step(s, output_div):
            return simulate(
                s, mconf, model_fn=lambda pr, p, u, f: apply_model(
                    pr, mconf, p, u, f),
                params=params, output_div=output_div, dt=dt,
                gravity=gravity, buoyancy_scale=b_scale,
                gravity_scale=g_scale, vorticity_amp=v_amp)

        if mconf.long_term_grad_mode == "full":
            step_remat = jax.checkpoint(
                lambda s: step(s, False), prevent_cse=False)
            for _ in range(n_future - 1):
                state = step_remat(state)
            state = step(state, True)
        else:
            # Reference semantics: inference-mode unroll, grads only through
            # the final projection (run_epoch.lua:262-269).
            for i in range(n_future):
                state = step(state, output_div=(i == n_future - 1))
            state = jax.tree_util.tree_map(jax.lax.stop_gradient, state)

        p_lt, u_lt = apply_model(params, mconf, state.p, state.u, flags)
        if mconf.train_target_source == "manta":
            # No manta GT for future frames: pressure/velocity lambdas are
            # zeroed (run_epoch.lua:273-277); divergence target is zero.
            lt_total, lt_terms = fluid_loss(
                mconf, p_lt, u_lt, state.p, state.u, flags,
                p_lambda=0.0, u_lambda=0.0,
                div_lambda=mconf.long_term_div_lambda, weights=loss_weights)
        else:
            # Solver GT exists for the future frame too
            # (run_epoch.lua:278-283): full lambdas, normalized p target.
            _, p_lt_t, u_lt_t = jax.lax.stop_gradient(
                _calc_pu_targets(state.u, flags, mconf))
            p_lt_t = normalize_pressure_mean(p_lt_t, flags)
            lt_total, lt_terms = fluid_loss(
                mconf, p_lt, u_lt, p_lt_t, u_lt_t, flags,
                div_lambda=mconf.long_term_div_lambda, weights=loss_weights)
        total = total + lt_total
        terms["long_term_div"] = lt_terms["div"]
    else:
        terms["long_term_div"] = jnp.asarray(0.0)

    terms["total"] = total
    return total, terms


def _reject_ok(terms, grad_norm, mconf: ModelConfig):
    """Accept mask for the reject-bad-update guard: loss and grad norm
    finite and below loss_reject_threshold. A threshold of 0 DISABLES
    the guard entirely (every update applies) — a non-finite loss then
    flows into the metric sums and trips the epoch driver's fail-fast
    NaN check, instead of being silently dropped for the whole run."""
    if mconf.loss_reject_threshold <= 0:
        return jnp.asarray(True)
    return (jnp.isfinite(terms["total"]) & jnp.isfinite(grad_norm)
            & (terms["total"] < mconf.loss_reject_threshold))


def _select_tree(ok, new, old):
    return jax.tree_util.tree_map(
        lambda n, o: jnp.where(ok, n, o), new, old)


@partial(jax.jit, static_argnames=("mconf", "n_future"))
def train_step(state: TrainState, batch, key, mconf: ModelConfig,
               n_future: int):
    """One optimization step; returns (new_state, metrics)."""
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
    (_, terms), grads = grad_fn(state.params, batch, key, mconf, n_future)
    opt = make_optimizer(mconf)
    updates, opt_state = opt.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    terms["grad_norm"] = optax.global_norm(grads)
    ok = _reject_ok(terms, terms["grad_norm"], mconf)
    params = _select_tree(ok, params, state.params)
    opt_state = _select_tree(ok, opt_state, state.opt_state)
    terms["rejected"] = 1.0 - ok.astype(jnp.float32)
    return TrainState(params=params, opt_state=opt_state,
                      step=state.step + 1), terms


@partial(jax.jit, static_argnames=("mconf", "n_future"))
def eval_step(batch, params, key, mconf: ModelConfig, n_future: int):
    _, terms = loss_fn(params, batch, key, mconf, n_future)
    return terms


# --- Fused device-side epoch steps -------------------------------------------
#
# On a remote-attached TPU every host->device dispatch and device->host
# read rides the tunnel (~100-300 ms latency); an epoch driven as
# [gather] + [train_step] + [key split] + [metrics float()] per batch is
# dispatch-bound, not compute-bound (measured 1.4 s/step against ~0.1 s
# of device time at 64^3 B=8). These variants fuse the batch gather (from
# the HBM-resident DeviceDataset arrays), the PRNG fold-in, the EMA
# update and the metric accumulation into the SAME jit as the step, so
# the host issues ONE async call per batch and reads metrics once per K
# batches.

def _tree_add(a, b):
    return jax.tree_util.tree_map(lambda x, y: x + y, a, b)


def metric_sums_init(extra=("grad_norm", "rejected")):
    keys = ("total", "p", "u", "div", "long_term_div") + tuple(extra)
    return {k: jnp.zeros(()) for k in keys}


def _train_core(state: TrainState, ema_params, dev_data, sums,
                idx, key, ema_decay, mconf: ModelConfig, n_future: int):
    """Shared body of train_step_fused and train_epoch_scan: on-device
    batch gather, grad step, reject guard, EMA, metric sums."""
    batch = {k: jnp.take(v, idx, axis=0) for k, v in dev_data.items()}
    sub = jax.random.fold_in(key, state.step)
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
    (_, terms), grads = grad_fn(state.params, batch, sub, mconf, n_future)
    opt = make_optimizer(mconf)
    updates, opt_state = opt.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    terms["grad_norm"] = optax.global_norm(grads)
    ok = _reject_ok(terms, terms["grad_norm"], mconf)
    params = _select_tree(ok, params, state.params)
    opt_state = _select_tree(ok, opt_state, state.opt_state)
    terms["rejected"] = 1.0 - ok.astype(jnp.float32)
    state = TrainState(params=params, opt_state=opt_state,
                       step=state.step + 1)
    ema_params = jax.tree_util.tree_map(
        lambda e, p: e * ema_decay + p * (1.0 - ema_decay),
        ema_params, state.params)
    # With the reject guard active, keep the metric sums finite on
    # rejected batches (a single NaN would poison the running epoch
    # average); the 'rejected' counter discloses every dropped update
    # and the epoch driver aborts past 50% rejected. With the guard
    # DISABLED (threshold 0) the raw terms flow through so a NaN loss
    # trips the driver's fail-fast check immediately.
    if mconf.loss_reject_threshold > 0:
        safe = {k: jnp.where(jnp.isfinite(terms[k]), terms[k], 0.0)
                for k in sums}
    else:
        safe = {k: terms[k] for k in sums}
    sums = _tree_add(sums, safe)
    return state, ema_params, sums


@partial(jax.jit, static_argnames=("mconf", "n_future"),
         donate_argnums=(0, 1, 3))
def train_step_fused(state: TrainState, ema_params, dev_data, sums,
                     idx, key, ema_decay, mconf: ModelConfig,
                     n_future: int):
    """One fused training step: batch = dev_data[idx] (on-device gather),
    per-step key = fold_in(key, state.step), EMA update, metric sums.
    Returns (state, ema_params, sums). `ema_decay` 0 keeps ema == params
    in the same graph (exact copy), so one executable serves both modes.
    """
    return _train_core(state, ema_params, dev_data, sums, idx, key,
                       ema_decay, mconf, n_future)


@partial(jax.jit, static_argnames=("mconf", "n_future"),
         donate_argnums=(0, 1, 3))
def train_epoch_scan(state: TrainState, ema_params, dev_data, sums,
                     idx_mat, key, ema_decay, mconf: ModelConfig,
                     n_future: int):
    """A whole run of training steps as ONE on-device lax.scan over a
    (n_batches, B) index matrix — a single host dispatch per horizon
    group per epoch.

    This is the TPU-native epoch shape: the per-batch host loop (even
    fused, one async dispatch per batch) leaks ~200 MB of host RSS per
    dispatch in the remote-TPU client and pays tunnel latency per batch;
    the scan makes host cost O(1) per epoch. The scan body compiles once
    (same executable cost as the fused step)."""
    def body(carry, idx):
        st, ema, sm = carry
        st, ema, sm = _train_core(st, ema, dev_data, sm, idx, key,
                                  ema_decay, mconf, n_future)
        return (st, ema, sm), None

    (state, ema_params, sums), _ = jax.lax.scan(
        body, (state, ema_params, sums), idx_mat)
    return state, ema_params, sums


def _eval_core(params, dev_data, idx, sums, key, step_i,
               mconf: ModelConfig, n_future: int):
    batch = {k: jnp.take(v, idx, axis=0) for k, v in dev_data.items()}
    sub = jax.random.fold_in(key, step_i)
    _, terms = loss_fn(params, batch, sub, mconf, n_future)
    terms["grad_norm"] = jnp.zeros(())
    terms["rejected"] = jnp.zeros(())
    return _tree_add(sums, {k: terms[k] for k in sums})


@partial(jax.jit, static_argnames=("mconf", "n_future"), donate_argnums=(3,))
def eval_step_fused(params, dev_data, idx, sums, key, step_i,
                    mconf: ModelConfig, n_future: int):
    return _eval_core(params, dev_data, idx, sums, key, step_i, mconf,
                      n_future)


@partial(jax.jit, static_argnames=("mconf", "n_future"), donate_argnums=(3,))
def eval_epoch_scan(params, dev_data, idx_mat, sums, key, batch_idx,
                    mconf: ModelConfig, n_future: int):
    """Whole eval pass as one on-device scan (see train_epoch_scan).

    `batch_idx` (n_batches,) carries each batch's ORIGINAL loader index:
    the per-batch RNG folds that in, so eval losses are bit-identical
    between epoch_scan on/off regardless of how grouping reordered the
    batches (the fused per-call path folds the loader index the same
    way)."""
    def body(sm, scanned):
        idx, i = scanned
        sm = _eval_core(params, dev_data, idx, sm, key, i, mconf, n_future)
        return sm, None

    sums, _ = jax.lax.scan(body, sums, (idx_mat, batch_idx))
    return sums


def make_train_step(mconf: ModelConfig):
    def fn(state, batch, key, n_future):
        return train_step(state, batch, key, mconf, n_future)
    return fn


def make_eval_step(mconf: ModelConfig):
    def fn(params, batch, key, n_future):
        return eval_step(batch, params, key, mconf, n_future)
    return fn
