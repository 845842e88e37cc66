"""Training entry point.

Equivalent of `qlua fluid_net_train.lua` (torch/fluid_net_train.lua):

  python -m fluidnet_tpu.cli.train --dataset my_ds --model_filename m1 \\
      --new_model.banks_num 2 --max_epochs 10

- loads (or self-generates) the dataset,
- builds/loads the model, startup-profiles FPROP time + analytic FLOPs,
- runs train/test epochs with the unrolled long-term divergence loss,
- checkpoints '<model>_lastEpoch' every epoch and '<model>' on best test
  loss (fluid_net_train.lua:229-239), with TSV loss logging.
"""

import os
import random
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from fluidnet_tpu.core.config import default_conf, parse_args, save_parameters
from fluidnet_tpu.data.dataset import (DeviceDataset, FluidDataset,
                                        PrefetchLoader)


def _dataset_gb(ds, keys=None) -> float:
    """Approximate device-resident size of a FluidDataset in GB; `keys`
    restricts to the fields that will actually be uploaded (the device
    cache skips p/u targets under div-only losses)."""
    sample = ds.get_batch([0])
    per = sum(v.nbytes for k, v in sample.items()
              if hasattr(v, "nbytes") and (keys is None or k in keys)) / 1e9
    return per * len(ds)
from fluidnet_tpu.data.generate import generate_dataset
from fluidnet_tpu.sim.simulate import simulate  # noqa: F401 (stats path)
from fluidnet_tpu.train.train import (eval_step, init_train_state,
                                      sample_future_steps,
                                      set_learning_rate, train_step)
from fluidnet_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
from fluidnet_tpu.utils.flops import model_flops, model_peak_activation
from fluidnet_tpu.utils.logger import Logger
from fluidnet_tpu.utils.profiler import profile_fprop

LOG_COLUMNS = ["epoch", "tr_loss", "tr_p", "tr_u", "tr_div", "tr_lt_div",
               "te_loss", "te_p", "te_u", "te_div", "te_lt_div"]


@jax.jit
def _ema_update(ema, params, decay):
    return jax.tree_util.tree_map(
        lambda e, p: e * decay + p * (1.0 - decay), ema, params)


def _sample_future(py_rng, mconf, sample_n):
    if mconf.long_term_div_lambda <= 0:
        return 0
    if sample_n is not None:
        return sample_n()
    return sample_future_steps(py_rng, mconf)


def _horizon_list(py_rng, mconf, sample_n, m):
    """Horizons for m batches with DETERMINISTIC per-horizon counts
    (round(p*m) short, rest long) and randomized assignment.

    The scan path compiles one executable per (horizon, group-length)
    pair; per-batch binomial sampling makes nearly every epoch produce a
    new group length and recompile the expensive unrolled-remat 3-D
    graph. Fixed counts keep the shapes — and the compile cache — stable
    across epochs; the reference's 0.9/0.1 split (run_epoch.lua:254-257)
    is preserved in expectation and exactly in proportion."""
    if mconf.long_term_div_lambda <= 0:
        return [0] * m
    if sample_n is not None and hasattr(sample_n, "lo"):
        lo, hi, p = sample_n.lo, sample_n.hi, sample_n.p
    elif sample_n is not None:
        # Opaque sampler (no lo/hi metadata): fall back to per-batch
        # draws — correctness over compile-cache stability.
        return [sample_n() for _ in range(m)]
    else:
        lo, hi = mconf.long_term_div_num_steps
        p = mconf.long_term_div_probability
    n_lo = int(round(p * m))
    out = [lo] * n_lo + [hi] * (m - n_lo)
    py_rng.shuffle(out)
    return out


def _epoch_fused(loader, state, mconf, key, py_rng, training,
                 max_batches=0, sample_n=None, ema=None, check_every=16,
                 scan_epoch=False):
    """Device-resident epoch: ONE async dispatch per batch (gather + step
    + EMA + metric sums fused into the jit, train.train_step_fused);
    metrics cross the tunnel once per `check_every` batches. This is the
    production path on the remote-attached TPU — the per-call epoch is
    dispatch-bound there (~1.4 s/step measured vs ~0.1 s device time).

    With `scan_epoch`, the whole epoch runs as ONE on-device lax.scan per
    horizon group (train.train_epoch_scan): host cost — and the remote
    client's ~200 MB-per-dispatch RSS growth — drops from O(batches) to
    O(1) per epoch. Batches are grouped by sampled unroll horizon (a
    static arg) and batch length; grouping reorders batches within the
    already-shuffled epoch, which is statistically neutral."""
    from fluidnet_tpu.train.train import (eval_step_fused, metric_sums_init,
                                          train_step_fused)
    from fluidnet_tpu.utils.pbar import progress

    key, epoch_key = jax.random.split(key)
    sums = metric_sums_init()
    # Copy when EMA is off: state.params and ema_params occupy SEPARATE
    # donated slots (donate_argnums=(0, 1)) of the fused/scan steps —
    # aliasing the same buffers into both is a runtime INVALID_ARGUMENT
    # double-donation error on the first step.
    ema_params = ema["params"] if ema is not None else \
        jax.tree_util.tree_map(jnp.copy, state.params)
    decay = jnp.asarray(ema["decay"] if ema is not None else 0.0)
    n_total = (len(loader.dataset) + loader.batch_size - 1) // \
        loader.batch_size
    if max_batches:
        n_total = min(n_total, max_batches)

    if scan_epoch:
        from fluidnet_tpu.train.train import (eval_epoch_scan,
                                              train_epoch_scan)
        # Group batches by (horizon, batch-length). Horizon counts are
        # deterministic per epoch (_horizon_list) so each group's
        # (n_batches, B) scan shape is identical every epoch — one
        # compiled executable per curriculum phase per horizon, not one
        # per epoch. Grouping first by length keeps the one possible
        # remainder batch in its own stable group.
        by_len = {}
        for i, idx in enumerate(loader.epoch_indices(
                max_batches=max_batches)):
            by_len.setdefault(len(idx), []).append((i, idx))
        groups = {}
        for blen, lst in sorted(by_len.items()):
            nfs = _horizon_list(py_rng, mconf, sample_n, len(lst))
            for nf, (i, idx) in zip(nfs, lst):
                groups.setdefault((nf, blen), []).append((i, idx))
        n = 0
        for (nf, _blen), pairs in sorted(groups.items()):
            mat = jnp.asarray(np.stack([idx for _, idx in pairs]))
            # Original loader batch indices: the eval scan folds these
            # into the RNG so per-batch eval randomness matches the
            # non-scan path exactly (metric comparability across modes).
            orig_i = jnp.asarray(np.array([i for i, _ in pairs],
                                          np.int32))
            if training:
                state, ema_params, sums = train_epoch_scan(
                    state, ema_params, loader.dev, sums, mat, epoch_key,
                    decay, mconf, nf)
            else:
                sums = eval_epoch_scan(state.params, loader.dev, mat,
                                       sums, epoch_key, orig_i, mconf, nf)
            n += len(pairs)
            t = float(sums["total"])
            if not np.isfinite(t) or t > 1e9 * n:
                raise RuntimeError(
                    f"criterion error is NaN or > 1e9 (sum {t} at {n})")
            rej = float(sums.get("rejected", 0.0))
            if training and n >= 8 and rej / n > 0.5:
                raise RuntimeError(
                    f"update-reject guard dropped {rej:.0f}/{n} batches "
                    "(>50%): the run has diverged past the "
                    "loss_reject_threshold — aborting the epoch instead "
                    "of silently freezing the params")
            progress(n, n_total, f"err={t / n:.4e}")
        if ema is not None:
            ema["params"] = ema_params
        out = {k: float(v) / max(n, 1) for k, v in sums.items()}
        return state, out, key

    n = 0
    for idx in loader.epoch_indices(max_batches=max_batches):
        n_future = _sample_future(py_rng, mconf, sample_n)
        if training:
            state, ema_params, sums = train_step_fused(
                state, ema_params, loader.dev, sums, jnp.asarray(idx),
                epoch_key, decay, mconf, n_future)
        else:
            sums = eval_step_fused(
                state.params, loader.dev, jnp.asarray(idx), sums,
                epoch_key, jnp.asarray(n), mconf, n_future)
        n += 1
        if n % check_every == 0 or n == n_total:
            t = float(sums["total"])
            if not np.isfinite(t) or t > 1e9 * n:
                raise RuntimeError(
                    f"criterion error is NaN or > 1e9 (sum {t} at {n})")
            progress(n, n_total, f"err={t / n:.4e}")
    if ema is not None:
        ema["params"] = ema_params
    out = {k: float(v) / max(n, 1) for k, v in sums.items()}
    return state, out, key


def _epoch(loader, state, mconf, key, py_rng, training, max_batches=0,
           sample_n=None, ema=None, scan_epoch=False):
    """One pass over the loader. `sample_n()` overrides the horizon
    sampling (epoch curriculum); `ema` is a dict {'params', 'decay'}
    updated in place after every training step."""
    from fluidnet_tpu.utils.pbar import progress
    if isinstance(loader, DeviceDataset):
        return _epoch_fused(loader, state, mconf, key, py_rng, training,
                            max_batches, sample_n, ema,
                            scan_epoch=scan_epoch)
    sums = {}
    n = 0
    n_total = (len(loader.dataset) + loader.batch_size - 1) // \
        loader.batch_size
    if max_batches:
        n_total = min(n_total, max_batches)
    for batch, _ in loader.epoch(max_batches=max_batches):
        jbatch = {k: jnp.asarray(v) for k, v in batch.items()
                  if k in ("p_div", "u_div", "flags", "p_target", "u_target",
                           "density")}
        n_future = _sample_future(py_rng, mconf, sample_n)
        key, sub = jax.random.split(key)
        if training:
            state, terms = train_step(state, jbatch, sub, mconf, n_future)
            if ema is not None:
                ema["params"] = _ema_update(ema["params"], state.params,
                                            ema["decay"])
        else:
            terms = eval_step(jbatch, state.params, sub, mconf, n_future)
        loss = float(terms["total"])
        if not np.isfinite(loss) or loss > 1e9:
            raise RuntimeError(f"criterion error is NaN or > 1e9 ({loss})")
        for k in ("total", "p", "u", "div", "long_term_div"):
            sums[k] = sums.get(k, 0.0) + float(terms[k])
        n += 1
        progress(n, n_total, f"err={loss:.4e}")
    return state, {k: v / max(n, 1) for k, v in sums.items()}, key


from functools import partial


@partial(jax.jit, static_argnames=("mconf", "n_steps"))
def _rollout_div(s0, params, mconf, n_steps):
    """Jitted n-step free rollout -> mean final ||div||_2. Module-level
    jit: a per-call jax.jit(lambda) would leak one compiled executable
    per epoch."""
    from fluidnet_tpu.models.fluidnet import apply_model
    from fluidnet_tpu.ops.divergence import velocity_divergence
    from fluidnet_tpu.sim.simulate import simulate

    def body(carry, _):
        st = simulate(carry, mconf, model_fn=lambda pr, p, u, f:
                      apply_model(pr, mconf, p, u, f), params=params)
        return st, None
    sN, _ = jax.lax.scan(body, s0, None, length=n_steps)
    div = velocity_divergence(sN.u, sN.flags)
    b = div.shape[0]
    return jnp.mean(jnp.sqrt(jnp.sum(div.reshape(b, -1) ** 2, axis=1)))


def _rollout_metric(te_loader, state, mconf, n_steps):
    """Mean final-step ||div|| of an n-step free rollout from the first
    test batch's projected state (calc_stats.lua semantics, miniaturized
    for per-epoch model selection)."""
    from fluidnet_tpu.core.grids import FluidState

    batch, _ = next(iter(te_loader.epoch(max_batches=1)))
    # Prefer the projected (target) state as the rollout seed
    # (calc_stats restarts from GT frames); when the device cache skips
    # targets (div-only losses) seed from the divergent state — the
    # first simulate step projects it, and the metric stays comparable
    # across epochs of the same run.
    u0 = batch.get("u_target", batch["u_div"])
    p0 = batch.get("p_target", batch["p_div"])
    s = FluidState(u=jnp.asarray(u0), p=jnp.asarray(p0),
                   flags=jnp.asarray(batch["flags"]),
                   density=jnp.asarray(batch["density"])
                   if batch.get("density") is not None else None)
    return float(_rollout_div(s, state.params, mconf, n_steps))


def run_training(conf, argv_done=True):
    # Persistent XLA compile cache: chunked training restarts a fresh
    # process every few epochs (host-RSS bound); a warm cache makes the
    # restart recompile nothing. Host-scoped (utils/compile_cache.py)
    # unless the env pins an explicit dir.
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if cache_dir:
        try:
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 1.0)
        except Exception:
            pass
    else:
        from fluidnet_tpu.utils import compile_cache
        compile_cache.enable()
    mconf = conf.new_model
    np.random.seed(conf.seed)
    py_rng = random.Random(conf.seed)
    key = jax.random.PRNGKey(conf.seed)

    # Dataset (self-generate a small one if missing — replaces mantaflow).
    ds_root = os.path.join(conf.data_dir, conf.dataset)
    if not os.path.isdir(ds_root):
        print(f"==> Dataset {ds_root} not found; self-generating with the "
              "PCG solver...")
        generate_dataset(ds_root, n_tr=8, n_te=2, seed=conf.seed,
                         size_xyz=(64, 64, 1), is_3d=False, n_frames=32)
    tr = FluidDataset(conf.data_dir, conf.dataset, "tr",
                      ignore_frames=conf.ignore_frames)
    te = FluidDataset(conf.data_dir, conf.dataset, "te",
                      ignore_frames=conf.ignore_frames)
    mconf = mconf.replace(is_3d=tr.is_3d)
    print(f"==> Dataset: {len(tr)} train / {len(te)} test samples "
          f"({'3-D' if tr.is_3d else '2-D'})")

    os.makedirs(conf.model_dir, exist_ok=True)
    model_path = os.path.join(conf.model_dir, conf.model_filename)

    key, init_key = jax.random.split(key)
    state = init_train_state(init_key, mconf)
    start_epoch = 0
    best_loss = float("inf")
    best_rollout = float("inf")
    if conf.load_model and os.path.isdir(model_path + "_lastEpoch"):
        state, mconf_loaded, extra = load_checkpoint(
            model_path + "_lastEpoch", state)
        if conf.resume_training:
            # Keep training-only params from the fresh conf
            # (torch.copyTrainingMconfParams, model.lua:499-523).
            mconf = mconf_loaded.replace(
                grad_norm_threshold=mconf.grad_norm_threshold,
                loss_reject_threshold=mconf.loss_reject_threshold,
                loss_p_lambda=mconf.loss_p_lambda,
                loss_u_lambda=mconf.loss_u_lambda,
                loss_div_lambda=mconf.loss_div_lambda,
                long_term_div_lambda=mconf.long_term_div_lambda,
                long_term_div_probability=mconf.long_term_div_probability,
                long_term_div_num_steps=mconf.long_term_div_num_steps,
                long_term_grad_mode=mconf.long_term_grad_mode,
                optim=mconf.optim,
                dt=mconf.dt, train_target_source=mconf.train_target_source)
        else:
            mconf = mconf_loaded
        start_epoch = int(extra.get("epoch", 0))
        best_loss = float(extra.get("best_loss", float("inf")))
        # Restore the rollout-selection best too, or a chunked/resumed run
        # would let a worse epoch overwrite <model>_bestRollout.
        best_rollout = float(extra.get("best_rollout", float("inf")))
        print(f"==> Resumed from epoch {start_epoch}")

    save_parameters(conf, model_path + "_conf.json")

    # Startup profiling (fluid_net_train.lua:144-189).
    if conf.profile:
        sizes = (128, 128, 128 if mconf.is_3d else 1)
        flops = model_flops(mconf, sizes)
        peak = model_peak_activation(mconf, sizes)
        sample = tr.get_batch([0])
        from fluidnet_tpu.models.fluidnet import apply_model
        fprop = jax.jit(lambda pr, p, u, f: apply_model(pr, mconf, p, u, f))
        t = profile_fprop(fprop, (state.params, jnp.asarray(sample["p_div"]),
                                  jnp.asarray(sample["u_div"]),
                                  jnp.asarray(sample["flags"])),
                          min_seconds=1.0)
        print(f"==> Model FLOPs/frame @128: {flops:,}; peak activation "
              f"elements: {peak:,}; FPROP {t * 1e3:.3f} ms/batch")

    logger = Logger(model_path + "_log.tsv", LOG_COLUMNS)
    # Target fields ride the device cache only when a p/u loss reads them
    # (solver-sourced targets are recomputed in-graph; div losses never
    # read them) — skipping them nearly doubles the HBM dataset budget.
    need_targets = mconf.loss_p_lambda > 0 or mconf.loss_u_lambda > 0
    cache_keys = ("p_div", "u_div", "flags", "density") + \
        (("p_target", "u_target") if need_targets else ())
    use_dev_cache = conf.device_data_cache and \
        (_dataset_gb(tr, cache_keys) + _dataset_gb(te, cache_keys)) \
        <= conf.device_data_cache_max_gb
    if use_dev_cache:
        print("==> Uploading dataset to device HBM (one-time; batches "
              "become on-device gathers)")
        tr_loader = DeviceDataset(tr, conf.batch_size, keys=cache_keys,
                                  shuffle=True, seed=conf.seed)
        te_loader = DeviceDataset(te, conf.batch_size, keys=cache_keys,
                                  shuffle=False)
        tr.release_cache()   # batches are on-device gathers from here;
        te.release_cache()   # the host frame cache is ~20 GB dead weight
    else:
        tr_loader = PrefetchLoader(tr, conf.batch_size,
                                   conf.num_data_threads,
                                   shuffle=True, seed=conf.seed)
        te_loader = PrefetchLoader(te, conf.batch_size,
                                   conf.num_data_threads, shuffle=False)
    max_batches = (conf.max_samples_per_epoch // conf.batch_size
                   if conf.max_samples_per_epoch else 0)

    def _rss_gb():
        try:
            with open("/proc/self/status") as f:
                for ln in f:
                    if ln.startswith("VmRSS"):
                        return int(ln.split()[1]) / 1e6
        except OSError:
            pass
        return float("nan")

    def _malloc_trim():
        """Return freed-but-retained glibc heap to the kernel. Diagnostic
        for the ~200 MB/step host RSS growth (the remote-TPU PJRT client
        is native): if RSS drops here, the 'leak' is heap retention /
        fragmentation, not live allocations."""
        try:
            import ctypes
            ctypes.CDLL("libc.so.6").malloc_trim(0)
            return True
        except OSError:
            return False

    # EMA of the params for rollout selection (conf.ema_decay > 0):
    # persisted each epoch to <model>_ema so chunked/resumed training
    # keeps its average.
    ema = None
    if conf.ema_decay > 0:
        # Copy: the fused step donates params and ema_params separately;
        # aliasing them (fresh start) is a double-donation error.
        ema = {"params": jax.tree_util.tree_map(jnp.copy, state.params),
               "decay": float(conf.ema_decay)}
        if conf.load_model and os.path.isdir(model_path + "_ema"):
            ema_state, _, _ = load_checkpoint(model_path + "_ema", state)
            ema["params"] = ema_state.params

    def _sample_n_for(epoch):
        """Horizon curriculum (conf.horizon_schedule): the active
        (epoch_at, lo, hi) triple, sampled with the reference's
        probability split (run_epoch.lua:254-257)."""
        if not conf.horizon_schedule:
            return None
        lo, hi = mconf.long_term_div_num_steps
        for ep_at, l, h in conf.horizon_schedule:
            if epoch >= ep_at:
                lo, hi = int(l), int(h)
        def sample():
            if py_rng.random() <= mconf.long_term_div_probability:
                return lo
            return hi
        # Metadata for the scan path's deterministic horizon counts
        # (_horizon_list): stable group shapes across epochs.
        sample.lo, sample.hi = lo, hi
        sample.p = mconf.long_term_div_probability
        return sample

    base_lr = mconf.optim.learning_rate
    prev_lr = None
    t_start = time.time()
    for epoch in range(start_epoch, conf.max_epochs):
        if conf.max_wall_s and epoch > start_epoch and \
                time.time() - t_start > conf.max_wall_s:
            # Graceful wall-clock boundary (same contract as the RSS cap
            # below): everything through epoch-1 is checkpointed; exit 0
            # so a driver can resume — never SIGTERM a mid-step process
            # on the remote TPU (it wedges the tunnel, docs/STATUS.md).
            print(f"==> wall clock {time.time() - t_start:.0f}s > "
                  f"max_wall_s {conf.max_wall_s:.0f}; exiting cleanly "
                  f"at epoch {epoch}")
            return state, mconf
        import gc
        gc.collect()
        rss = _rss_gb()
        if rss > 8.0 and _malloc_trim():
            rss_t = _rss_gb()
            print(f"    [host RSS {rss:.1f} GB -> {rss_t:.1f} GB "
                  f"after malloc_trim]")
            rss = rss_t
        else:
            print(f"    [host RSS {rss:.1f} GB]")
        if conf.max_host_rss_gb and epoch > start_epoch and \
                rss > conf.max_host_rss_gb:
            # Graceful chunk boundary: everything through epoch-1 is
            # already checkpointed (_lastEpoch/_ema/_bestRollout), so a
            # clean exit here loses nothing; the chunked driver restarts
            # a fresh process that resumes. Never let the kernel
            # OOM-killer do this — it wedges the TPU tunnel (round-3
            # post-mortem, docs/STATUS.md).
            print(f"==> host RSS {rss:.1f} GB > max_host_rss_gb "
                  f"{conf.max_host_rss_gb}; exiting for chunk restart "
                  f"at epoch {epoch}")
            return state, mconf
        # lrEpochMults (run_epoch.lua:40-48); computed from scratch each
        # epoch so resume replays every past multiplier.
        lr = base_lr
        for ep_at, mult in conf.lr_epoch_mults:
            if epoch >= ep_at:
                lr *= mult
        if lr != prev_lr:
            state = set_learning_rate(state, lr)
            if prev_lr is not None:
                print(f"==> LR -> {lr}")
            prev_lr = lr
        t0 = time.time()
        if conf.train:
            state, tr_m, key = _epoch(tr_loader, state, mconf, key, py_rng,
                                      True, max_batches,
                                      sample_n=_sample_n_for(epoch),
                                      ema=ema, scan_epoch=conf.epoch_scan)
        else:
            tr_m = {k: 0.0 for k in ("total", "p", "u", "div",
                                     "long_term_div")}
        te_m = tr_m
        if conf.eval_during_training:
            _, te_m, key = _epoch(te_loader, state, mconf, key, py_rng,
                                  False, max_batches,
                                  scan_epoch=conf.epoch_scan)
        rollout_div = float("nan")
        if conf.rollout_select_steps and conf.eval_during_training and \
                mconf.sim_method == "convnet":
            sel_state = state if ema is None else \
                state.__class__(params=ema["params"],
                                opt_state=state.opt_state, step=state.step)
            rollout_div = _rollout_metric(te_loader, sel_state, mconf,
                                          conf.rollout_select_steps)
            if rollout_div < best_rollout:
                best_rollout = rollout_div
                save_checkpoint(model_path + "_bestRollout", sel_state,
                                mconf, {"epoch": epoch + 1,
                                        "rollout_div": rollout_div,
                                        "ema": ema is not None})
            if ema is not None:
                save_checkpoint(model_path + "_ema", sel_state, mconf,
                                {"epoch": epoch + 1})
        dt_ep = time.time() - t0
        rej = tr_m.get("rejected", 0.0)
        print(f"epoch {epoch}: train {tr_m['total']:.4e} "
              f"(div {tr_m['div']:.4e}, lt {tr_m['long_term_div']:.4e}) | "
              f"test {te_m['total']:.4e} | rollout||div|| "
              f"{rollout_div:.3e} | {dt_ep:.1f}s"
              + (f" | REJECTED {rej:.1%} of updates" if rej > 0 else ""))
        logger.add([epoch, tr_m["total"], tr_m["p"], tr_m["u"], tr_m["div"],
                    tr_m["long_term_div"], te_m["total"], te_m["p"],
                    te_m["u"], te_m["div"], te_m["long_term_div"]])
        extra = {"epoch": epoch + 1, "best_loss": best_loss,
                 "best_rollout": best_rollout}
        save_checkpoint(model_path + "_lastEpoch", state, mconf, extra)
        if te_m["total"] < best_loss:
            best_loss = te_m["total"]
            extra["best_loss"] = best_loss
            save_checkpoint(model_path, state, mconf, extra)
            print(f"    - new best test loss {best_loss:.4e}; saved "
                  f"{model_path}")
    return state, mconf


def main(argv=None):
    conf = parse_args(default_conf(), argv if argv is not None
                      else sys.argv[1:])
    run_training(conf)


if __name__ == "__main__":
    main()
