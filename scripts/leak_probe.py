"""Host-RSS leak bisection (round-3 incident: ~100 MB/step growth OOM-killed
the v4 training run at 122 GB RSS and wedged the TPU tunnel).

Runs the exact training step loop (DeviceDataset gathers + train_step) on
the real backend and prints RSS + tracemalloc deltas every N steps, with
switches to isolate the suspects:

  --no-metrics     skip float(terms[...]) materialization (device->host)
  --no-gather      reuse ONE device batch every step (no on-device gathers)
  --static-key     reuse one PRNG key (no per-step key splits)
  --steps N        number of steps (default 200)

Usage: python scripts/leak_probe.py [--no-metrics] [--no-gather] ...
"""
import argparse
import gc
import os
import sys
import time
import tracemalloc

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def rss_mb():
    with open("/proc/self/status") as f:
        for ln in f:
            if ln.startswith("VmRSS"):
                return int(ln.split()[1]) / 1e3
    return float("nan")


def _run_fused(args, loader, state, key, mconf):
    """One async dispatch per batch; metrics read once per `--every`."""
    import jax.numpy as jnp
    from fluidnet_tpu.train.train import metric_sums_init, train_step_fused

    sums = metric_sums_init()
    ema = state.params
    decay = jnp.asarray(0.999)
    t0 = time.time()
    n = 0
    rss_hist = []
    it = iter(loader.epoch_indices())
    while n < args.steps:
        try:
            idx = next(it)
        except StopIteration:
            it = iter(loader.epoch_indices())
            idx = next(it)
        state, ema, sums = train_step_fused(
            state, ema, loader.dev, sums, jnp.asarray(idx), key, decay,
            mconf, args.n_future)
        n += 1
        if n % args.every == 0:
            t = float(sums["total"])
            assert np.isfinite(t), f"NaN at step {n}"
            gc.collect()
            r = rss_mb()
            rss_hist.append(r)
            print(f"step {n:4d}  RSS {r:8.0f} MB  "
                  f"{(time.time() - t0) / n * 1e3:6.1f} ms/step  "
                  f"loss-avg {t / n:.3e}", flush=True)
    if len(rss_hist) >= 2:
        drift = (rss_hist[-1] - rss_hist[0]) / \
            (args.steps - args.every) * 1000
        print(f"RSS drift: {drift:.1f} MB / 1k steps", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--every", type=int, default=20)
    ap.add_argument("--no-metrics", action="store_true")
    ap.add_argument("--no-gather", action="store_true")
    ap.add_argument("--static-key", action="store_true")
    ap.add_argument("--fused", action="store_true",
                    help="drive train_step_fused (one dispatch per batch)")
    ap.add_argument("--n-future", type=int, default=1)
    ap.add_argument("--dataset", default="gen3d_v5")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--max-samples", type=int, default=256,
                    help="HBM upload budget (samples)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from fluidnet_tpu.core.config import ModelConfig
    from fluidnet_tpu.data.dataset import DeviceDataset, FluidDataset
    from fluidnet_tpu.train.train import init_train_state, train_step

    mconf = ModelConfig(
        is_3d=True, advection_method="maccormackOurs",
        adaptive_window=False, advection_window=1,
        long_term_div_lambda=1.0, loss_div_lambda=1.0,
        long_term_div_num_steps=(args.n_future, args.n_future))

    ds = FluidDataset("data/datasets", args.dataset, "tr")
    ds.samples = ds.samples[:args.max_samples]
    loader = DeviceDataset(ds, args.batch, keys=("p_div", "u_div", "flags",
                                                 "density"),
                           shuffle=True, seed=0)
    ds.release_cache()
    print(f"uploaded {args.max_samples} samples; RSS {rss_mb():.0f} MB",
          flush=True)

    state = init_train_state(jax.random.PRNGKey(0), mconf)
    key = jax.random.PRNGKey(1)

    if args.fused:
        _run_fused(args, loader, state, key, mconf)
        return

    batches = loader.epoch()
    fixed = next(batches)[0] if args.no_gather else None

    tracemalloc.start(10)
    snap0 = None
    t0 = time.time()
    n = 0
    rss_hist = []
    while n < args.steps:
        if args.no_gather:
            batch = fixed
        else:
            try:
                batch, _ = next(batches)
            except StopIteration:
                batches = loader.epoch()
                batch, _ = next(batches)
        if not args.static_key:
            key, sub = jax.random.split(key)
        else:
            sub = key
        state, terms = train_step(state, batch, sub, mconf, args.n_future)
        if not args.no_metrics:
            loss = float(terms["total"])
            assert np.isfinite(loss)
        n += 1
        if n % args.every == 0:
            gc.collect()
            r = rss_mb()
            rss_hist.append(r)
            snap = tracemalloc.take_snapshot()
            py_mb = sum(s.size for s in snap.statistics("filename")) / 1e6
            line = (f"step {n:4d}  RSS {r:8.0f} MB  pyheap {py_mb:7.1f} MB  "
                    f"{(time.time() - t0) / n * 1e3:6.1f} ms/step")
            if snap0 is not None:
                top = snap.compare_to(snap0, "lineno")[:3]
                line += "  top-growth: " + "; ".join(
                    f"{t.traceback[0].filename.split('/')[-1]}:"
                    f"{t.traceback[0].lineno}+{t.size_diff / 1e6:.1f}MB"
                    for t in top)
            else:
                snap0 = snap
            print(line, flush=True)
    if len(rss_hist) >= 2:
        drift = (rss_hist[-1] - rss_hist[0]) / \
            (args.steps - args.every) * 1000
        print(f"RSS drift: {drift:.1f} MB / 1k steps", flush=True)


if __name__ == "__main__":
    main()
