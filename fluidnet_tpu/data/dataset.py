"""Dataset: paired divergent/corrected frames + async prefetch.

Port of torch.DataBinary (torch/lib/data_binary.lua) and torch.DataParallel
(torch/lib/data_parallel.lua):

  - scans  <data_dir>/<dataset>/{tr,te}/<run>/NNNNNN.bin (+ _divergent.bin)
  - drops runs whose target divergence exceeds 1e-2 (data_binary.lua:29,
    126-134)
  - a sample is a (run, frame) pair; batches carry
    {p_div, u_div, density, flags, p_target, u_target, density_target}
  - PrefetchLoader: a thread pool assembles batches ahead of the training
    loop (the reference needed 8 threads to hide disk IO, README.md:74).

Frames are memory-cached after first read (the reference caches processed
frames to disk, data_binary.lua:190-228; RAM is the simpler equivalent at
these sizes — a 128^2 2-D frame is ~400 KB).
"""

import os
import queue
import threading

import numpy as np

from fluidnet_tpu.data.manta_io import load_manta_file
from fluidnet_tpu.ops.divergence import velocity_divergence

DIV_SCREEN_THRESHOLD = 1e-2  # data_binary.lua:29


class FluidDataset:
    def __init__(self, data_dir, dataset, split="tr", ignore_frames=0,
                 screen_divergent_runs=True, cache=True, disk_cache=False,
                 disk_cache_compress=False):
        """disk_cache: persist each processed (target, divergent) sample
        pair to <run>/__cache__/<frame>.npz on first read and load from
        there afterwards — the reference's per-frame processed-frame cache
        (data_binary.lua:190-228). disk_cache_compress swaps in zlib
        compression (np.savez_compressed), the stand-in for the
        reference's optional ZFP path (data_binary.lua:27-28,218-220);
        fluid fields compress ~2-3x losslessly."""
        self.root = os.path.join(data_dir, dataset, split)
        if not os.path.isdir(self.root):
            raise FileNotFoundError(self.root)
        self.cache = {} if cache else None
        self.disk_cache = disk_cache
        self.disk_cache_compress = disk_cache_compress
        self.samples = []  # list of (run_dir, frame_base_path)
        self.is_3d = None

        runs = sorted(d for d in os.listdir(self.root)
                      if os.path.isdir(os.path.join(self.root, d)))
        for run in runs:
            rd = os.path.join(self.root, run)
            frames = sorted(f for f in os.listdir(rd)
                            if f.endswith(".bin") and
                            not f.endswith("_divergent.bin"))
            frames = frames[ignore_frames:]
            if not frames:
                continue
            if screen_divergent_runs and self._run_diverged(rd, frames):
                continue
            for f in frames:
                div_f = f[:-4] + "_divergent.bin"
                if os.path.exists(os.path.join(rd, div_f)):
                    self.samples.append((rd, f))
        if not self.samples:
            raise RuntimeError(f"no samples found under {self.root}")
        first = self._load(*self.samples[0])
        self.is_3d = first["is_3d"]
        self.shape_zyx = first["p_div"].shape[2:]

    def _run_diverged(self, run_dir, frames):
        """Screens runs whose TARGET field still has large divergence
        (data_binary.lua:126-134). Only the last frame is checked — if the
        solve diverged it diverged at the end."""
        import jax.numpy as jnp
        d = load_manta_file(os.path.join(run_dir, frames[-1]))
        div = velocity_divergence(jnp.asarray(d["U"]), jnp.asarray(d["flags"]))
        return float(abs(np.asarray(div)).max()) > DIV_SCREEN_THRESHOLD

    def _disk_cache_path(self, run_dir, fname):
        return os.path.join(run_dir, "__cache__", fname[:-4] + ".npz")

    def _load(self, run_dir, fname):
        key = (run_dir, fname)
        if self.cache is not None and key in self.cache:
            return self.cache[key]
        sample = None
        if self.disk_cache:
            cpath = self._disk_cache_path(run_dir, fname)
            if os.path.exists(cpath):
                try:
                    with np.load(cpath) as z:
                        sample = {k: z[k] for k in z.files
                                  if k != "is_3d"}
                        sample["is_3d"] = bool(z["is_3d"])
                except Exception:
                    sample = None    # corrupt cache entry: re-derive
        if sample is None:
            tgt = load_manta_file(os.path.join(run_dir, fname))
            div = load_manta_file(
                os.path.join(run_dir, fname[:-4] + "_divergent.bin"))
            sample = {
                "p_div": div["p"], "u_div": div["U"],
                "density": div["density"],
                "flags": tgt["flags"],
                "p_target": tgt["p"], "u_target": tgt["U"],
                "density_target": tgt["density"],
                "is_3d": tgt["is_3d"],
            }
            if self.disk_cache:
                cpath = self._disk_cache_path(run_dir, fname)
                os.makedirs(os.path.dirname(cpath), exist_ok=True)
                save = np.savez_compressed if self.disk_cache_compress \
                    else np.savez
                tmp = cpath + ".tmp.npz"   # atomic publish (threaded reads)
                save(tmp, **sample)
                os.replace(tmp, cpath)
        if self.cache is not None:
            self.cache[key] = sample
        return sample

    def field_stats(self, fields=("p_div", "u_div", "density"),
                    max_samples=64):
        """Per-field mean/std/min/max over (up to) max_samples samples —
        the reference's dataset statistics pass (data_binary.lua:265-354).
        Returns {field: {mean, std, min, max}}."""
        n = min(len(self), max_samples)
        step = max(1, len(self) // n)
        acc = {f: [] for f in fields}
        for i in range(0, len(self), step):
            it = self._load(*self.samples[i])
            for f in fields:
                acc[f].append(np.asarray(it[f], np.float64))
        out = {}
        for f, arrs in acc.items():
            a = np.stack(arrs)
            out[f] = {"mean": float(a.mean()), "std": float(a.std()),
                      "min": float(a.min()), "max": float(a.max())}
        return out

    def histogram(self, field="u_div", bins=64, value_range=None,
                  max_samples=64):
        """Histogram of a field's values over the dataset
        (data_binary.lua:467-556's gnuplot histograms, sans gnuplot).
        Returns (counts, bin_edges); plot with utils.plots.plot_histogram.
        """
        n = min(len(self), max_samples)
        step = max(1, len(self) // n)
        vals = [np.asarray(self._load(*self.samples[i])[field]).ravel()
                for i in range(0, len(self), step)]
        return np.histogram(np.concatenate(vals), bins=bins,
                            range=value_range)

    def __len__(self):
        return len(self.samples)

    def _prime_cache_native(self, keys):
        """Reads all uncached frames of a batch with the native threaded
        reader (one fread + reinterpret per file, N files in parallel) —
        the TPU-side equivalent of DataParallel's worker reads
        (data_parallel.lua:63-194). Falls back silently (callers re-read
        via the NumPy path) when the library is unavailable."""
        if self.cache is None:
            return
        missing = [k for k in keys if k not in self.cache]
        if not missing:
            return
        try:
            from fluidnet_tpu.native import read_manta_frames_native
        except Exception:
            return
        Z, Y, X = self.shape_zyx
        paths = []
        for rd, fname in missing:
            paths.append(os.path.join(rd, fname))
            paths.append(os.path.join(rd, fname[:-4] + "_divergent.bin"))
        try:
            out = read_manta_frames_native(paths, Z, Y, X, self.is_3d)
        except Exception:
            out = None
        if out is None:
            return
        for i, key in enumerate(missing):
            ti, di = 2 * i, 2 * i + 1
            # np.copy: caching slice VIEWS would pin the whole batch-read
            # buffer per sample (~16x the bytes) for the cache's lifetime.
            self.cache[key] = {
                "p_div": np.copy(out["p"][di:di + 1]),
                "u_div": np.copy(out["u_div_or_target"][di:di + 1]),
                "density": np.copy(out["density"][di:di + 1]),
                "flags": np.copy(out["flags"][ti:ti + 1]),
                "p_target": np.copy(out["p"][ti:ti + 1]),
                "u_target": np.copy(out["u_div_or_target"][ti:ti + 1]),
                "density_target": np.copy(out["density"][ti:ti + 1]),
                "is_3d": self.is_3d,
            }

    def release_cache(self):
        """Frees the host RAM frame cache (~12 MB/sample) AND disables
        caching. Call after a DeviceDataset upload — batches are on-device
        gathers from then on, and on this host RAM is the
        training-stability budget (the v4 run was OOM-killed at 122 GB
        RSS). Caching stays off so a later stray get_batch cannot silently
        repopulate the cache; reads still work (straight from disk)."""
        self.cache = None

    def get_batch(self, indices):
        """Assembles a batch dict of stacked numpy arrays
        (AllocateBatchMemory/CreateBatch, data_binary.lua:356-453)."""
        keys = [self.samples[i] for i in indices]
        self._prime_cache_native(keys)
        items = [self._load(*self.samples[i]) for i in indices]
        batch = {}
        for k in ("p_div", "u_div", "density", "flags", "p_target",
                  "u_target", "density_target"):
            batch[k] = np.concatenate([it[k] for it in items], axis=0)
        return batch


class DeviceDataset:
    """Device-resident dataset: uploads every sample to accelerator HBM
    once and assembles batches with on-device gathers (jnp.take).

    The reference streams batches host->GPU each step
    (torch.syncBatchToGPU, run_epoch.lua:131) over PCIe; on a
    remote-attached TPU the host->device link can be the training
    bottleneck (measured 8 MB/s through the tunnel vs ~15 MB/batch), so
    paying one bulk upload and gathering on-device turns the data path
    into pure HBM traffic. Exposes the PrefetchLoader epoch interface.
    """

    def __init__(self, dataset, batch_size, keys=("p_div", "u_div", "flags",
                                                  "p_target", "u_target",
                                                  "density"),
                 shuffle=True, seed=0, upload_chunk=32):
        import jax.numpy as jnp
        import jax
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.rng = np.random.default_rng(seed)
        n = len(dataset)
        first = dataset.get_batch([0])
        keys = [k for k in keys if k in first]
        # Fill one preallocated buffer per field with donated updates so
        # peak HBM stays at dataset size + one chunk (a concatenate of
        # chunks would double it).
        upd = jax.jit(
            lambda buf, c, lo: jax.lax.dynamic_update_slice(
                buf, c, (lo,) + (0,) * (c.ndim - 1)),
            donate_argnums=0)
        self.dev = {k: jnp.zeros((n,) + first[k].shape[1:],
                                 jnp.asarray(first[k]).dtype)
                    for k in keys}
        for lo in range(0, n, upload_chunk):
            idx = list(range(lo, min(lo + upload_chunk, n)))
            host = dataset.get_batch(idx)
            for k in keys:
                self.dev[k] = upd(self.dev[k], jnp.asarray(host[k]),
                                  jnp.asarray(lo))

    def epoch_indices(self, drop_last=False, max_batches=0):
        """Yields per-batch index arrays only — for the fused epoch path,
        which gathers on device inside the training-step jit (one host
        dispatch per batch instead of one per field + one per step)."""
        n = self.dev[next(iter(self.dev))].shape[0]
        order = self.rng.permutation(n) if self.shuffle else np.arange(n)
        chunks = [order[i:i + self.batch_size]
                  for i in range(0, n, self.batch_size)]
        if drop_last:
            chunks = [c for c in chunks if len(c) == self.batch_size]
        if max_batches:
            chunks = chunks[:max_batches]
        yield from chunks

    def epoch(self, drop_last=False, max_batches=0):
        import jax.numpy as jnp
        for c in self.epoch_indices(drop_last, max_batches):
            idx = jnp.asarray(c)
            yield {k: jnp.take(v, idx, axis=0)
                   for k, v in self.dev.items()}, c


class PrefetchLoader:
    """Threaded batch prefetcher over a dataset with get_batch(indices).

    Equivalent of torch.DataParallel (data_parallel.lua:49-194): batches
    complete out of order; every sample is delivered exactly once per epoch.
    """

    def __init__(self, dataset, batch_size, num_threads=8, shuffle=True,
                 seed=0, depth=4):
        self.dataset = dataset
        self.batch_size = batch_size
        self.num_threads = max(1, num_threads)
        self.shuffle = shuffle
        self.rng = np.random.default_rng(seed)
        self.depth = depth

    def epoch(self, drop_last=False, max_batches=0):
        """Yields (batch, indices) for one pass over the dataset.

        max_batches truncates the epoch (conf.maxSamplesPerEpoch,
        default_conf.lua:41) — bounded here so worker threads never block
        on an abandoned generator."""
        n = len(self.dataset)
        order = self.rng.permutation(n) if self.shuffle else np.arange(n)
        chunks = [order[i:i + self.batch_size]
                  for i in range(0, n, self.batch_size)]
        if drop_last:
            chunks = [c for c in chunks if len(c) == self.batch_size]
        if max_batches:
            chunks = chunks[:max_batches]

        out_q = queue.Queue(maxsize=self.depth)
        in_q = queue.Queue()
        for c in chunks:
            in_q.put(c)

        def worker():
            while True:
                try:
                    idx = in_q.get_nowait()
                except queue.Empty:
                    return
                out_q.put((self.dataset.get_batch(idx), idx))

        threads = [threading.Thread(target=worker, daemon=True)
                   for _ in range(self.num_threads)]
        for t in threads:
            t.start()
        seen = set()
        for _ in range(len(chunks)):
            batch, idx = out_q.get()
            for i in idx:
                # Double-count guard (run_epoch.lua:124-127).
                assert int(i) not in seen, "double-counted sample!"
                seen.add(int(i))
            yield batch, idx
        for t in threads:
            t.join()
