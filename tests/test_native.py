"""Native C++ runtime tests: build, flood fill vs the on-device label
propagation, binvox RLE vs NumPy, threaded frame reader vs manta_io."""

import numpy as np
import pytest

import jax.numpy as jnp

from fluidnet_tpu.core.grids import empty_domain
from fluidnet_tpu.native import (binvox_decode_native, build_native,
                                 flood_fill_native, get_lib,
                                 read_manta_frames_native)
from fluidnet_tpu.solvers.components import connected_components

pytestmark = pytest.mark.skipif(get_lib() is None,
                                reason="native toolchain unavailable")


def test_flood_fill_matches_label_propagation():
    rng = np.random.default_rng(70)
    B, Z, Y, X = 2, 1, 12, 12
    flags = np.asarray(empty_domain((B, 1, Z, Y, X), False)).copy()
    flags[..., :, 6] = 2  # split into two components
    flags[0, 0, 0, 3, 3] = 2
    labels, n, sizes = flood_fill_native(flags)
    assert n == 4  # two components per batch sample
    # Compare component structure against the on-device version.
    dev = np.asarray(connected_components(jnp.asarray(flags)))
    for b in range(B):
        fl = (flags[b, 0] & 1) > 0
        a = labels[b, 0][fl]
        d = dev[b, 0][fl]
        # Same partition: bijection between label sets.
        pairs = set(zip(a.tolist(), d.tolist()))
        assert len(pairs) == len(set(x for x, _ in pairs))
        assert len(pairs) == len(set(y for _, y in pairs))
    assert labels[0, 0, 0, 0, 0] == -1  # obstacle border unlabeled
    assert int(sizes.sum()) == int(((flags & 1) > 0).sum())


def test_binvox_decode_native_matches_numpy():
    rng = np.random.default_rng(71)
    n = 1000
    flat = (rng.random(n) < 0.3).astype(np.uint8)
    # RLE encode.
    rle = []
    i = 0
    while i < n:
        v = flat[i]
        run = 1
        while i + run < n and flat[i + run] == v and run < 255:
            run += 1
        rle += [int(v), run]
        i += run
    out = binvox_decode_native(bytes(rle), n)
    np.testing.assert_array_equal(out, flat)


def test_dataset_uses_native_reader(tmp_path, monkeypatch):
    """FluidDataset primes its cache through the native batched reader;
    the batch must equal the pure-NumPy path bit for bit."""
    from fluidnet_tpu.data.dataset import FluidDataset
    from fluidnet_tpu.data.manta_io import frame_name, save_manta_file
    rng = np.random.default_rng(73)
    Z, Y, X = 1, 8, 8
    run = tmp_path / "ds" / "tr" / "run0"
    run.mkdir(parents=True)
    for i in range(4):
        for divergent in (False, True):
            p = rng.standard_normal((1, 1, Z, Y, X)).astype(np.float32)
            u = np.zeros((1, 2, Z, Y, X), np.float32)
            flags = np.asarray(empty_domain((1, 1, Z, Y, X), False),
                               np.int32)
            rho = rng.random((1, 1, Z, Y, X)).astype(np.float32)
            save_manta_file(str(run / frame_name(i, divergent)), p, u,
                            flags, rho)
    ds_native = FluidDataset(str(tmp_path), "ds", "tr")
    native_batch = ds_native.get_batch([0, 2, 3])
    assert len(ds_native.cache) >= 3  # primed by the native reader
    ds_plain = FluidDataset(str(tmp_path), "ds", "tr")
    monkeypatch.setattr(ds_plain, "_prime_cache_native",
                        lambda keys: None)
    plain_batch = ds_plain.get_batch([0, 2, 3])
    for k in native_batch:
        np.testing.assert_array_equal(native_batch[k], plain_batch[k])


def test_threaded_frame_reader(tmp_path):
    from fluidnet_tpu.data.manta_io import load_manta_file, save_manta_file
    rng = np.random.default_rng(72)
    Z, Y, X = 4, 6, 5
    paths = []
    wants = []
    for i in range(6):
        p = rng.standard_normal((1, 1, Z, Y, X)).astype(np.float32)
        u = rng.standard_normal((1, 3, Z, Y, X)).astype(np.float32)
        flags = rng.integers(1, 3, (1, 1, Z, Y, X)).astype(np.int32)
        rho = rng.random((1, 1, Z, Y, X)).astype(np.float32)
        path = str(tmp_path / f"f{i}.bin")
        save_manta_file(path, p, u, flags, rho)
        paths.append(path)
        wants.append((p, u, flags, rho))
    out = read_manta_frames_native(paths, Z, Y, X, is_3d=True, n_threads=3)
    for i, (p, u, flags, rho) in enumerate(wants):
        np.testing.assert_array_equal(out["u_div_or_target"][i], u[0])
        np.testing.assert_array_equal(out["p"][i], p[0])
        np.testing.assert_array_equal(out["flags"][i], flags[0])
        np.testing.assert_array_equal(out["density"][i], rho[0])
