"""Data pipeline + IO tests: manta format roundtrip, self-generated
dataset, dataset scan + prefetch loader, vbox/binvox/obj/voxel utils."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from fluidnet_tpu.data.dataset import FluidDataset, PrefetchLoader
from fluidnet_tpu.data.generate import (divergence_free_noise,
                                        generate_dataset, generate_run)
from fluidnet_tpu.data.manta_io import (load_manta_file, parse_manta_bytes,
                                        save_manta_file)
from fluidnet_tpu.io.binvox import load_binvox
from fluidnet_tpu.io.obj_export import export_obstacles_obj
from fluidnet_tpu.io.vbox import VboxWriter, read_vbox
from fluidnet_tpu.io.voxel_utils import (bounding_box, flip_diagonal,
                                         pad_voxels_to_dims)


def test_manta_roundtrip(tmp_path):
    rng = np.random.default_rng(60)
    p = rng.standard_normal((1, 1, 4, 6, 5)).astype(np.float32)
    u = rng.standard_normal((1, 3, 4, 6, 5)).astype(np.float32)
    flags = rng.integers(1, 3, (1, 1, 4, 6, 5)).astype(np.int32)
    rho = rng.random((1, 1, 4, 6, 5)).astype(np.float32)
    path = str(tmp_path / "frame.bin")
    save_manta_file(path, p, u, flags, rho)
    out = load_manta_file(path)
    assert out["is_3d"]
    np.testing.assert_array_equal(out["p"], p)
    np.testing.assert_array_equal(out["U"], u)
    np.testing.assert_array_equal(out["flags"], flags)
    np.testing.assert_array_equal(out["density"], rho)


def test_divergence_free_noise():
    rng = np.random.default_rng(61)
    u = divergence_free_noise(rng, (1, 32, 32), is_3d=False)
    assert u.shape == (1, 2, 1, 32, 32)
    # Central-difference divergence of curl(psi) vanishes in the interior.
    div = (np.gradient(u[0, 0, 0], axis=1) + np.gradient(u[0, 1, 0], axis=0))
    assert np.abs(div[4:-4, 4:-4]).max() < 0.05 * np.abs(u).max()


def test_generate_and_load_dataset(tmp_path):
    root = str(tmp_path / "ds")
    generate_dataset(root, n_tr=1, n_te=1, seed=0, size_xyz=(16, 16, 1),
                     is_3d=False, n_frames=3, max_iter=60)
    ds = FluidDataset(str(tmp_path), "ds", "tr")
    assert len(ds) == 3
    assert not ds.is_3d
    batch = ds.get_batch([0, 1])
    for k in ("p_div", "u_div", "flags", "p_target", "u_target", "density"):
        assert batch[k].shape[0] == 2, k
    # Targets should be closer to divergence-free than inputs.
    from fluidnet_tpu.ops.divergence import velocity_divergence
    d_in = velocity_divergence(jnp.asarray(batch["u_div"]),
                               jnp.asarray(batch["flags"]))
    d_t = velocity_divergence(jnp.asarray(batch["u_target"]),
                              jnp.asarray(batch["flags"]))
    assert float(jnp.abs(d_t).max()) < float(jnp.abs(d_in).max())
    assert float(jnp.abs(d_t).max()) < 1e-3


def test_disk_cache_roundtrip_and_stats(tmp_path):
    """Per-frame processed disk cache (data_binary.lua:190-228) with the
    zlib-compressed variant (:27-28), plus the dataset stats/histogram
    helpers (:265-354,467-556)."""
    import os
    root = str(tmp_path / "ds")
    generate_dataset(root, n_tr=1, n_te=0, seed=3, size_xyz=(16, 16, 1),
                     is_3d=False, n_frames=3, max_iter=40)
    ref = FluidDataset(str(tmp_path), "ds", "tr", cache=False)
    b_ref = ref.get_batch([0, 1, 2])

    for compress in (False, True):
        # First pass writes the cache files, second pass reads them.
        ds1 = FluidDataset(str(tmp_path), "ds", "tr", cache=False,
                           disk_cache=True, disk_cache_compress=compress)
        _ = ds1.get_batch([0, 1, 2])
        run_dir = ds1.samples[0][0]
        cdir = os.path.join(run_dir, "__cache__")
        assert len([f for f in os.listdir(cdir) if f.endswith(".npz")]) == 3
        ds2 = FluidDataset(str(tmp_path), "ds", "tr", cache=False,
                           disk_cache=True, disk_cache_compress=compress)
        b2 = ds2.get_batch([0, 1, 2])
        for k in ("p_div", "u_div", "flags", "p_target", "u_target",
                  "density"):
            np.testing.assert_array_equal(b2[k], b_ref[k])

    st = ref.field_stats()
    assert set(st) == {"p_div", "u_div", "density"}
    assert all(np.isfinite(list(v.values())).all() for v in st.values())
    counts, edges = ref.histogram("u_div", bins=16)
    assert counts.sum() == 3 * 2 * 16 * 16  # 3 frames x 2 comps x 16^2
    from fluidnet_tpu.utils.plots import plot_histogram
    out = plot_histogram(counts, edges, str(tmp_path / "h.png"), "u_div")
    assert os.path.getsize(out) > 0


def test_prefetch_loader_delivers_every_sample_once(tmp_path):
    """The torch.DataParallel invariant (test_data_parallel.lua:37-60)."""
    root = str(tmp_path / "ds")
    generate_dataset(root, n_tr=1, n_te=0, seed=1, size_xyz=(16, 16, 1),
                     is_3d=False, n_frames=7, max_iter=40)
    ds = FluidDataset(str(tmp_path), "ds", "tr")
    loader = PrefetchLoader(ds, batch_size=2, num_threads=3, seed=0)
    seen = []
    for batch, idx in loader.epoch():
        assert batch["p_div"].shape[0] == len(idx)
        seen.extend(int(i) for i in idx)
    assert sorted(seen) == list(range(len(ds)))


def test_device_dataset_matches_host_loader(tmp_path):
    """DeviceDataset (HBM-resident batches for slow host->device links)
    yields the same batches as the host path, every sample once."""
    from fluidnet_tpu.data.dataset import DeviceDataset
    root = str(tmp_path / "ds")
    generate_dataset(root, n_tr=1, n_te=0, seed=1, size_xyz=(16, 16, 1),
                     is_3d=False, n_frames=7, max_iter=40)
    ds = FluidDataset(str(tmp_path), "ds", "tr")
    dev = DeviceDataset(ds, batch_size=3, shuffle=False, upload_chunk=2)
    seen = []
    for batch, idx in dev.epoch():
        host = ds.get_batch(list(idx))
        for k in ("p_div", "u_div", "flags", "p_target", "u_target",
                  "density"):
            np.testing.assert_array_equal(np.asarray(batch[k]), host[k])
        seen.extend(int(i) for i in idx)
    assert sorted(seen) == list(range(len(ds)))


def test_vbox_roundtrip(tmp_path):
    rng = np.random.default_rng(62)
    path = str(tmp_path / "out.vbox")
    vols = rng.random((3, 4, 5, 6)).astype(np.float32)  # (n, z, y, x)
    with VboxWriter(path, w=6, h=5, d=4, n_frames=3) as wr:
        for v in vols:
            wr.write_frame(v)
    frames, dims = read_vbox(path)
    assert dims == (6, 5, 4)
    np.testing.assert_allclose(frames, vols)


def test_binvox_load(tmp_path):
    # Build a tiny binvox file: 4^3, a 2x2x2 solid block at the origin.
    dims = 4
    n = dims ** 3
    vox = np.zeros((dims, dims, dims), np.uint8)  # [x][z][y] native order
    vox[:2, :2, :2] = 1
    flat = vox.reshape(-1)
    rle = []
    i = 0
    while i < n:
        v = flat[i]
        run = 1
        while i + run < n and flat[i + run] == v and run < 255:
            run += 1
        rle += [int(v), run]
        i += run
    path = str(tmp_path / "m.binvox")
    with open(path, "wb") as f:
        f.write(b"#binvox 1\n")
        f.write(b"dim 4 4 4\n")
        f.write(b"translate 0 0 0\n")
        f.write(b"scale 1.0\n")
        f.write(b"data\n")
        f.write(bytes(rle))
    out = load_binvox(path)
    assert out["dims"] == [4, 4, 4]
    assert out["data"].sum() == 8
    # permuted (x, y, z): the block stays at the low corner.
    assert out["data"][0, 0, 0] == 1 and out["data"][3, 3, 3] == 0


def test_voxel_utils_and_obj_export(tmp_path):
    v = np.zeros((5, 6, 7), np.float32)
    v[1:3, 2:4, 3:5] = 1
    mn, mx = bounding_box(v)
    assert mn == [1, 2, 3] and mx == [2, 3, 4]
    padded = pad_voxels_to_dims(16, 12, 8, v)
    assert padded.shape == (8, 12, 16)
    assert padded.sum() == v.sum()
    flipped = flip_diagonal(v, 0)
    assert flipped.shape == (5, 7, 6)
    n_v, n_f = export_obstacles_obj(str(tmp_path / "o.obj"), padded)
    # a 2x2x2 block has 24 surface quads
    assert n_f == 24
