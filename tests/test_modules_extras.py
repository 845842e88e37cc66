"""Aux modules, voxelizer, plots, pbar, optimizer options."""

import io
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fluidnet_tpu.models import modules as M


def test_finite_elements_and_divergence():
    # Linear field: gradient must be exact, divergence constant.
    Z, Y, X = 4, 8, 8
    zz, yy, xx = np.meshgrid(np.arange(Z), np.arange(Y), np.arange(X),
                             indexing="ij")
    f = (2.0 * xx + 3.0 * yy - zz).astype(np.float32)[None, None]
    g = np.asarray(M.finite_elements(jnp.asarray(f)))
    np.testing.assert_allclose(g[0, 0], 2.0, atol=1e-5)   # d/dx
    np.testing.assert_allclose(g[0, 1], 3.0, atol=1e-5)   # d/dy
    np.testing.assert_allclose(g[0, 2], -1.0, atol=1e-5)  # d/dz
    u = np.stack([2.0 * xx, 3.0 * yy, -zz]).astype(np.float32)[None]
    div = np.asarray(M.central_divergence(jnp.asarray(u)))
    np.testing.assert_allclose(div, 4.0, atol=1e-5)


def test_mse_si_and_lerp_losses():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((2, 1, 1, 8, 8)), jnp.float32)
    # Scale-invariance: adding a constant offset is partially forgiven.
    l_plain = float(M.mse_si_loss(a + 1.0, a, lam=1.0))
    assert l_plain < 1e-5
    assert float(M.lerp_loss(2.0, 4.0, 0.25)) == 2.5
    from jax.test_util import check_grads
    check_grads(lambda x: M.mse_si_loss(x, a), (a + 0.1,), order=1,
                modes=["rev"], atol=1e-2, rtol=1e-2)


def test_apply_scale_and_std():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((3, 2, 1, 4, 4)), jnp.float32)
    s = jnp.asarray([1.0, 2.0, 4.0])
    y = M.apply_scale(x, s, invert=True)
    np.testing.assert_allclose(np.asarray(y[2]), np.asarray(x[2]) / 4.0,
                               rtol=1e-6)
    back = M.apply_scale(y, s, invert=False)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), rtol=1e-6)
    std = np.asarray(M.standard_deviation(x))
    want = np.asarray([np.asarray(x[i]).std(ddof=1) for i in range(3)])
    np.testing.assert_allclose(std, want, rtol=1e-5)


def test_upsample_and_normalizations():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 2, 2, 4, 4)), jnp.float32)
    up = M.upsample_nearest(x, 2)
    assert up.shape == (1, 2, 4, 8, 8)
    assert float(up[0, 0, 0, 0, 0]) == float(x[0, 0, 0, 0, 0])
    ns = M.normalize_subtractive(x, 1)
    assert ns.shape == x.shape
    nd = M.normalize_divisive(x, 1)
    assert np.all(np.isfinite(np.asarray(nd)))


def test_residual_block():
    from fluidnet_tpu.models.fluidnet import _conv, _init_conv
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    params = {"conv1": _init_conv(k1, 4, 4, 3, 2),
              "conv2": _init_conv(k2, 4, 4, 3, 2)}
    x = jnp.ones((1, 4, 8, 8))
    y = M.residual_block(params, x, lambda p, a: _conv(a, p, 2))
    assert y.shape == x.shape


def test_voxelize_obj_cube(tmp_path):
    from fluidnet_tpu.io.voxelize import (generate_voxel_files, load_obj,
                                          save_binvox, voxelize_obj)
    from fluidnet_tpu.io.binvox import load_binvox
    # Unit cube OBJ.
    obj = tmp_path / "cube.obj"
    v = [(0, 0, 0), (1, 0, 0), (1, 1, 0), (0, 1, 0),
         (0, 0, 1), (1, 0, 1), (1, 1, 1), (0, 1, 1)]
    faces = [(1, 2, 3, 4), (5, 6, 7, 8), (1, 2, 6, 5), (2, 3, 7, 6),
             (3, 4, 8, 7), (4, 1, 5, 8)]
    with open(obj, "w") as f:
        for x, y, z in v:
            f.write(f"v {x} {y} {z}\n")
        for q in faces:
            f.write("f {} {} {} {}\n".format(*q))
    verts, tris = load_obj(str(obj))
    assert len(verts) == 8 and len(tris) == 12
    vox = voxelize_obj(str(obj), dim=16, solid=True)
    frac = vox["data"].mean()
    # A full cube fills nearly the whole voxel domain.
    assert frac > 0.6, frac
    # Interior is filled (not just the shell).
    assert vox["data"][8, 8, 8] == 1.0
    # binvox roundtrip.
    out = tmp_path / "cube.binvox"
    save_binvox(str(out), vox)
    back = load_binvox(str(out))
    np.testing.assert_array_equal(back["data"], vox["data"])
    # Batch generation + split.
    written = generate_voxel_files(str(tmp_path), str(tmp_path / "vox"),
                                   dims=(8,), test_frac=0.5)
    assert len(written) == 1


def test_plots(tmp_path):
    from fluidnet_tpu.utils.logger import Logger
    from fluidnet_tpu.utils.plots import plot_epochs, plot_norm_div
    log = str(tmp_path / "l.tsv")
    lg = Logger(log, ["epoch", "tr_loss", "te_loss"])
    for e in range(5):
        lg.add([e, 1.0 / (e + 1), 1.2 / (e + 1)])
    lg.close()
    p1 = plot_epochs(log, str(tmp_path / "epochs.png"))
    assert os.path.getsize(p1) > 1000
    rng = np.random.default_rng(0)
    p2 = plot_norm_div({"convnet": rng.random((4, 16)),
                        "jacobi": rng.random((4, 16))},
                       str(tmp_path / "div.png"))
    assert os.path.getsize(p2) > 1000


def test_pbar():
    from fluidnet_tpu.utils.pbar import progress
    buf = io.StringIO()
    for i in range(0, 11):
        progress(i, 10, "msg", out=buf)
    s = buf.getvalue()
    assert "10/10" in s and s.endswith("\n")


@pytest.mark.parametrize("method", ["sgd", "adagrad", "rmsprop"])
def test_optimizer_variants(method):
    from fluidnet_tpu.core.config import ModelConfig
    from fluidnet_tpu.train.train import init_train_state, train_step
    from tests.test_train import make_batch
    rng = np.random.default_rng(3)
    mconf = ModelConfig(is_3d=False, optimization_method=method,
                        time_scale_sigma=0.0, advection_window=0)
    batch = make_batch(rng, n=16, B=1)
    state = init_train_state(jax.random.PRNGKey(0), mconf)
    state2, terms = train_step(state, batch, jax.random.PRNGKey(1), mconf,
                               n_future=0)
    assert np.isfinite(float(terms["total"]))
    leaves = jax.tree_util.tree_leaves(state2.params)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
