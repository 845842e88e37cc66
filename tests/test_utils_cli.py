"""Utils (logger, checkpoint, flops, stats) + CLI smoke tests."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fluidnet_tpu.core.config import (Config, InputChannels, ModelConfig,
                                      default_conf, parse_args)
from fluidnet_tpu.train.train import init_train_state
from fluidnet_tpu.utils.checkpoint import (load_checkpoint, load_mconf,
                                           save_checkpoint)
from fluidnet_tpu.utils.flops import model_flops, model_peak_activation
from fluidnet_tpu.utils.logger import Logger, read_log


def test_parse_args_nested_overrides():
    conf = parse_args(default_conf(), [
        "--batch_size", "4",
        "--new_model.banks_num", "2",
        "--new_model.input_channels.u_div", "true",
        "-newModel.lossPLambda", "0.5",          # reference camelCase alias
        "--new_model.long_term_div_num_steps", "[2, 8]",
    ])
    assert conf.batch_size == 4
    assert conf.new_model.banks_num == 2
    assert conf.new_model.input_channels.u_div is True
    assert conf.new_model.loss_p_lambda == 0.5
    assert conf.new_model.long_term_div_num_steps == (2, 8)
    with pytest.raises(KeyError):
        parse_args(default_conf(), ["--no_such_field", "1"])
    with pytest.raises(ValueError):
        parse_args(default_conf(), ["--batch_size"])


def test_logger_roundtrip_and_resume(tmp_path):
    path = str(tmp_path / "log.tsv")
    lg = Logger(path, ["epoch", "loss"])
    lg.add([0, 1.5])
    lg.add({"epoch": 1, "loss": 0.75})
    lg.close()
    # Resume appends (logger.lua:8-45).
    lg2 = Logger(path, ["epoch", "loss"])
    lg2.add([2, 0.5])
    lg2.close()
    names, rows = read_log(path)
    assert names == ["epoch", "loss"]
    assert len(rows) == 3 and rows[2][1] == 0.5


def test_checkpoint_roundtrip(tmp_path):
    mconf = ModelConfig(is_3d=False, banks_num=2)
    state = init_train_state(jax.random.PRNGKey(0), mconf)
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, state, mconf, {"epoch": 3})
    tmpl = init_train_state(jax.random.PRNGKey(1), mconf)
    state2, mconf2, extra = load_checkpoint(path, tmpl)
    assert mconf2 == mconf
    assert extra["epoch"] == 3
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(state2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert load_mconf(path) == mconf


def test_model_flops_matches_reference_number():
    """The bundled 2-D default model records 243,793,922 FLOPs at 128x128
    (data/models/myModel2D_mconf.txt:17, BASELINE.md). Our analytic count
    uses the same conv arithmetic; it must land within a few % (the
    reference also counts the nonlinearity/physics glue)."""
    mconf = ModelConfig(is_3d=False, model_type="default")
    f = model_flops(mconf, (128, 128, 1))
    assert abs(f - 243_793_922) / 243_793_922 < 0.05, f
    assert model_peak_activation(mconf, (128, 128, 1)) > 0


def test_calc_stats_divergence_decays():
    from fluidnet_tpu.utils.stats import calc_stats
    from fluidnet_tpu.core.grids import empty_domain
    from tests.test_train import make_batch
    rng = np.random.default_rng(80)
    batch = make_batch(rng, n=16, B=1)
    mconf = ModelConfig(is_3d=False, sim_method="pcg", max_iter=150)
    out = calc_stats([batch], mconf, n_steps=3)
    assert out.shape == (1, 3)
    assert np.all(np.isfinite(out))


def test_demo2d_cli_smoke(tmp_path):
    from fluidnet_tpu.cli.demo2d import main
    out = str(tmp_path / "demo")
    main(["--res", "32", "--frames", "6", "--save_every", "3",
          "--sim_method", "jacobi", "--max_iter", "20", "--out_dir", out,
          "--splats"])
    pngs = [f for f in os.listdir(out) if f.endswith(".png")]
    assert len(pngs) == 2
    # PNG header sanity.
    with open(os.path.join(out, sorted(pngs)[0]), "rb") as f:
        assert f.read(8) == b"\x89PNG\r\n\x1a\n"


def test_demo2d_runtime_toggles(tmp_path):
    """The scripted runtime switches (the reference demo's keyboard
    toggles, fluid_net_2d_demo.lua:203-287): solver and parameters change
    mid-run without restarting; the sim stays finite across switches."""
    from fluidnet_tpu.cli.demo2d import main, parse_toggle_script
    ev = parse_toggle_script(
        "2:sim_method=convnet;4:dt=0.05,vorticity=2.0;6:plume=off")
    assert ev[2] == {"sim_method": "convnet"}
    assert ev[4] == {"dt": 0.05, "vorticity_confinement_amp": 2.0}
    assert ev[6] == {"plume": False}
    out = str(tmp_path / "demo_t")
    main(["--res", "32", "--frames", "8", "--save_every", "2",
          "--sim_method", "jacobi", "--max_iter", "15", "--out_dir", out,
          "--script",
          "2:sim_method=convnet;4:sim_method=jacobi,dt=0.05;6:plume=off"])
    pngs = [f for f in os.listdir(out) if f.endswith(".png")]
    assert len(pngs) == 4


@pytest.mark.slow
def test_sim3d_cli_smoke(tmp_path):
    from fluidnet_tpu.cli.sim3d import main
    out = str(tmp_path / "sim3d")
    main(["--res", "16", "--num_frames", "3", "--sim_method", "jacobi",
          "--max_iter", "10", "--out_dir", out])
    from fluidnet_tpu.io.vbox import read_vbox
    frames, dims = read_vbox(os.path.join(out, "geom_output.vbox"))
    assert dims == (16, 16, 16)


@pytest.mark.slow
def test_train_cli_smoke(tmp_path):
    """Tiny end-to-end training run through the CLI harness: generates a
    dataset, trains 2 epochs, writes checkpoints + logs."""
    from fluidnet_tpu.cli.train import run_training
    conf = default_conf().replace(
        data_dir=str(tmp_path / "data"), dataset="tiny",
        model_dir=str(tmp_path / "models"), model_filename="m",
        batch_size=4, max_epochs=2, num_data_threads=2, profile=False,
        seed=0)
    # Pre-generate a small dataset quickly.
    from fluidnet_tpu.data.generate import generate_dataset
    generate_dataset(os.path.join(conf.data_dir, "tiny"), n_tr=1, n_te=1,
                     seed=0, size_xyz=(16, 16, 1), is_3d=False, n_frames=8,
                     max_iter=60)
    conf = conf.replace(rollout_select_steps=4,
                        ema_decay=0.9,                      # EMA selection
                        horizon_schedule=((0, 1, 1), (1, 1, 2)),  # curriculum
                        new_model=conf.new_model.replace(
                            long_term_div_num_steps=(1, 2),
                            time_scale_sigma=0.0))
    run_training(conf)
    assert os.path.isdir(os.path.join(conf.model_dir, "m_lastEpoch"))
    # Rollout-stability model selection writes its own checkpoint, and
    # the EMA average persists for chunked/resumed training.
    assert os.path.isdir(os.path.join(conf.model_dir, "m_bestRollout"))
    assert os.path.isdir(os.path.join(conf.model_dir, "m_ema"))
    from fluidnet_tpu.utils.logger import read_log
    names, rows = read_log(os.path.join(conf.model_dir, "m_log.tsv"))
    assert len(rows) == 2
    # Resume for one more epoch: the log must append.
    conf2 = conf.replace(load_model=True, resume_training=True, max_epochs=3)
    run_training(conf2)
    _, rows2 = read_log(os.path.join(conf.model_dir, "m_log.tsv"))
    assert len(rows2) == 3
