"""Regression coverage for the repo-root headline bench (bench.py).

The round-4 driver artifact went red because the trained-checkpoint
residual-certification branch had never executed: bench.py kept an alias
of the initial state across a donate_argnums=0 jit call and fed the
deleted buffers to the jacobi baseline rollout (BENCH_r04.json tail).
This test drives bench.main() end-to-end — INCLUDING that branch — at a
tiny resolution with a dummy trained checkpoint, so the full artifact
path is covered on the CPU mesh in CI.
"""

import importlib
import json
import os
import sys

import jax
import pytest


@pytest.mark.slow
def test_bench_trained_branch(tmp_path, monkeypatch, capsys):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)

    # Dummy "trained" checkpoint with the bench model architecture.
    from fluidnet_tpu.core.config import ModelConfig
    from fluidnet_tpu.train.train import init_train_state
    from fluidnet_tpu.utils.checkpoint import save_checkpoint

    mconf = ModelConfig(
        is_3d=True, sim_method="convnet", dt=0.1,
        buoyancy_scale=2.0, vorticity_confinement_amp=3.0,
        maccormack_strength=0.6, advection_method="maccormackOurs",
        adaptive_window=False, advection_window=1)
    state = init_train_state(jax.random.PRNGKey(7), mconf)
    ckpt = str(tmp_path / "dummy_trained")
    save_checkpoint(ckpt, state, mconf, {"epoch": 1})

    monkeypatch.setenv("FLUIDNET_BENCH_RES", "16")
    monkeypatch.setenv("FLUIDNET_BENCH_STEPS", "2")
    monkeypatch.setenv("FLUIDNET_BENCH_REPS", "1")
    monkeypatch.setenv("FLUIDNET_BENCH_CKPT", ckpt)

    import bench
    bench = importlib.reload(bench)  # re-read the env-derived constants
    out = bench.main()

    # The stdout JSON line is what the driver records; it must parse and
    # carry the trained-branch fields (VERDICT r4 "done" criteria).
    line = [ln for ln in capsys.readouterr().out.splitlines()
            if ln.startswith("{")][-1]
    parsed = json.loads(line)
    assert parsed == {k: v for k, v in out.items()}
    assert out["model"] == ckpt
    assert out["residual_ok"] is not None
    assert "final_div_l2_convnet" in out
    assert "final_div_l2_jacobi34" in out
    assert "final_div_l2_pcg" in out
    assert out["value"] > 0
    # A random-init net will usually NOT beat jacobi-34; the field just
    # has to be a real bool computed from finite numbers.
    assert isinstance(out["residual_ok"], bool)
