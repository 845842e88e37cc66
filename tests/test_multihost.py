"""Multi-host (2-process) data parallelism over the jax.distributed
coordination service, on the CPU backend (SURVEY.md §2.3 "jax.distributed
over DCN for multi-host"; the reference has no distributed runtime at all).

Spawns 2 REAL processes, each with 4 virtual CPU devices, coordinated via
a localhost port: an 8-device ('host', 'dp', 'sp') global mesh where the
'host' axis crosses processes. Each process feeds its own local batch
half; one train step runs; both processes must agree on the (globally
psum-reduced) loss, and it must match a single-process run on the same
global batch.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import os, sys
sys.path.insert(0, os.environ["FLUIDNET_REPO"])
import jax
jax.config.update("jax_platforms", "cpu")

from fluidnet_tpu.parallel.multihost import (init_multihost,
                                             make_global_mesh,
                                             shard_host_batch)

assert init_multihost(), "env not set?"
pid = jax.process_index()
assert jax.process_count() == 2
assert jax.local_device_count() == 4
assert len(jax.devices()) == 8

import jax.numpy as jnp
import numpy as np
from fluidnet_tpu.core.config import ModelConfig
from fluidnet_tpu.core.grids import empty_domain
from fluidnet_tpu.ops.boundary import set_wall_bcs
from fluidnet_tpu.train.train import init_train_state, train_step

mconf = ModelConfig(is_3d=False, time_scale_sigma=0.0,
                    advection_method="euler",
                    long_term_div_num_steps=(1, 1))

# Global batch of 4: each process builds the SAME full batch (seeded) and
# contributes its own half via shard_host_batch.
rng = np.random.default_rng(7)
B, Z, Y, X = 4, 1, 16, 16
flags = empty_domain((B, 1, Z, Y, X), False)
u_div = set_wall_bcs(
    jnp.asarray(rng.standard_normal((B, 2, Z, Y, X)), jnp.float32), flags)
batch_full = {
    "p_div": np.zeros((B, 1, Z, Y, X), np.float32),
    "u_div": np.asarray(u_div),
    "flags": np.asarray(flags),
    "p_target": np.zeros((B, 1, Z, Y, X), np.float32),
    "u_target": np.asarray(u_div),
    "density": rng.random((B, 1, Z, Y, X)).astype(np.float32),
}
lo, hi = (0, 2) if pid == 0 else (2, 4)
local = {k: v[lo:hi] for k, v in batch_full.items()}

# 2-D data: z=1 can't shard over sp; global batch 4 = host(2) x dp(2).
mesh = make_global_mesh(n_dp=2, n_sp=1)
gbatch = shard_host_batch(local, mesh)
assert gbatch["u_div"].shape[0] == 4  # global batch reassembled

state = init_train_state(jax.random.PRNGKey(0), mconf)
state, terms = train_step(state, gbatch, jax.random.PRNGKey(1), mconf,
                          n_future=1)
print(f"RESULT {pid} {float(terms['total']):.10e}", flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_dp_over_dcn(tmp_path):
    port = _free_port()
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        for k in list(env):
            if k.startswith(("PALLAS_AXON_", "AXON_")):
                env.pop(k)
        env.update({
            "FLUIDNET_REPO": REPO,
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
            "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
            "JAX_NUM_PROCESSES": "2",
            "JAX_PROCESS_ID": str(pid),
        })
        procs.append(subprocess.Popen(
            [sys.executable, str(worker)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(out)

    losses = []
    for out in outs:
        for ln in out.splitlines():
            if ln.startswith("RESULT"):
                losses.append(float(ln.split()[2]))
    assert len(losses) == 2
    # Both processes see the same globally-reduced loss.
    assert losses[0] == pytest.approx(losses[1], rel=1e-6)

    # And it matches a single-process run on the same global batch.
    import jax
    import jax.numpy as jnp
    from fluidnet_tpu.core.config import ModelConfig
    from fluidnet_tpu.core.grids import empty_domain
    from fluidnet_tpu.ops.boundary import set_wall_bcs
    from fluidnet_tpu.train.train import init_train_state, train_step

    mconf = ModelConfig(is_3d=False, time_scale_sigma=0.0,
                        advection_method="euler",
                        long_term_div_num_steps=(1, 1))
    rng = np.random.default_rng(7)
    B, Z, Y, X = 4, 1, 16, 16
    flags = empty_domain((B, 1, Z, Y, X), False)
    u_div = set_wall_bcs(
        jnp.asarray(rng.standard_normal((B, 2, Z, Y, X)), jnp.float32),
        flags)
    batch = {
        "p_div": jnp.zeros((B, 1, Z, Y, X), jnp.float32),
        "u_div": u_div, "flags": flags,
        "p_target": jnp.zeros((B, 1, Z, Y, X), jnp.float32),
        "u_target": u_div,
        "density": jnp.asarray(rng.random((B, 1, Z, Y, X)), jnp.float32),
    }
    state = init_train_state(jax.random.PRNGKey(0), mconf)
    _, terms = train_step(state, batch, jax.random.PRNGKey(1), mconf,
                          n_future=1)
    assert losses[0] == pytest.approx(float(terms["total"]), rel=1e-5)
