"""Multi-host (multi-process) distribution over DCN.

The reference is single-process/single-GPU (SURVEY.md §2.3); the TPU-native
scale-out story is two-level: ICI mesh axes inside a host ('dp', 'sp' —
parallel.mesh) and data parallelism ACROSS hosts over DCN, coordinated by
`jax.distributed`. This module is the process-level entry:

  - `init_multihost()` initializes the JAX coordination service from
    explicit args or the environment (JAX_COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID — also the standard orchestration
    vars jax.distributed reads natively on Cloud TPU pods).
  - `make_global_mesh(dcn_dp, n_dp, n_sp)` builds a ('host', 'dp', 'sp')
    mesh whose leading axis spans processes — batch shards ride DCN,
    spatial halos stay on intra-host ICI (the scaling-book layering:
    cheap collectives on ICI, batch-level only on DCN).
  - `shard_host_batch(batch, mesh)` assembles a global jax.Array from each
    process's LOCAL batch slice (jax.make_array_from_process_local_data),
    so every host feeds its own data shard — the DataParallel-across-hosts
    the reference never had.

Gradient psums over the 'host' axis are inserted by GSPMD exactly like the
single-process dp axis: train_step needs NO changes (tested 2-process on
the CPU backend in tests/test_multihost.py).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_multihost(coordinator_address: Optional[str] = None,
                   num_processes: Optional[int] = None,
                   process_id: Optional[int] = None) -> bool:
    """Initializes jax.distributed when multi-process env/args are present.

    Returns True if the coordination service was initialized (or already
    was), False when running single-process (no-op). Reads
    JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID when args
    are omitted; on TPU pod slices jax.distributed.initialize() also
    discovers everything from the runtime with no args.
    """
    coordinator_address = coordinator_address or \
        os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator_address is None or num_processes is None \
            or num_processes <= 1:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id)
    return True


def make_global_mesh(n_dp: Optional[int] = None, n_sp: int = 1) -> Mesh:
    """A ('host', 'dp', 'sp') mesh: 'host' spans processes (DCN), 'dp'/'sp'
    the devices inside each process (ICI). Requires every process to
    contribute the same local device count (true on pods and on the CPU
    test harness)."""
    n_hosts = jax.process_count()
    local = jax.local_device_count()
    if n_dp is None:
        n_dp = local // n_sp
    assert n_dp * n_sp <= local, \
        f"need {n_dp * n_sp} local devices, have {local}"
    # jax.devices() orders all global devices; group by process so the
    # 'host' axis is the process axis (DCN), the trailing axes intra-host.
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    devs = np.asarray(devs).reshape(n_hosts, local)[:, :n_dp * n_sp]
    return Mesh(devs.reshape(n_hosts, n_dp, n_sp), ("host", "dp", "sp"))


def global_batch_sharding(mesh: Mesh) -> NamedSharding:
    """(b, c, z, y, x): batch over host x dp (DCN x ICI), z over sp."""
    return NamedSharding(mesh, P(("host", "dp"), None, "sp", None, None))


def shard_host_batch(batch: dict, mesh: Mesh) -> dict:
    """Builds global arrays from each process's LOCAL batch shard.

    Every process passes its own (local_b, c, z, y, x) arrays; the result
    is a global jax.Array of batch size local_b * process_count, sharded
    over ('host', 'dp'). Non-5D entries pass through untouched."""
    sh = global_batch_sharding(mesh)
    out = {}
    for k, v in batch.items():
        if hasattr(v, "ndim") and v.ndim == 5:
            out[k] = jax.make_array_from_process_local_data(sh, np.asarray(v))
        else:
            out[k] = v
    return out
