"""Device mesh + sharding helpers.

The reference is single-process single-GPU (SURVEY.md §2.3); this module is
the TPU-native scale-out layer it never had: a ('dp', 'sp') mesh where

  dp — data parallel over the batch axis (independent scenes),
  sp — spatial domain decomposition over the grid z axis (for >HBM grids).

Under jit, arrays annotated with these shardings make XLA's SPMD partitioner
insert the halo exchanges (collective-permutes over ICI) for every stencil
automatically; fluidnet_tpu.parallel.halo also provides an explicit
shard_map halo pipeline for the solver hot loop.
"""

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_dp: Optional[int] = None, n_sp: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_dp is None:
        n_dp = n // n_sp
    assert n_dp * n_sp <= n, f"need {n_dp * n_sp} devices, have {n}"
    devs = np.asarray(devices[:n_dp * n_sp]).reshape(n_dp, n_sp)
    return Mesh(devs, ("dp", "sp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard (b, c, z, y, x) over batch; z over sp if present."""
    return NamedSharding(mesh, P("dp", None, "sp", None, None))


def spatial_sharding(mesh: Mesh) -> NamedSharding:
    """Pure spatial decomposition (single scene too big for one chip)."""
    return NamedSharding(mesh, P(None, None, "sp", None, None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Device-puts a host batch dict with batch+spatial sharding."""
    sh = batch_sharding(mesh)
    return {k: jax.device_put(v, sh) if hasattr(v, "ndim") and v.ndim == 5
            else v for k, v in batch.items()}
