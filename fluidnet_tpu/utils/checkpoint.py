"""Checkpoint save/load: params + optimizer state + mconf + epoch.

The reference saves the model and mconf every epoch to '<name>_lastEpoch'
and the best-so-far to '<name>' keyed on test loss, stripping activations
(fluid_net_train.lua:229-239, model.lua:463-478). Here a checkpoint is a
directory with:

  state.msgpack  — params/opt-state/step pytree (flax.serialization)
  mconf.json     — the model-owned config (human-readable, like the
                   reference's paired text dump, save_parameters.lua:69)

Orbax is heavier machinery than this pytree needs; flax msgpack is
self-contained and dependency-stable.
"""

import dataclasses
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

from fluidnet_tpu.core import config as config_lib
from fluidnet_tpu.core.config import InputChannels, ModelConfig, OptimConfig


def _payload(train_state):
    # Plain dict: flax serialization handles dict/tuple pytrees natively
    # (the TrainState dataclass itself is not registered with flax).
    return {"params": train_state.params, "opt_state": train_state.opt_state,
            "step": train_state.step}


def save_checkpoint(path, train_state, mconf, extra=None):
    os.makedirs(path, exist_ok=True)
    state_host = jax.tree_util.tree_map(np.asarray, _payload(train_state))
    blob = serialization.to_bytes(state_host)
    with open(os.path.join(path, "state.msgpack"), "wb") as f:
        f.write(blob)
    meta = {"mconf": config_lib.to_dict(mconf), "extra": extra or {}}
    with open(os.path.join(path, "mconf.json"), "w") as f:
        json.dump(meta, f, indent=2, sort_keys=True)


def _mconf_from_dict(d):
    d = dict(d)
    d["input_channels"] = InputChannels(**d["input_channels"])
    d["optim"] = OptimConfig(**d["optim"])
    for k, v in list(d.items()):
        if isinstance(v, list):
            d[k] = tuple(v)
    return ModelConfig(**d)


def load_checkpoint(path, template_state):
    """Restores into the structure of `template_state` (build it with
    init_train_state(mconf) first). Returns (train_state, mconf, extra)."""
    with open(os.path.join(path, "mconf.json")) as f:
        meta = json.load(f)
    mconf = _mconf_from_dict(meta["mconf"])
    with open(os.path.join(path, "state.msgpack"), "rb") as f:
        blob = f.read()
    payload = serialization.from_bytes(_payload(template_state), blob)
    payload = jax.tree_util.tree_map(jnp.asarray, payload)
    state = dataclasses.replace(template_state, params=payload["params"],
                                opt_state=payload["opt_state"],
                                step=payload["step"])
    return state, mconf, meta.get("extra", {})


def load_mconf(path):
    with open(os.path.join(path, "mconf.json")) as f:
        return _mconf_from_dict(json.load(f)["mconf"])
