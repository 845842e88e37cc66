"""Configuration: the conf / mconf split of the reference.

Mirrors torch/lib/default_conf.lua: `Config` is the training-harness config
(reference `conf`), `ModelConfig` the model-owned config that is persisted
with checkpoints (reference `mconf`, split out of conf.newModel at model
creation, model.lua:403-418). Any nested scalar field is overridable from
the CLI with dot-paths (`--newModel.banksNum 2`), replicating
torch/lib/parse_args.lua.

Frozen dataclasses: hashable, so a ModelConfig can be a static argument to
jitted functions (XLA specializes on sim/model structure, which is exactly
what we want — method switches are compile-time).
"""

from __future__ import annotations

import dataclasses
import json
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class InputChannels:
    """Which fields feed the projection net (default_conf.lua:76-81)."""
    div: bool = True
    flags: bool = True
    p_div: bool = True
    u_div: bool = False


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    """mconf.optimState (default_conf.lua:108-119)."""
    learning_rate: float = 0.0025
    weight_decay: float = 0.0
    momentum: float = 0.9
    epsilon: float = 1e-4
    beta1: float = 0.9
    beta2: float = 0.999


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """The reference mconf (default_conf.lua:44-153)."""
    # Simulation.
    dt: float = 0.1
    advection_method: str = "maccormack"   # euler|maccormack|*Ours
    # CFL window (cells) for the Pallas windowed-warp advection; 0 selects
    # the exact gather path (reference-parity, ~100x slower on TPU).
    advection_window: int = 2
    # When the per-step CFL number is <= 1 the W=1 kernel is exact (the
    # window only limits |displacement|): dispatch to it dynamically —
    # (2W+2)^3 tap scaling makes this ~1.5x on calm scenes.
    adaptive_window: bool = True
    maccormack_strength: float = 0.75
    buoyancy_scale: float = 0.0
    gravity_scale: float = 0.0
    vorticity_confinement_amp: float = 0.0
    gravity: Optional[Tuple[float, float, float]] = None
    sim_method: str = "convnet"            # convnet|jacobi|pcg
    max_iter: int = 100                    # jacobi/pcg iterations in simulate
    pcg_tol: float = 1e-4                  # pcg residual tol (pTol,
    #                                        default_conf.lua maxIter/pTol)
    # Hybrid projection (no reference counterpart — a TPU-era improvement):
    # after the ConvNet projection, run N fixed Jacobi correction sweeps on
    # the residual divergence (solve A dp = div(U_convnet), U -= grad dp).
    # The ConvNet removes the error modes iterative smoothers are worst at
    # (its receptive field covers what Jacobi needs hundreds of sweeps
    # for), while Jacobi polishes the high-frequency residual the ConvNet
    # leaves; each sweep costs ~0.06 ms at 128^3 (VMEM-resident kernel).
    polish_iters: int = 0
    is_3d: bool = False

    # Model architecture.
    model_type: str = "default"            # default|tog|yang
    # Conv-trunk MXU compute dtype: bfloat16 runs the systolic array's fast
    # path (3.3x measured at 128^3); float32 for bit-strict comparisons.
    # Physics ops always stay float32.
    conv_compute_dtype: str = "bfloat16"   # bfloat16|float32
    input_channels: InputChannels = InputChannels()
    add_batch_norm: bool = False
    batch_norm_eps: float = 1e-4
    batch_norm_mom: float = 0.1
    batch_norm_affine: bool = True
    add_pressure_skip: bool = False
    nonlin_type: str = "relu"              # relu|relu6|sigmoid
    pool_type: str = "avg"                 # avg|max
    normalize_input: bool = True
    normalize_input_chan: str = "UDiv"     # UDiv|pDiv|div
    normalize_input_func: str = "std"      # std|norm
    normalize_input_threshold: float = 1e-5
    # Multi-resolution banks (model.lua:252-331).
    banks_num: int = 1
    banks_split_stage: int = 1
    banks_join_stage: int = 3
    banks_type: str = "mres"               # mres|dilate
    banks_aggregate_method: str = "concat"  # concat|add
    banks_weight_share: bool = False

    # Losses (default_conf.lua:82-98).
    loss_p_lambda: float = 0.0
    loss_u_lambda: float = 0.0
    loss_div_lambda: float = 1.0
    loss_func_border_weight: float = 4.0   # 1 == disabled
    loss_func_border_width: int = 3
    long_term_div_lambda: float = 1.0
    long_term_div_num_steps: Tuple[int, int] = (4, 16)
    long_term_div_probability: float = 0.9
    # Improvement over the reference: 'last' replicates the reference's
    # stop-gradient unroll (run_epoch.lua:262-269 state copies break the
    # graph); 'full' differentiates through the whole unroll with
    # jax.checkpoint rematerialization (SURVEY.md §7).
    long_term_grad_mode: str = "last"      # last|full

    # Training-time randomization (default_conf.lua:127-149).
    time_scale_sigma: float = 1.0
    train_buoyancy_prob: float = 0.0
    train_buoyancy_scale: float = 2.0
    train_gravity_prob: float = 0.0
    train_gravity_scale: float = 2.0
    train_vorticity_confinement_prob: float = 0.0
    train_vorticity_confinement_amp: float = 2.0
    train_target_source: str = "manta"     # manta|jacobi|pcg
    # Apply dataAugmentation to UDiv even with manta targets. Only valid
    # when the p/u target losses are off (the div + long-term-div losses
    # don't read the stale targets), where it manufactures input
    # diversity for free — the augmented forces change the divergence the
    # net must remove, not the supervision.
    augment_without_targets: bool = False

    grad_norm_threshold: float = 1.0
    # Reject-bad-update guard: a training step whose total loss is
    # non-finite or exceeds this threshold keeps the previous
    # params/opt-state/EMA (the update is dropped, the batch is counted
    # in the 'rejected' metric). Norm-clipping alone does NOT defend
    # against a blown-up unrolled rollout: the clipped gradient of a
    # garbage loss is a full-length step in a garbage direction, and a
    # few of those in a row poison the weights (observed in the v5 run:
    # per-batch err 1e-3 -> 7e+2 within 30 steps). 0 disables.
    loss_reject_threshold: float = 0.0
    # sgd | adam | adagrad | rmsprop (default_conf.lua:99-107; the
    # reference's lbfgs needs full batches and is intentionally omitted).
    optimization_method: str = "adam"
    optim: OptimConfig = OptimConfig()

    def replace(self, **kw) -> "ModelConfig":
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass(frozen=True)
class Config:
    """The reference conf (default_conf.lua:22-162)."""
    batch_size: int = 16
    data_dir: str = "data/datasets"
    # Default dataset name: self-generated on first use by cli/train.py
    # (the reference's mantaflow name "output_current_model_sphere" never
    # ships here; an unknown name triggers the same self-generation).
    dataset: str = "gen2d_default"
    eval_during_training: bool = True
    ignore_frames: int = 0
    load_model: bool = False
    max_epochs: int = 5000
    max_samples_per_epoch: int = 0         # 0 == unlimited (lua math.huge)
    model_dir: str = "data/models"
    model_filename: str = "conv_model"
    num_data_threads: int = 8
    # Upload the whole dataset to device HBM once and gather batches
    # on-device (see data.dataset.DeviceDataset); falls back to the
    # threaded host loader when the dataset exceeds the budget.
    device_data_cache: bool = True
    device_data_cache_max_gb: float = 8.0
    # Run each train/eval epoch as ONE on-device lax.scan per unroll-
    # horizon group (train.train_epoch_scan) instead of one dispatch per
    # batch. Requires the device data cache. Host cost (and the remote
    # TPU client's per-dispatch RSS growth) becomes O(1) per epoch.
    epoch_scan: bool = True
    profile: bool = True
    resume_training: bool = False
    # Long-horizon model selection: every epoch, roll one held-out batch
    # forward this many steps with the trained projection and track the
    # final ||div||; the best checkpoint by that metric is saved as
    # <model>_bestRollout. One-step test loss alone selects
    # rollout-unstable models (the unrolled loss measures divergence
    # only after a terminal projection). 0 disables.
    rollout_select_steps: int = 24
    train: bool = True
    seed: int = 1
    # lrEpochMults pairs; empty == never (default has epoch=inf).
    lr_epoch_mults: Tuple[Tuple[int, float], ...] = ()
    # Exponential moving average of the params, updated per step; the
    # rollout-selection metric and the _bestRollout checkpoint use the
    # EMA weights (they average away the per-batch noise that one-step
    # selection rides). 0 disables. The reference has no counterpart —
    # long-rollout stability is this rebuild's north-star clause.
    ema_decay: float = 0.0
    # Unroll-horizon curriculum for the long-term divergence loss:
    # (epoch_at, lo, hi) triples — from epoch_at onward, the horizon is
    # sampled as lo w.p. long_term_div_probability else hi
    # (run_epoch.lua:254-257 semantics with epoch-dependent steps).
    # Empty == use mconf.long_term_div_num_steps for every epoch.
    horizon_schedule: Tuple[Tuple[int, int, int], ...] = ()
    # Graceful host-RSS ceiling (GB): checked at every epoch boundary;
    # when exceeded, training checkpoints and exits 0 so a chunked
    # driver (scripts/train3d_v5.sh) restarts a fresh process that
    # resumes from <model>_lastEpoch. Defends against the per-step host
    # RSS growth of the remote-TPU client (docs/STATUS.md): a kernel
    # OOM-kill both loses the epoch and wedges the device tunnel.
    # 0 disables.
    max_host_rss_gb: float = 0.0
    # Graceful wall-clock budget (seconds), checked at every epoch
    # boundary like max_host_rss_gb: when exceeded, training checkpoints
    # and exits 0 (resumable from <model>_lastEpoch). Lets a scheduled
    # run release the device cleanly instead of being SIGTERM'd
    # mid-step, which wedges the remote-TPU tunnel (docs/STATUS.md).
    # 0 disables.
    max_wall_s: float = 0.0
    new_model: ModelConfig = ModelConfig()

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


# --- CLI overrides (parse_args.lua equivalent) -------------------------------

_SNAKE = {
    # Accept the reference's camelCase flag names as aliases.
    "batchSize": "batch_size", "dataDir": "data_dir",
    "modelDir": "model_dir", "modelFilename": "model_filename",
    "loadModel": "load_model", "resumeTraining": "resume_training",
    "maxEpochs": "max_epochs", "numDataThreads": "num_data_threads",
    "newModel": "new_model", "advectionMethod": "advection_method",
    "maccormackStrength": "maccormack_strength",
    "buoyancyScale": "buoyancy_scale", "gravityScale": "gravity_scale",
    "vorticityConfinementAmp": "vorticity_confinement_amp",
    "simMethod": "sim_method", "maxIter": "max_iter", "pTol": "pcg_tol",
    "modelType": "model_type", "addBatchNorm": "add_batch_norm",
    "addPressureSkip": "add_pressure_skip", "nonlinType": "nonlin_type",
    "poolType": "pool_type", "normalizeInput": "normalize_input",
    "banksNum": "banks_num", "banksSplitStage": "banks_split_stage",
    "banksJoinStage": "banks_join_stage", "banksType": "banks_type",
    "banksAggregateMethod": "banks_aggregate_method",
    "banksWeightShare": "banks_weight_share",
    "lossPLambda": "loss_p_lambda", "lossULambda": "loss_u_lambda",
    "lossDivLambda": "loss_div_lambda",
    "longTermDivLambda": "long_term_div_lambda",
    "longTermDivProbability": "long_term_div_probability",
    "timeScaleSigma": "time_scale_sigma",
    "trainTargetSource": "train_target_source",
    "gradNormThreshold": "grad_norm_threshold",
    "inputChannels": "input_channels", "pDiv": "p_div", "UDiv": "u_div",
}


def _canon(name: str) -> str:
    return _SNAKE.get(name, name)


def _parse_value(old, raw: str):
    """Typed parse against the existing field value (parse_args.lua:82-201
    does the same type checking)."""
    if isinstance(old, bool):
        if raw.lower() in ("true", "1", "yes"):
            return True
        if raw.lower() in ("false", "0", "no"):
            return False
        raise ValueError(f"expected bool, got {raw!r}")
    if isinstance(old, int) and not isinstance(old, bool):
        return int(raw)
    if isinstance(old, float):
        return float(raw)
    if isinstance(old, str):
        return raw
    if isinstance(old, tuple) or old is None:
        return tuple(json.loads(raw)) if raw.startswith("[") else json.loads(raw)
    raise ValueError(f"cannot override field of type {type(old)}")


def _set_path(obj, path, raw):
    head = _canon(path[0])
    if not hasattr(obj, head):
        raise KeyError(f"unknown config field: {head}")
    old = getattr(obj, head)
    if len(path) == 1:
        return dataclasses.replace(obj, **{head: _parse_value(old, raw)})
    return dataclasses.replace(obj, **{head: _set_path(old, path[1:], raw)})


def parse_args(conf: Config, argv) -> Config:
    """Applies `--a.b.c value` (or `-a.b.c value`) overrides to conf.

    Replicates torch.parseArgs (parse_args.lua): any nested scalar leaf is
    addressable by dot-path, with type checking against the default.
    """
    i = 0
    argv = list(argv)
    while i < len(argv):
        arg = argv[i]
        if not arg.startswith("-"):
            raise ValueError(f"expected -key, got {arg!r}")
        key = arg.lstrip("-")
        if key in ("help", "h"):
            print(json.dumps(to_dict(conf), indent=2))
            raise SystemExit(0)
        if i + 1 >= len(argv):
            raise ValueError(f"missing value for {arg}")
        conf = _set_path(conf, key.split("."), argv[i + 1])
        i += 2
    return conf


def to_dict(obj):
    if dataclasses.is_dataclass(obj):
        return {f.name: to_dict(getattr(obj, f.name))
                for f in dataclasses.fields(obj)}
    if isinstance(obj, tuple):
        return [to_dict(x) for x in obj]
    return obj


def save_parameters(conf: Config, path: str):
    """Human-readable conf dump (save_parameters.lua:69 equivalent)."""
    with open(path, "w") as f:
        json.dump(to_dict(conf), f, indent=2, sort_keys=True)


def default_conf() -> Config:
    return Config()
