#!/bin/bash
# m3d_v5: the round-4 3-D run — the first to change the TRAINING DYNAMICS
# instead of just growing data (v2/v3/v4 all destabilized the same way:
# test one-step div rising monotonically while train falls).
#
# Changes vs the destabilizing v4 recipe:
#   - long_term_grad_mode=full: the whole unrolled long-term-div loss is
#     differentiated (jax.checkpoint remat per step) instead of the
#     reference's stop-gradient unroll (run_epoch.lua:262-269). The
#     stop-grad mode only teaches the net to project states its *frozen
#     past self* visits; the full mode penalizes the net for steering
#     rollouts toward states it cannot fix — exactly the v2-v4 failure.
#   - Horizon curriculum (4 -> 8 -> 16 sampled steps): short horizons
#     while the projection is weak (long unrolls through a random net
#     are noise), long horizons once it matters.
#   - EMA weights (decay 0.999, ~3.5-epoch horizon at 192 steps/epoch)
#     drive rollout selection and the _bestRollout checkpoint.
#   - rollout_select_steps=64: selection sees the horizon v3 actually
#     blew up on (64-step ||div|| -> 1.4e3), not a 24-step preview.
#   - gen3d_v5 data: v4's 256 scenes with fully per-scene force/plume
#     draws (the round-3 advisor found v4 batched draws 8 scenes at a
#     time -> only 32 independent force conditions).
#   - learning_rate 5e-4 (was 2.5e-3) + loss_reject_threshold: the
#     first v5 attempt at lr 2.5e-3 oscillated (rising err at epoch-0
#     end) then blew up mid-epoch-1 (per-batch err 1e-3 -> 7e+2 in 30
#     steps) — the full-grad unroll needs a lower LR than the stop-grad
#     recipe, and clipped gradients of garbage losses still poison the
#     weights. Updates with loss > 0.1 (or non-finite) are dropped.
#   - RSS-bounded process chunking: each python process trains until
#     host RSS crosses MAX_RSS_GB (the remote-TPU client leaks host RAM
#     per step, docs/STATUS.md), checkpoints, exits 0; this loop
#     restarts it from <model>_lastEpoch. The kernel OOM-killer never
#     fires (a round-3 OOM at 122 GB wedged the TPU tunnel and zeroed
#     the driver artifacts).
#
# Kept from v4: maccormackOurs + fixed W=1 (train-sim consistency with
# the production/bench advection config), buoyancy p=0.5 / vorticity
# p=0.3 randomization through the unroll, input augmentation OFF.
set -e
cd "$(dirname "$0")/.."

MAX_EPOCHS=${MAX_EPOCHS:-36}
MAX_RSS_GB=${MAX_RSS_GB:-72}
# Curriculum/schedule env overrides (defaults = the round-4 recipe).
# Round 5 compresses the phase starts so the 8/16 phase is reached
# inside a bounded wall budget (the round-4 run was lost to a host
# reset at epoch 10, just before that phase started).
HORIZON_SCHEDULE=${HORIZON_SCHEDULE:-"[[0,2,4],[4,4,8],[10,8,16]]"}
LR_EPOCH_MULTS=${LR_EPOCH_MULTS:-"[[16,0.5],[24,0.5],[30,0.5]]"}
# Optional wall-clock budget for the WHOLE chunked run (seconds): each
# chunk gets the remaining budget as conf.max_wall_s (clean epoch-boundary
# exit; resumable), and the chunk loop stops once the deadline passes.
MAX_WALL_S=${MAX_WALL_S:-0}
T_START=$(date +%s)

current_epoch() {
  python - <<'EOF'
import json, os
p = "data/models/m3d_v5_lastEpoch/mconf.json"
print(json.load(open(p)).get("extra", {}).get("epoch", 0)
      if os.path.exists(p) else 0)
EOF
}

run_chunk() {
  local resume=$1
  local wall_args=()
  if [ "$MAX_WALL_S" -gt 0 ]; then
    local left=$((MAX_WALL_S - ($(date +%s) - T_START)))
    [ "$left" -le 60 ] && return 0
    wall_args=(-max_wall_s "$left")
  fi
  # batch_size 6 (was 8 for epochs 0-9): the 16-step full-grad remat
  # unroll of the [10,8,16] curriculum phase compiles to 15.90 GB at
  # batch 8 on the 15.75 GB chip (the 4/8 phases fit; round 4 never
  # reached epoch 10 so this was the first compile of the 16-horizon
  # group). Batch 6 buys ~25% activation headroom; Adam's per-sample
  # scaling makes the lr transferable.
  python -m fluidnet_tpu.cli.train \
    -dataset gen3d_v5 -model_filename m3d_v5 -batch_size 6 \
    -max_epochs "$MAX_EPOCHS" -seed 17 -profile false \
    -max_host_rss_gb "$MAX_RSS_GB" "${wall_args[@]}" \
    -load_model "$resume" -resume_training "$resume" \
    -rollout_select_steps 64 \
    -ema_decay 0.999 \
    -horizon_schedule "$HORIZON_SCHEDULE" \
    -lr_epoch_mults "$LR_EPOCH_MULTS" \
    -new_model.is_3d true \
    -new_model.advection_method maccormackOurs \
    -new_model.adaptive_window false -new_model.advection_window 1 \
    -new_model.maccormack_strength 0.75 \
    -new_model.augment_without_targets false \
    -new_model.train_buoyancy_prob 0.5 -new_model.train_buoyancy_scale 2.0 \
    -new_model.train_vorticity_confinement_prob 0.3 \
    -new_model.train_vorticity_confinement_amp 3.0 \
    -new_model.long_term_div_lambda 1.0 \
    -new_model.long_term_grad_mode full \
    -new_model.loss_div_lambda 1.0 \
    -new_model.loss_reject_threshold 0.1 \
    -new_model.optim.learning_rate 0.0005
}

epoch=$(current_epoch)
while [ "$epoch" -lt "$MAX_EPOCHS" ]; do
  resume=false
  [ -d data/models/m3d_v5_lastEpoch ] && resume=true
  echo "==> chunk: resume from epoch $epoch (resume=$resume, " \
       "rss cap ${MAX_RSS_GB} GB)"
  run_chunk "$resume"
  new_epoch=$(current_epoch)
  if [ "$MAX_WALL_S" -gt 0 ] && \
     [ $(($(date +%s) - T_START)) -ge $((MAX_WALL_S - 60)) ]; then
    echo "==> wall budget ${MAX_WALL_S}s reached at epoch $new_epoch;" \
         "stopping cleanly (resume later from _lastEpoch)"
    break
  fi
  if [ "$new_epoch" -le "$epoch" ]; then
    echo "==> ERROR: epoch did not advance ($epoch -> $new_epoch); aborting"
    exit 1
  fi
  epoch=$new_epoch
done
echo "==> m3d_v5 training complete ($MAX_EPOCHS epochs)"
