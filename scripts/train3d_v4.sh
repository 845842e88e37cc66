#!/bin/bash
# m3d_v4: the round-3 3-D training run on gen3d_v4 (256 scenes).
# Changes vs the destabilizing v3 run:
#   - 2.3x scene diversity (256 vs 112), frames sampled 8 apart;
#   - train-sim consistency: maccormackOurs + fixed W=1 window, the
#     exact production/bench advection config;
#   - force randomization ON (run_epoch.lua:133-158): buoyancy p=0.5
#     scale 2, vorticity p=0.3 amp 3 -- the unrolled long-term-div loss
#     then exposes the net to the buoyant/vortical states the demo and
#     bench actually visit;
#   - input-side dataAugmentation OFF: the reference's raw-gravity quirk
#     (simulate.lua:395-400, never enabled there: trainBuoyancyProb=0)
#     injects |dU| ~ dt/dx ~ 6 at 64^3 -- far outside any rollout state;
#     the first v4 attempt with it ON showed te_div 25x train (pure
#     memorization of unrealistic inputs). The unroll randomization above
#     provides the in-distribution exposure instead;
#   - rollout-stability model selection over 48 steps.
cd "$(dirname "$0")/.."
exec python -m fluidnet_tpu.cli.train \
  -dataset gen3d_v4 -model_filename m3d_v4 -batch_size 8 \
  -max_epochs 60 -seed 11 -profile false \
  -rollout_select_steps 48 \
  -lr_epoch_mults "[[20,0.5],[32,0.5],[44,0.5],[54,0.5]]" \
  -new_model.is_3d true \
  -new_model.advection_method maccormackOurs \
  -new_model.adaptive_window false -new_model.advection_window 1 \
  -new_model.maccormack_strength 0.75 \
  -new_model.augment_without_targets false \
  -new_model.train_buoyancy_prob 0.5 -new_model.train_buoyancy_scale 2.0 \
  -new_model.train_vorticity_confinement_prob 0.3 \
  -new_model.train_vorticity_confinement_amp 3.0 \
  -new_model.long_term_div_lambda 1.0 \
  -new_model.loss_div_lambda 1.0 \
  -new_model.optim.learning_rate 0.0025 \
  "$@"
