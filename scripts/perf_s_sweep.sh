#!/bin/bash
# Sweep FLUIDNET_SLICES_PER_PROGRAM (z-block height) on the production
# 128^3 scanned rollout. Run when the chip is free (~4 min/point).
cd "$(dirname "$0")/.."
for S in 4 8 16; do
  echo "--- S=$S"
  FLUIDNET_SLICES_PER_PROGRAM=$S timeout 1500 python scripts/perf_rollout.py 2>&1 | grep -v WARNING | tail -1
done
