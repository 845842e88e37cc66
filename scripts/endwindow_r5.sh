#!/bin/bash
# Round-5 end-of-round measurement window (run AFTER pipeline_r5.sh has
# released the TPU): records, in order of importance,
#   1. the headline bench with the freshly trained checkpoint (also
#      warms the compile cache for the driver's BENCH run),
#   2. the fused-prologue on-chip number (default config vs prologue
#      off, attribution for docs/PERF.md),
#   3. the 2-D realtime-parity number (VERDICT r4 item 8).
# Output goes to /tmp/endwindow_r5.log; each step is individually
# timeboxed so a hang cannot eat the window.
set -x
cd "$(dirname "$0")/.."

echo "== bench (trained ckpt if bundled) =="
timeout 900 python bench.py

echo "== perf_quick default (epilogue+prologue ON) =="
timeout 600 python scripts/perf_quick.py

echo "== perf_quick prologue OFF (attribution) =="
FLUIDNET_FUSED_PROLOGUE=0 timeout 600 python scripts/perf_quick.py

echo "== perf_2d (128^2 realtime parity) =="
timeout 600 python scripts/perf_2d.py

echo "== done =="
