#!/bin/bash
# Round-4 pipeline: gen3d_v5 (if missing) -> m3d_v5 RSS-chunked training ->
# matched-cost eval (docs/figures). One TPU job at a time (the tunnel
# wedges under concurrent use, docs/STATUS.md); run under nohup so the
# pipeline survives builder-session boundaries:
#   nohup bash scripts/pipeline_r4.sh > /tmp/pipeline_r4.log 2>&1 &
# If a trainer process is already on the TPU, record its PID in
# /tmp/train3d.pid first; the pipeline waits for it before taking over.
set -e
cd "$(dirname "$0")/.."

if [ -f /tmp/train3d.pid ]; then
  pid=$(cat /tmp/train3d.pid)
  while kill -0 "$pid" 2>/dev/null; do
    echo "==> [pipeline] waiting for in-flight trainer pid $pid"
    sleep 60
  done
fi

if [ ! -f data/datasets/gen3d_v5/.complete ]; then
  echo "==> [pipeline] generating gen3d_v5"
  python scripts/gen3d_v5.py
  touch data/datasets/gen3d_v5/.complete
fi

echo "==> [pipeline] training m3d_v5 (RSS-chunked)"
bash scripts/train3d_v5.sh

echo "==> [pipeline] matched-cost eval"
python scripts/eval_r3_final.py data/models/m3d_v5_bestRollout

echo "==> [pipeline] done"
