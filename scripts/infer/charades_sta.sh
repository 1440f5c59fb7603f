#!/usr/bin/env bash
# Charades-STA inference + scoring (counterpart of
# scripts/infer/X-InstructBLIP/charades_sta.sh).
set -euo pipefail
DATA_ROOT=${DATA_ROOT:-data/charades_sta}
OUT=${OUT:-runs/charades_eval}
mkdir -p "${OUT}"

python -m mraudio_tpu.cli.evaluate \
  --model X-InstructBLIP \
  --dataset Charades_STA \
  --video-folder "${DATA_ROOT}/videos" \
  --annotation-file "${DATA_ROOT}/charades_sta_test.jsonl" \
  --output-file "${OUT}/preds.jsonl" \
  --batch-size "${BATCH_SIZE:-2}" \
  "$@"

python -m mraudio_tpu.cli.mr_eval \
  --submission_path "${OUT}/preds.jsonl" \
  --gt_path "${DATA_ROOT}/charades_sta_test.jsonl" \
  --save_path "${OUT}/metrics.json"
