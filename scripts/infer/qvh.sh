#!/usr/bin/env bash
# QVHighlights inference + scoring (counterpart of
# scripts/infer/X-InstructBLIP/qvh.sh: predict then run the scorer).
set -euo pipefail
DATA_ROOT=${DATA_ROOT:-data/qvh}
OUT=${OUT:-runs/qvh_eval}
mkdir -p "${OUT}"

python -m mraudio_tpu.cli.evaluate \
  --model X-InstructBLIP \
  --dataset QVH \
  --video-folder "${DATA_ROOT}/videos" \
  --annotation-file "${DATA_ROOT}/highlight_val_release.jsonl" \
  --output-file "${OUT}/preds.jsonl" \
  --batch-size "${BATCH_SIZE:-2}" \
  "$@"

python -m mraudio_tpu.cli.mr_eval \
  --submission_path "${OUT}/preds.jsonl" \
  --gt_path "${DATA_ROOT}/highlight_val_release.jsonl" \
  --save_path "${OUT}/metrics.json"
