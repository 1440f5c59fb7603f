#!/usr/bin/env bash
# QVHighlights inference with the VideoLLaMA backbone + scoring
# (counterpart of scripts/infer/VideoLLaMA/qvh.sh: --model VideoLLaMA
# with --model-path naming the merged VideoLLaMA2-AV checkpoint).
set -euo pipefail
DATA_ROOT=${DATA_ROOT:-data/qvh}
OUT=${OUT:-runs/qvh_videollama_eval}
MODEL_PATH=${MODEL_PATH:-checkpoints/VideoLLaMA2.1-7B-AV.pth}
mkdir -p "${OUT}"

python -m mraudio_tpu.cli.evaluate \
  --model VideoLLaMA \
  --model-path "${MODEL_PATH}" \
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
