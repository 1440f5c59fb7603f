#!/usr/bin/env bash
# Charades-STA inference with the VideoLLaMA backbone + scoring
# (counterpart of scripts/infer/VideoLLaMA/charades_sta.sh: --model VideoLLaMA
# with --model-path naming the merged VideoLLaMA2-AV checkpoint).
set -euo pipefail
DATA_ROOT=${DATA_ROOT:-data/charades_sta}
OUT=${OUT:-runs/charades_sta_videollama_eval}
MODEL_PATH=${MODEL_PATH:-checkpoints/VideoLLaMA2.1-7B-AV.pth}
mkdir -p "${OUT}"

python -m mraudio_tpu.cli.evaluate \
  --model VideoLLaMA \
  --model-path "${MODEL_PATH}" \
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
