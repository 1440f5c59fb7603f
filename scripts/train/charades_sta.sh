#!/usr/bin/env bash
# Charades-STA LoRA finetuning (counterpart of the reference's
# scripts/train/X-InstructBLIP/charades_sta.sh — without its
# CUDA_LAUNCH_BLOCKING=1 perf hazard).
set -euo pipefail
DATA_ROOT=${DATA_ROOT:-data/charades_sta}
OUTPUT_DIR=${OUTPUT_DIR:-runs/charades_sta}

python -m mraudio_tpu.cli.finetune \
  --model X-InstructBLIP \
  --dataset Charades_STA \
  --video-folder "${DATA_ROOT}/videos" \
  --train-annotation-file "${DATA_ROOT}/charades_sta_train.jsonl" \
  --val-annotation-file "${DATA_ROOT}/charades_sta_val.jsonl" \
  --output-dir "${OUTPUT_DIR}" \
  --batch-size "${BATCH_SIZE:-1}" \
  --max-epoch "${MAX_EPOCH:-50}" \
  "$@"
