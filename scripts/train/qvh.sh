#!/usr/bin/env bash
# QVHighlights LoRA finetuning (counterpart of the reference's
# scripts/train/X-InstructBLIP/qvh.sh torchrun launch).  On a TPU pod
# slice run this same command on every host; jax.distributed initializes
# from the TPU environment automatically — no torchrun/NCCL dance.
set -euo pipefail
DATA_ROOT=${DATA_ROOT:-data/qvh}
OUTPUT_DIR=${OUTPUT_DIR:-runs/qvh}

python -m mraudio_tpu.cli.finetune \
  --model X-InstructBLIP \
  --dataset QVH \
  --video-folder "${DATA_ROOT}/videos" \
  --train-annotation-file "${DATA_ROOT}/highlight_train_release.jsonl" \
  --val-annotation-file "${DATA_ROOT}/highlight_val_release.jsonl" \
  --output-dir "${OUTPUT_DIR}" \
  --batch-size "${BATCH_SIZE:-1}" \
  --max-epoch "${MAX_EPOCH:-50}" \
  "$@"
