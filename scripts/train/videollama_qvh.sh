#!/usr/bin/env bash
# QVHighlights LoRA finetuning with the VideoLLaMA backbone (no reference
# counterpart: the reference's VideoLLaMA wrapper is inference-only and its
# one VideoLLaMA train launch path is broken — see
# scripts/train/videollama_charades_sta.sh and docs/DIVERGENCES.md).
set -euo pipefail
DATA_ROOT=${DATA_ROOT:-data/qvh}
OUTPUT_DIR=${OUTPUT_DIR:-runs/qvh_videollama}
MODEL_PATH=${MODEL_PATH:-checkpoints/VideoLLaMA2.1-7B-AV.pth}

python -m mraudio_tpu.cli.finetune \
  --model VideoLLaMA \
  --model-path "${MODEL_PATH}" \
  --dataset QVH \
  --video-folder "${DATA_ROOT}/videos" \
  --train-annotation-file "${DATA_ROOT}/highlight_train_release.jsonl" \
  --val-annotation-file "${DATA_ROOT}/highlight_val_release.jsonl" \
  --output-dir "${OUTPUT_DIR}" \
  --batch-size "${BATCH_SIZE:-1}" \
  --max-epoch "${MAX_EPOCH:-50}" \
  "$@"
