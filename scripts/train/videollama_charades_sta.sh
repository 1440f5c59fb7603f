#!/usr/bin/env bash
# Charades-STA LoRA finetuning with the VideoLLaMA backbone.
#
# The reference's slurm_train_v.sh:38 calls
# scripts/train/VideoLLaMA/charades_sta.sh, which does not exist, and its
# VideoLLaMA wrapper cannot train at all (models/videollama.py:3 is not an
# nn.Module; utils/trainer.py:56-69 would crash).  Here the backbone is a
# first-class trainable model (LoRA + connector/audio projector), so the
# broken path becomes a working one — documented in docs/DIVERGENCES.md.
set -euo pipefail
DATA_ROOT=${DATA_ROOT:-data/charades_sta}
OUTPUT_DIR=${OUTPUT_DIR:-runs/charades_sta_videollama}
MODEL_PATH=${MODEL_PATH:-checkpoints/VideoLLaMA2.1-7B-AV.pth}

python -m mraudio_tpu.cli.finetune \
  --model VideoLLaMA \
  --model-path "${MODEL_PATH}" \
  --dataset Charades_STA \
  --video-folder "${DATA_ROOT}/videos" \
  --train-annotation-file "${DATA_ROOT}/charades_sta_train.jsonl" \
  --val-annotation-file "${DATA_ROOT}/charades_sta_val.jsonl" \
  --output-dir "${OUTPUT_DIR}" \
  --batch-size "${BATCH_SIZE:-1}" \
  --max-epoch "${MAX_EPOCH:-50}" \
  "$@"
