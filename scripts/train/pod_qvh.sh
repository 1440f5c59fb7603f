#!/usr/bin/env bash
# Multi-host (TPU pod) QVHighlights fine-tune — the TPU-native
# counterpart of the reference's torchrun/SLURM launch
# (/root/reference/slurm_x.sh:31-37, scripts/train/X-InstructBLIP/
# qvh.sh:8: torch.distributed.run --nproc_per_node=$NUM_GPUS).
#
# On a TPU pod there is no per-process rank plumbing: run THIS SAME
# script on every host of the slice and `jax.distributed.initialize()`
# (the --distributed flag) discovers coordinator/rank from the TPU
# metadata.  Typical launch on a v5e-16 (2 hosts):
#
#   gcloud compute tpus tpu-vm ssh $TPU_NAME --worker=all \
#     --command="cd /path/to/repo && bash scripts/train/pod_qvh.sh"
#
# Sharding: the mesh comes from the YAML/MeshConfig — e.g. data=2,
# model=8 over 16 chips; the per-host loader shard, val-record
# allgather, metric sync, and rank-0 checkpointing key off
# jax.process_index()/process_count() (exercised for real at
# process_count=2 by scripts/multihost_dryrun.py; production-shape
# shardings AOT-validated per FULLSIZE_SPECS_r05.json — (2,4)/(4,2)/
# (1,8) all fit 16 GB per chip).
set -euo pipefail

ANNOT_TRAIN=${ANNOT_TRAIN:-data/highlight_train_release.jsonl}
ANNOT_VAL=${ANNOT_VAL:-data/highlight_val_release.jsonl}
VIDEO_DIR=${VIDEO_DIR:-videos}
OUT=${OUT:-output/qvh_pod}

python -m mraudio_tpu.cli.finetune \
    --distributed \
    --model X-InstructBLIP \
    --train-annotation-file "$ANNOT_TRAIN" \
    --val-annotation-file "$ANNOT_VAL" \
    --video-folder "$VIDEO_DIR" \
    --output-dir "$OUT" \
    --dataset QVH \
    --max-epoch 50 \
    "$@"
