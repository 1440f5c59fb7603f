"""Probe: the full-size (7B int8 + EVA-ViT-g + BEATs) LoRA train step on
one 16 GB chip, with the memory levers selectable from the CLI.

The round-2 memory campaign (docs/BENCHMARKS.md "Full-size training")
ended ~1 GB short with bf16 frozen encoders; ``--quant-frozen int8``
stores them int8 (models/quant_tree.py), dequantized inside the
forward-only encoder program.  This script builds the real Trainer over
a synthetic 2-sample QVH-shaped dataset and runs one epoch, printing
per-step wall time.

Run: python scripts/probe_full_train.py [--quant-frozen int8]
        [--scan-layers] [--no-split] [--mlp-seq-chunk N]
        [--attention-unroll-train] [--batch 1]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quant-frozen", default="none", choices=["none", "int8"])
    ap.add_argument("--scan-layers", action="store_true")
    ap.add_argument("--no-split", action="store_true")
    ap.add_argument("--mlp-seq-chunk", type=int, default=0)
    ap.add_argument("--attention-unroll-train", action="store_true")
    ap.add_argument("--encoder-window", type=int, default=0)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--steps", type=int, default=2)
    args = ap.parse_args()

    from bench import enable_compile_cache

    enable_compile_cache()

    from mraudio_tpu.config import DataConfig, RunConfig, TrainConfig, full_model_config

    model_cfg = full_model_config()
    model_cfg = model_cfg.replace(
        vit=model_cfg.vit.replace(grad_checkpoint=True),
        llm=model_cfg.llm.replace(
            grad_checkpoint=True,
            scan_layers=args.scan_layers,
            mlp_seq_chunk=args.mlp_seq_chunk,
            attention_unroll_train=args.attention_unroll_train,
        ),
    )
    ann = "/tmp/probe_full_train.jsonl"
    with open(ann, "w") as f:
        for i in range(args.batch * args.steps):
            f.write(json.dumps({
                "vid": f"v{i}", "qid": i, "query": "a person waves at the camera",
                "duration": 150, "relevant_windows": [[10, 30]],
            }) + "\n")
    cfg = RunConfig(
        model=model_cfg,
        data=DataConfig.for_dataset("QVH", video_source="synthetic"),
        train=TrainConfig(
            max_epoch=1, batch_size=args.batch, warmup_steps=2,
            accum_grad_iters=1, output_dir="/tmp/probe_full_train_out",
            val_freq=5, save_freq=5, quant_frozen=args.quant_frozen,
            split_encode_step=not args.no_split, num_workers=1,
            encoder_window=args.encoder_window,
        ),
    )
    cfg = cfg.replace(data=cfg.data.replace(
        train_annotation_file=ann, val_annotation_file=ann
    ))

    from mraudio_tpu.train.trainer import Trainer

    print("build trainer (init params) ...", flush=True)
    t0 = time.time()
    trainer = Trainer(cfg)
    print(f"  {time.time() - t0:.1f}s", flush=True)

    print("train_epoch(0) [first step = compile] ...", flush=True)
    t0 = time.time()
    trainer.train_epoch(0)
    dt = time.time() - t0
    print(f"PROBE OK: epoch of {args.steps} steps in {dt:.1f}s "
          f"(quant_frozen={args.quant_frozen}, scan_layers={args.scan_layers}, "
          f"split={not args.no_split}, mlp_seq_chunk={args.mlp_seq_chunk})",
          flush=True)


if __name__ == "__main__":
    main()
