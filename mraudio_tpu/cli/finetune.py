"""Training CLI — the counterpart of the reference's ``finetune.py``.

No ``init_distributed_mode``/NCCL dance: ``jax.distributed.initialize``
is automatic on TPU pods, and all cross-chip communication comes from
sharding annotations.  Flag surface matches ``finetune.py:42-61`` plus
``--config`` / ``--model-size`` / ``--video-source``.
"""

from __future__ import annotations

import argparse
import logging


def main(argv=None):
    from mraudio_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    parser = argparse.ArgumentParser(description="mraudio_tpu finetuning")
    parser.add_argument("--model", default="X-InstructBLIP")
    parser.add_argument("--model-path", default="")
    parser.add_argument("--audio-encoder", default="")
    parser.add_argument("--video-folder", default="")
    parser.add_argument("--train-annotation-file", required=True)
    parser.add_argument("--val-annotation-file", required=True)
    parser.add_argument("--output-dir", required=True)
    parser.add_argument("--val-freq", type=int, default=1)
    parser.add_argument("--save-freq", type=int, default=1)
    parser.add_argument("--max-epoch", type=int, default=50)
    parser.add_argument("--batch-size", type=int, default=1)
    parser.add_argument("--num-workers", type=int, default=2)
    parser.add_argument("--dataset", default="QVH")
    parser.add_argument("--config", default="")
    parser.add_argument("--video-source", default="", choices=["", "native", "synthetic", "npy"])
    parser.add_argument("--model-size", default="full", choices=["full", "tiny"])
    parser.add_argument("--resume", default="", help="checkpoint dir to resume from")
    parser.add_argument(
        "--quant-frozen", default="", choices=["", "none", "int8"],
        help="store frozen weights int8, dequantized inside the jitted "
        "step (models/quant_tree.py) — the memory lever that fits the "
        "full-size 7B LoRA step on one 16 GB chip",
    )
    parser.add_argument(
        "--optimizer", default="adamw", choices=["adamw", "adam"],
        help="'adamw' = the reference's intended optimizer; "
             "'adam' reproduces its live (buggy) plain-Adam override",
    )
    parser.add_argument("--params-store", default="",
                        help="prebuilt param store from mraudio_tpu.cli.convert")
    parser.add_argument(
        "--single-chip", action="store_true",
        help="apply the measured one-16GB-chip full-size memory stack: "
             "quant_frozen=int8 + scan_layers + attention_unroll_train + "
             "encoder_window=12 (probed working at B=1/B=2; "
             "docs/BENCHMARKS.md 'Full-size training' — mlp_seq_chunk is "
             "NOT needed once the encoders are host-evicted, and dropping "
             "it is 24%% faster per step). On a multi-chip mesh, shard "
             "over the model axis instead.",
    )
    parser.add_argument(
        "--seq-shard", action="store_true",
        help="sequence parallelism on model>1 meshes: shard the "
             "decoder's residual-stream S axis over the model axis "
             "between the TP matmuls (LlamaConfig.seq_shard; "
             "-1.1 GiB/device train temps at (2,4) production shape, "
             "outputs identical — docs/BENCHMARKS.md round 5).",
    )
    parser.add_argument(
        "--distributed", action="store_true",
        help="multi-host (pod) launch: call jax.distributed.initialize() "
             "before any jax use — auto-configured on TPU pods (each host "
             "discovers its coordinator/rank from the TPU metadata; no "
             "env-var dance like the reference's init_distributed_mode, "
             "finetune.py:9-30).  Run the SAME command on every host: "
             "scripts/train/pod_qvh.sh.  Loader sharding, val allgather, "
             "metric sync, and rank-0 checkpoint gating all key off "
             "jax.process_index()/process_count() (proven at "
             "process_count=2 by scripts/multihost_dryrun.py).",
    )
    args = parser.parse_args(argv)

    logging.basicConfig(level=logging.INFO)
    if args.distributed:
        import jax

        jax.distributed.initialize()
        logging.getLogger("mraudio_tpu").info(
            "distributed: process %d/%d, %d local + %d global devices",
            jax.process_index(), jax.process_count(),
            len(jax.local_devices()), len(jax.devices()),
        )

    from mraudio_tpu.config import (
        DataConfig, RunConfig, full_model_config, tiny_data_config,
        tiny_model_config,
    )

    if args.config:
        cfg = RunConfig.from_yaml(args.config)
    elif args.model_size == "tiny":
        cfg = RunConfig(model=tiny_model_config(), data=tiny_data_config())
    else:
        # int8 frozen base + bf16 LoRA adapters — the reference trains
        # LoRA over a bitsandbytes 8-bit base (load_in_8bit,
        # /root/reference/models/xinstructblip.py:151); full-size
        # training also needs rematerialization (measured: backward
        # without it wants >250GB HBM at QVH shapes; docs/BENCHMARKS.md)
        model = full_model_config()
        cfg = RunConfig(
            model=model.replace(
                vit=model.vit.replace(grad_checkpoint=True),
                llm=model.llm.replace(grad_checkpoint=True),
            ),
            data=DataConfig.for_dataset(args.dataset),
        )

    cfg = cfg.replace(
        model_name=args.model,
        data=cfg.data.replace(
            video_folder=args.video_folder or cfg.data.video_folder,
            train_annotation_file=args.train_annotation_file,
            val_annotation_file=args.val_annotation_file,
            **({"video_source": args.video_source} if args.video_source else {}),
        ),
        train=cfg.train.replace(
            output_dir=args.output_dir,
            val_freq=args.val_freq,
            save_freq=args.save_freq,
            max_epoch=args.max_epoch,
            batch_size=args.batch_size,
            num_workers=args.num_workers,
            resume_ckpt_path=args.resume,
            **({"quant_frozen": args.quant_frozen} if args.quant_frozen else {}),
        ),
        llm_weights=args.model_path,
        beats_weights=args.audio_encoder,
    )
    if args.seq_shard:
        cfg = cfg.replace(model=cfg.model.replace(
            llm=cfg.model.llm.replace(seq_shard=True)))
    if args.single_chip:
        cfg = cfg.replace(
            model=cfg.model.replace(
                vit=cfg.model.vit.replace(grad_checkpoint=True),
                llm=cfg.model.llm.replace(
                    grad_checkpoint=True, scan_layers=True,
                    attention_unroll_train=True,
                ),
            ),
            train=cfg.train.replace(
                quant_frozen="int8", split_encode_step=True,
                # W=12 measured at B=2 (bench train profile): the
                # per-window encoder upload (1.44 GB, wire-bound)
                # amortizes to ~1/12 per step — 12.15 s/step e2e, MFU
                # 0.29; W batches of modal tokens (~43 MB each at B=1)
                # stay device-resident during the step phase, so W is
                # bounded by HBM, not wall clock
                encoder_window=max(cfg.train.encoder_window, 12),
            ),
        )

    from mraudio_tpu.cli.convert import resolve_params
    from mraudio_tpu.models.factory import build_model
    from mraudio_tpu.train.trainer import Trainer

    # --model dispatch, like the reference's utils/trainer.py:50-56
    model = build_model(cfg)
    # params_fn (not params=): the trainer must be the sole owner of the
    # init tree so its internal `del` actually frees the pre-cast
    # originals during the windowed encoder offload (full-size HBM)
    trainer = Trainer(
        cfg, model=model, optimizer=args.optimizer,
        params_fn=lambda: resolve_params(model, cfg, args.params_store),
    )
    summary = trainer.train()
    print(f"best epoch {summary['best_epoch']}: MR-full-R1-avg {summary['best_metric']}")


if __name__ == "__main__":
    main()
