"""Inference CLI — the counterpart of the reference's ``evaluate.py``.

Flag surface matches the reference (``evaluate.py:63-78``) with
additions: ``--config`` (YAML RunConfig), ``--video-source`` (native /
synthetic / npy), ``--model-size`` (full / tiny) for weight-free smoke
runs.  ``--num-chunks/--chunk-idx`` shard for real.
"""

from __future__ import annotations

import argparse
import logging


def build_config(args):
    from mraudio_tpu.config import (
        DataConfig,
        RunConfig,
        full_model_config,
        tiny_data_config,
        tiny_model_config,
    )

    if args.config:
        cfg = RunConfig.from_yaml(args.config)
    elif args.model_size == "tiny":
        cfg = RunConfig(
            model=tiny_model_config(), data=tiny_data_config(n_frms=args.n_frms or 4)
        )
    else:
        # int8 weights + int8 KV: the bf16 default config cannot run on
        # one 16 GB chip (docs/BENCHMARKS.md "Memory").
        cfg = RunConfig(
            model=full_model_config(), data=DataConfig.for_dataset(args.dataset)
        )

    data = cfg.data.replace(
        video_folder=args.video_folder or cfg.data.video_folder,
        annotation_file=args.annotation_file or cfg.data.annotation_file,
        num_chunks=args.num_chunks,
        chunk_idx=args.chunk_idx,
    )
    if args.video_source:
        data = data.replace(video_source=args.video_source)
    return cfg.replace(
        model_name=args.model,
        data=data,
        llm_weights=args.model_path or cfg.llm_weights,
        beats_weights=args.audio_encoder or cfg.beats_weights,
    )


def main(argv=None):
    from mraudio_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    parser = argparse.ArgumentParser(description="mraudio_tpu batched inference")
    parser.add_argument("--model", default="X-InstructBLIP")
    parser.add_argument("--model-path", default="", help="converted LLM weights dir")
    parser.add_argument("--checkpoint", default="",
                        help="trained orbax checkpoint dir (checkpoint_best/"
                             "checkpoint_N from finetune) to overlay — the "
                             "reference's finetuned --model-path semantics "
                             "(evaluate.py:22, xinstructblip.py:769-816)")
    parser.add_argument("--audio-encoder", default="", help="converted BEATs weights")
    parser.add_argument("--video-folder", default="")
    parser.add_argument("--annotation-file", required=True)
    parser.add_argument("--output-file", required=True)
    parser.add_argument("--num-chunks", type=int, default=1)
    parser.add_argument("--chunk-idx", type=int, default=0)
    parser.add_argument("--batch-size", type=int, default=2)
    parser.add_argument("--num-workers", type=int, default=2)
    parser.add_argument("--dataset", default="QVH")
    parser.add_argument("--config", default="", help="YAML RunConfig path")
    parser.add_argument("--video-source", default="", choices=["", "native", "synthetic", "npy"])
    parser.add_argument("--model-size", default="full", choices=["full", "tiny"])
    parser.add_argument("--n-frms", type=int, default=0)
    parser.add_argument("--profile-dir", default="",
                        help="capture an xprof/TensorBoard device trace here")
    parser.add_argument("--no-batch-fallback", action="store_true",
                        help="fail instead of halving the batch on device OOM")
    parser.add_argument("--params-store", default="",
                        help="prebuilt param store from mraudio_tpu.cli.convert "
                             "(skips init + torch conversion at launch)")
    parser.add_argument("--quant-encoders", action="store_true",
                        help="int8-store the frozen encoder subtrees "
                             "(~1.35 GB HBM freed; approximation — the "
                             "reference keeps encoders fp16, see "
                             "docs/DIVERGENCES.md)")
    parser.add_argument(
        "--seq-shard", action="store_true",
        help="sequence parallelism for the prefill on model>1 meshes "
             "(LlamaConfig.seq_shard); predictions are identical.",
    )
    parser.add_argument("--fast", action="store_true",
                        help="the measured stacked-throughput preset "
                        "(+17%% at QVH full size): temporal-residual ViT "
                        "(K=4/R=64, an approximation), yuv420 wire, and "
                        "grammar-constrained decoding (every output "
                        "parses).  Quality-gated by "
                        "tests/test_fast_preset.py; exact runs omit it.")
    args = parser.parse_args(argv)

    logging.basicConfig(level=logging.INFO)
    cfg = build_config(args)
    if args.quant_encoders:
        cfg = cfg.replace(quant_encoders=True)
    if args.seq_shard:
        cfg = cfg.replace(model=cfg.model.replace(
            llm=cfg.model.llm.replace(seq_shard=True)))
    if args.fast:
        from mraudio_tpu.config import apply_fast_preset

        cfg = apply_fast_preset(cfg)

    from mraudio_tpu.cli.convert import resolve_params
    from mraudio_tpu.infer.evaluate import run_inference
    from mraudio_tpu.models.factory import build_model

    # --model dispatch, like the reference's evaluate.py:27-31
    model = build_model(cfg)
    params = resolve_params(model, cfg, args.params_store)
    if args.checkpoint:
        from mraudio_tpu.train.checkpoint import apply_trainable, load_checkpoint

        payload = load_checkpoint(args.checkpoint)
        params = apply_trainable(params, payload["model"])
        logging.getLogger("mraudio_tpu").info(
            "loaded trained checkpoint %s (epoch %s, %d trained leaves)",
            args.checkpoint, payload.get("epoch"), len(payload["model"]),
        )
    result = run_inference(
        cfg, model=model, params=params,
        output_file=args.output_file, batch_size=args.batch_size,
        num_workers=args.num_workers, profile_dir=args.profile_dir or None,
        batch_fallback=not args.no_batch_fallback,
    )
    print(f"wrote {len(result['records'])} predictions to {args.output_file} "
          f"({result['clips_per_sec']:.3f} clips/sec)")


if __name__ == "__main__":
    main()
