"""Convert reference-format checkpoints into a persistent param store.

The reference re-loads and re-surgeries five torch checkpoints at every
launch (``/root/reference/models/xinstructblip.py:614-655,706-735`` plus
the HF Vicuna load at ``:147-163``); at 7B scale that is minutes of host
work per run.  This CLI runs the same conversion pipeline ONCE
(``models/convert_weights.py::load_pretrained_params`` — including the
key surgery, int8/int4 quantization, and scan_layers stacking the model
config asks for) and writes the finished param tree to an orbax store;
``--params-store DIR`` on evaluate/finetune/serve then restores it
directly, skipping init + conversion.

Usage:
    python -m mraudio_tpu.cli.convert \
        --model X-InstructBLIP --model-size full \
        --model-path /ckpts/vicuna7b-hf.pt \
        --audio-encoder /ckpts/BEATs_iter3_plus_AS2M.pt \
        --vit /ckpts/eva_vit_g.pth \
        --video-qformer /ckpts/video_qformer.pth \
        --audio-qformer /ckpts/audio_qformer_improved.pth \
        --blip2 /ckpts/blip2_pretrained.pth \
        --output /stores/xinstructblip_full
"""

from __future__ import annotations

import argparse
import logging
import os


def _meta_path(path: str) -> str:
    return os.path.abspath(path) + ".meta.json"


def save_param_store(path: str, params: dict, meta: dict | None = None) -> str:
    """Write a full param tree (nested dict of arrays) to ``path``; the
    config fingerprint goes to a ``<path>.meta.json`` sidecar (orbax
    payloads are arrays-only)."""
    import json

    import numpy as np
    import orbax.checkpoint as ocp
    from flax import traverse_util

    from mraudio_tpu.train.checkpoint import _flat_to_str

    path = os.path.abspath(path)
    flat = traverse_util.flatten_dict(params)
    payload = _flat_to_str({k: np.asarray(v) for k, v in flat.items()})
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    with open(_meta_path(path), "w") as f:
        json.dump(dict(meta or {}), f)
    return path


def load_param_store(path: str) -> dict:
    """Restore a param tree written by :func:`save_param_store`."""
    import orbax.checkpoint as ocp
    from flax import traverse_util

    from mraudio_tpu.train.checkpoint import _str_to_flat

    ckptr = ocp.StandardCheckpointer()
    payload = ckptr.restore(os.path.abspath(path))
    return traverse_util.unflatten_dict(_str_to_flat(payload))


def load_store_meta(path: str) -> dict:
    import json

    try:
        with open(_meta_path(path)) as f:
            return json.load(f)
    except FileNotFoundError:
        return {}


def resolve_params(model, cfg, params_store: str = "") -> dict:
    """The CLIs' param source: a prebuilt store when given (validated
    against the live model config), else the convert-at-load path."""
    if params_store:
        meta = load_store_meta(params_store)
        want = {
            "model_name": cfg.model_name,
            "quantization": cfg.model.llm.quantization,
            "scan_layers": bool(cfg.model.llm.scan_layers),
        }
        for k, v in want.items():
            if k in meta and meta[k] != v:
                raise ValueError(
                    f"param store {params_store} was converted with "
                    f"{k}={meta[k]!r} but this run's config wants {v!r} — "
                    "re-run mraudio_tpu.cli.convert with the matching config"
                )
        return load_param_store(params_store)
    from mraudio_tpu.models.convert_weights import load_pretrained_params

    return load_pretrained_params(model, cfg)


def main(argv=None):
    from mraudio_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    parser = argparse.ArgumentParser(
        description="convert reference checkpoints to a mraudio_tpu param store"
    )
    parser.add_argument("--model", default="X-InstructBLIP")
    parser.add_argument("--model-size", default="full", choices=["full", "tiny"])
    parser.add_argument("--config", default="", help="YAML RunConfig path")
    parser.add_argument("--output", required=True, help="param store dir to write")
    parser.add_argument("--model-path", default="",
                        help="LLM weights (HF Llama dir/state dict; for "
                             "VideoLLaMA, the merged AV checkpoint)")
    parser.add_argument("--audio-encoder", default="", help="BEATs .pt")
    parser.add_argument("--vit", default="", help="EVA-ViT-g .pth")
    parser.add_argument("--video-qformer", default="",
                        help="video Q-Former bundle .pth")
    parser.add_argument("--audio-qformer", default="",
                        help="audio Q-Former bundle .pth")
    parser.add_argument("--blip2", default="", help="BLIP-2 stage-1 .pth")
    args = parser.parse_args(argv)

    logging.basicConfig(level=logging.INFO)

    from mraudio_tpu.config import (
        DataConfig, RunConfig, full_model_config, tiny_data_config,
        tiny_model_config,
    )

    if args.config:
        cfg = RunConfig.from_yaml(args.config)
    elif args.model_size == "tiny":
        cfg = RunConfig(model=tiny_model_config(), data=tiny_data_config())
    else:
        cfg = RunConfig(
            model=full_model_config(), data=DataConfig.for_dataset("QVH")
        )
    cfg = cfg.replace(
        model_name=args.model,
        llm_weights=args.model_path or cfg.llm_weights,
        vit_weights=args.vit or cfg.vit_weights,
        beats_weights=args.audio_encoder or cfg.beats_weights,
        video_qformer_weights=args.video_qformer or cfg.video_qformer_weights,
        audio_qformer_weights=args.audio_qformer or cfg.audio_qformer_weights,
        blip2_stage1_weights=args.blip2 or cfg.blip2_stage1_weights,
    )

    from mraudio_tpu.models.convert_weights import load_pretrained_params
    from mraudio_tpu.models.factory import build_model

    model = build_model(cfg)
    params = load_pretrained_params(model, cfg)
    meta = {
        "model_name": cfg.model_name,
        "quantization": cfg.model.llm.quantization,
        "scan_layers": bool(cfg.model.llm.scan_layers),
    }
    path = save_param_store(args.output, params, meta)
    n = sum(
        x.size for x in __import__("jax").tree_util.tree_leaves(params)
    )
    print(f"wrote param store ({n} params) to {path}")


if __name__ == "__main__":
    main()
