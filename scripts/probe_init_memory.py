"""Diagnostic: where the HBM goes during full-size Trainer init.

Mirrors Trainer.__init__'s param staging (init_params -> split ->
frozen bf16 cast -> quant_frozen -> encoder host offload) and prints
device memory stats after each stage, to pin down why the
encoder_window probe OOMs at the host-offload readback
(/tmp/probe_encwin_int8.log).

Run: python scripts/probe_init_memory.py [--quant-frozen int8]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def stats(tag):
    import jax

    dev = jax.local_devices()[0]
    try:
        ms = dev.memory_stats()
        used = ms.get("bytes_in_use", -1)
        peak = ms.get("peak_bytes_in_use", -1)
        lim = ms.get("bytes_limit", ms.get("bytes_reservable_limit", -1))
        print(f"[{tag}] in_use={used/2**30:.2f} GiB peak={peak/2**30:.2f} "
              f"GiB limit={lim/2**30:.2f} GiB", flush=True)
    except Exception as e:  # axon may not implement memory_stats
        live = sum(
            a.nbytes for a in jax.live_arrays()
            if a.device == dev or dev in getattr(a, "devices", lambda: [])()
        )
        print(f"[{tag}] memory_stats unavailable ({type(e).__name__}: {e}); "
              f"live arrays={live/2**30:.2f} GiB", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quant-frozen", default="int8", choices=["none", "int8"])
    args = ap.parse_args()

    from bench import enable_compile_cache

    enable_compile_cache()

    import jax
    import numpy as np
    from flax import traverse_util

    from mraudio_tpu.config import DataConfig, RunConfig, TrainConfig, full_model_config
    from mraudio_tpu.models.factory import build_model

    model_cfg = full_model_config()
    model_cfg = model_cfg.replace(
        vit=model_cfg.vit.replace(grad_checkpoint=True),
        llm=model_cfg.llm.replace(
            grad_checkpoint=True, scan_layers=True, mlp_seq_chunk=512,
            attention_unroll_train=True,
        ),
    )
    cfg = RunConfig(
        model=model_cfg,
        data=DataConfig.for_dataset("QVH", video_source="synthetic"),
        train=TrainConfig(
            max_epoch=1, batch_size=1, output_dir="/tmp/probe_init_mem_out",
            quant_frozen=args.quant_frozen,
        ),
    )
    stats("start")
    model = build_model(cfg)
    t0 = time.time()
    params = model.init_params(jax.random.PRNGKey(0))
    jax.block_until_ready(jax.tree_util.tree_leaves(params)[0])
    print(f"init_params: {time.time() - t0:.1f}s", flush=True)
    stats("after init_params")

    from mraudio_tpu.train.trainer import DEFAULT_TRAINABLE_PATTERN, split_trainable

    pattern = getattr(model, "TRAINABLE_PATTERN", DEFAULT_TRAINABLE_PATTERN)
    trainable, frozen = split_trainable(params, pattern)

    from mraudio_tpu.models.casting import cast_params_for_inference

    frozen = traverse_util.flatten_dict(
        cast_params_for_inference(traverse_util.unflatten_dict(frozen))
    )
    stats("after bf16 cast (params tree still alive)")
    n_total = sum(x.size for x in jax.tree_util.tree_leaves(params))
    del params
    stats(f"after del params (n_total={n_total})")

    if args.quant_frozen == "int8":
        from mraudio_tpu.models.quant_tree import quantize_frozen

        frozen = quantize_frozen(frozen)
        stats("after quantize_frozen")

    enc_keys = model.ENCODER_PARAM_KEYS
    frozen_enc = {k: v for k, v in frozen.items() if k[0] in enc_keys}
    print(f"encoder leaves: {len(frozen_enc)}, "
          f"{sum(v.nbytes for v in frozen_enc.values())/2**30:.2f} GiB",
          flush=True)
    t0 = time.time()
    for i, k in enumerate(frozen_enc):
        host = np.asarray(frozen_enc[k])
        frozen_enc[k].delete()
        frozen[k] = host
        if i % 100 == 0:
            stats(f"offload {i}")
    print(f"host offload: {time.time() - t0:.1f}s", flush=True)
    stats("after encoder host offload")
    print("PROBE OK", flush=True)


if __name__ == "__main__":
    main()
