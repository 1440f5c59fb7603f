"""Micro-benchmark: full-size LLM prefill in isolation.

Times one prefill pass (B=2, S=5353, int8 7B, chunked attention +
cache write) on the attached device, separating the decoder stack from
the encoders/interleave so the MFU gap can be attributed.  Ideal
compute time at v5e peak: 2*2*5353*6.6e9 FLOP ≈ 141 TFLOP → 0.72 s at
197 TFLOP/s bf16.

Run:  python scripts/microbench_prefill.py [--steps 3] [--seq 5353]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--seq", type=int, default=5353)
    ap.add_argument("--budget", type=int, default=64, help="decode slots")
    ap.add_argument("--dtype-weights", default="int8", choices=["int8", "none"])
    args = ap.parse_args()

    from bench import enable_compile_cache

    enable_compile_cache()

    from mraudio_tpu.config import LlamaConfig
    from mraudio_tpu.models.casting import cast_params_for_inference
    from mraudio_tpu.models.layers import positions_from_mask
    from mraudio_tpu.models.llama import LlamaModel, init_cache

    cfg = LlamaConfig(
        quantization="int8" if args.dtype_weights == "int8" else "none",
        kv_quant="int8",
    )
    model = LlamaModel(cfg, None)
    b, s = args.batch, args.seq
    max_len = s + args.budget

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(b, s, cfg.hidden_size)) * 0.1, jnp.bfloat16)
    mask01 = jnp.ones((b, s), jnp.int32)

    print("init params ...", flush=True)
    t0 = time.time()
    attend_tiny = jnp.ones((b, 1, 4, 4), bool)
    params = {"params": model.init(
        jax.random.PRNGKey(0), x[:, :4], attend_tiny,
        jnp.zeros((b, 4), jnp.int32), jnp.zeros((b, 4), jnp.int32),
        method=LlamaModel.init_all,
    )["params"]}
    params = cast_params_for_inference(params)
    print(f"  {time.time()-t0:.1f}s", flush=True)

    full_mask = jnp.zeros((b, max_len), jnp.int32).at[:, :s].set(mask01)
    positions = positions_from_mask(mask01)
    q_idx = jnp.arange(s)[:, None]
    k_idx = jnp.arange(max_len)[None, :]
    attend = ((k_idx <= q_idx)[None, None]) & full_mask[:, None, None, :].astype(bool)

    @jax.jit
    def prefill(params, x):
        cache = init_cache(cfg, b, max_len)
        hidden, cache = model.apply(
            params, x, attend, positions, cache=cache, cache_index=0,
            kv_valid=full_mask, causal=True, return_hidden=True,
        )
        # tiny consumer so nothing is dead-code-eliminated; skip lm_head
        # to time the stack itself
        return hidden[:, -1].sum(), jax.tree_util.tree_map(
            lambda a: a.ravel()[0], cache
        )

    print("compile ...", flush=True)
    t0 = time.time()
    out = prefill(params, x)
    jax.block_until_ready(out)
    print(f"  compile+1st: {time.time()-t0:.1f}s", flush=True)

    times = []
    for _ in range(args.steps):
        t0 = time.time()
        jax.block_until_ready(prefill(params, x))
        times.append(time.time() - t0)
    best = min(times)
    flops = 2 * b * s * 6.6e9  # ~6.6B matmul params in the 7B decoder
    print(f"prefill: best {best*1000:.0f} ms over {args.steps} "
          f"({flops/best/1e12:.1f} TFLOP/s, "
          f"{flops/best/197e12*100:.0f}% of v5e peak)  all={['%.2f' % t for t in times]}")


if __name__ == "__main__":
    main()
