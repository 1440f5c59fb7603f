"""Micro-benchmark: chunked_attention variants at QVH prefill shape.

Times one LLM layer's attention at (B=2, H=32, S=5353, D=128) bf16 on
the attached device.  Used to pick the production configuration of
``ops/attention.py`` (results recorded in docs/BENCHMARKS.md).

Run:  python scripts/microbench_attention.py [--steps 10]
"""

from __future__ import annotations

import argparse
import functools
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mraudio_tpu.ops.attention import chunked_attention

NEG_INF = -1e30


@functools.partial(jax.jit, static_argnames=("block_q", "block_k"))
def static_causal_attention(q, k, v, mask, block_q=512, block_k=512):
    """Statically-unrolled q tiles, each scanning only the kv chunks at or
    below its causal diagonal.  Unlike the lax.cond chunk-skip, the
    above-diagonal work is *structurally absent* from the HLO."""
    b, h, s, d = q.shape
    orig_s = s
    kv_len = k.shape[2]
    pad_k = (-kv_len) % block_k
    if pad_k:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad_k), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad_k), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, pad_k)))
        kv_len += pad_k
    block_q = min(block_q, max(s, 1))
    pad_q = (-s) % block_q
    if pad_q:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad_q), (0, 0)))
        s += pad_q
    num_q = s // block_q
    scale = 1.0 / math.sqrt(d)

    tiles = []
    for qb in range(num_q):
        q_blk = q[:, :, qb * block_q:(qb + 1) * block_q]
        q32 = q_blk.astype(jnp.float32) * scale
        q_pos = qb * block_q + jnp.arange(block_q)[None, None, :, None]
        # kv chunks that intersect the causal triangle for this tile
        upper = min((qb * block_q + block_q + block_k - 1) // block_k,
                    kv_len // block_k)

        def compute(carry, c_idx, q32=q32, q_pos=q_pos):
            acc, m_i, l_i = carry
            k_blk = jax.lax.dynamic_slice_in_dim(k, c_idx * block_k, block_k, 2)
            v_blk = jax.lax.dynamic_slice_in_dim(v, c_idx * block_k, block_k, 2)
            m_blk = jax.lax.dynamic_slice_in_dim(mask, c_idx * block_k, block_k, 1)
            logits = jnp.einsum("bhsd,bhkd->bhsk", q32, k_blk.astype(jnp.float32),
                                preferred_element_type=jnp.float32)
            kv_pos = c_idx * block_k + jnp.arange(block_k)[None, None, None, :]
            valid = m_blk[:, None, None, :].astype(bool) & (kv_pos <= q_pos)
            logits = jnp.where(valid, logits, NEG_INF)
            m_new = jnp.maximum(m_i, jnp.max(logits, axis=-1, keepdims=True))
            p = jnp.where(valid, jnp.exp(logits - m_new), 0.0)
            alpha = jnp.exp(m_i - m_new)
            l_new = alpha * l_i + jnp.sum(p, axis=-1, keepdims=True)
            acc = acc * alpha + jnp.einsum(
                "bhsk,bhkd->bhsd", p, v_blk.astype(jnp.float32),
                preferred_element_type=jnp.float32)
            return (acc, m_new, l_new), None

        init = (jnp.zeros((b, h, block_q, d), jnp.float32),
                jnp.full((b, h, block_q, 1), NEG_INF, jnp.float32),
                jnp.zeros((b, h, block_q, 1), jnp.float32))
        (acc, _, l_i), _ = jax.lax.scan(
            jax.checkpoint(compute, prevent_cse=False), init, jnp.arange(upper))
        safe_l = jnp.where(l_i == 0, 1.0, l_i)
        tiles.append((acc / safe_l).astype(q.dtype))
    out = jnp.concatenate(tiles, axis=2)
    return out[:, :, :orig_s]


@functools.partial(jax.jit, static_argnames=("block_q",))
def static_fullk_attention(q, k, v, mask, block_q=512):
    """Per-q-tile *plain* softmax over the (static) causal kv prefix — one
    exp pass, no online carry; temp logits are (B,H,block_q,<=S) fp32."""
    b, h, s, d = q.shape
    orig_s = s
    kv_len = k.shape[2]
    block_q = min(block_q, max(s, 1))
    pad_q = (-s) % block_q
    if pad_q:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad_q), (0, 0)))
        s += pad_q
    num_q = s // block_q
    scale = 1.0 / math.sqrt(d)

    tiles = []
    for qb in range(num_q):
        q_blk = q[:, :, qb * block_q:(qb + 1) * block_q]
        upper = min(qb * block_q + block_q, kv_len)
        # round kv prefix up to 512 for layout friendliness
        upper = min((upper + 511) // 512 * 512, kv_len)
        k_pre = k[:, :, :upper]
        v_pre = v[:, :, :upper]
        logits = jnp.einsum("bhsd,bhkd->bhsk",
                            q_blk.astype(jnp.float32) * scale,
                            k_pre.astype(jnp.float32),
                            preferred_element_type=jnp.float32)
        q_pos = qb * block_q + jnp.arange(block_q)[None, None, :, None]
        kv_pos = jnp.arange(upper)[None, None, None, :]
        valid = mask[:, None, None, :upper].astype(bool) & (kv_pos <= q_pos)
        logits = jnp.where(valid, logits, NEG_INF)
        p = jax.nn.softmax(logits, axis=-1)
        p = jnp.where(valid, p, 0.0)
        tiles.append(jnp.einsum("bhsk,bhkd->bhsd", p, v_pre.astype(jnp.float32),
                                preferred_element_type=jnp.float32).astype(q.dtype))
    out = jnp.concatenate(tiles, axis=2)
    return out[:, :, :orig_s]


REPEAT = 4


def timeit(fn, args, steps):
    """Times ``REPEAT`` chained executions inside ONE jit dispatch (each
    iteration feeds its output back as q, forcing sequential execution),
    so per-dispatch tunnel noise is amortized away.  Returns
    (per-execution seconds, single-execution output)."""
    q, rest = args[0], args[1:]
    out = fn(q, *rest)
    jax.block_until_ready(out)

    @jax.jit
    def chained(q):
        def body(qc, _):
            o = fn(qc, *rest)
            return o.astype(q.dtype), None
        o, _ = jax.lax.scan(body, q, None, length=REPEAT)
        return o

    jax.block_until_ready(chained(q))  # compile
    times = []
    for _ in range(steps):
        t0 = time.time()
        jax.block_until_ready(chained(q))
        times.append(time.time() - t0)
    return min(times) / REPEAT, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--seq", type=int, default=5353)
    ap.add_argument("--variants", default="",
                    help="comma-separated substring filter on variant names")
    args = ap.parse_args()

    b, h, s, d = args.batch, 32, args.seq, 128
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(b, h, s, d)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(b, h, s, d)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(b, h, s, d)), jnp.bfloat16)
    mask = jnp.ones((b, s), jnp.int32)
    # interior padding like the timestamp slots
    mask = mask.at[:, 100:140].set(0)

    variants = {
        "chunked(skip=False)": lambda q: chunked_attention(q, k, v, mask, causal_skip=False),
        "chunked(skip=True)": lambda q: chunked_attention(q, k, v, mask, causal_skip=True),
        "static_unroll(512/512)": lambda q: static_causal_attention(q, k, v, mask),
        "static_unroll(1024/512)": lambda q: static_causal_attention(q, k, v, mask, block_q=1024),
        "static_unroll(512/1024)": lambda q: static_causal_attention(q, k, v, mask, block_k=1024),
        "static_fullk(512)": lambda q: static_fullk_attention(q, k, v, mask),
        "static_fullk(256)": lambda q: static_fullk_attention(q, k, v, mask, block_q=256),
    }

    if args.variants:
        keys = [k.strip() for k in args.variants.split(",") if k.strip()]
        variants = {n: f for n, f in variants.items()
                    if any(k in n for k in keys)}

    ref = None
    for name, fn in variants.items():
        try:
            dt, out = timeit(fn, (q,), args.steps)
        except Exception as e:  # OOM etc.
            print(f"{name:28s} FAILED: {type(e).__name__}: {str(e)[:120]}")
            continue
        if ref is None:
            ref = np.asarray(out, np.float32)
            err = 0.0
        else:
            err = float(np.max(np.abs(np.asarray(out, np.float32) - ref)))
        print(f"{name:28s} {dt * 1e3:8.2f} ms   max|Δ|={err:.2e}")


if __name__ == "__main__":
    main()
