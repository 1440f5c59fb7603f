"""Decode weight-stream microbenchmark: what does one 7B GEMV sweep cost?

The engine decode step measures ~47 ms device-true (profile_engine_prefill
--stage decode) against an ~10 ms HBM floor (6.6 GB int8 weights + slot
KV at 820 GB/s).  Chief suspect: the weight-only int8 matmul converts the
weight to bf16 BEFORE the dot (`models/llama.py::LlamaLinear`), and if
XLA materializes that convert at GEMV shapes instead of fusing it into
the dot's weight read, every decode step streams int8(read) + bf16
(write+read) = 5 bytes/param instead of 1.

This benchmark times ONE full decode-shaped weight sweep (32 layers x
q,k,v,o,gate,up,down at Vicuna-7B dims, x chained through every layer so
nothing folds away) under several formulations:

  bf16      — bf16 weights, plain dot               (floor: 2 B/param)
  int8-cvt  — int8 weights, convert->dot            (the current path)
  int8-dot  — int8 x int8 -> int32 MXU dot          (W8A8 decode floor: 1 B/param)
  int8-mix  — x bf16 dot w int8 directly (mixed-operand dot)
  int8-scan — convert->dot tiled over column blocks (bounded temps)

Run: python scripts/microbench_decode_matmul.py [--batch 4] [--reps 5]
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

H, I, L = 4096, 11008, 32
SHAPES = [(H, H), (H, H), (H, H), (H, H), (H, I), (H, I), (I, H)]
BYTES_INT8 = L * sum(a * b for a, b in SHAPES)


def make_weights(key, dtype):
    ws = []
    for li in range(L):
        layer = []
        for si, (a, b) in enumerate(SHAPES):
            key = jax.random.fold_in(key, li * 16 + si)
            if dtype == jnp.int8:
                w = jax.random.randint(key, (a, b), -127, 127, jnp.int8)
                s = jnp.full((b,), 1.0 / 127.0, jnp.float32)
                layer.append((w, s))
            else:
                layer.append((jax.random.normal(key, (a, b), dtype) * 0.02, None))
        ws.append(layer)
    return ws


def chain(x, layer, matmul):
    # mimic one decoder layer's data flow cheaply: chain through every
    # projection so the sweep is one dependency chain (no dead code)
    q = matmul(x, *layer[0])
    k = matmul(x, *layer[1])
    v = matmul(x, *layer[2])
    o = matmul(q + k + v, *layer[3])
    g = matmul(o, *layer[4])
    u = matmul(o, *layer[5])
    d = matmul(jax.nn.silu(g) * u, *layer[6])
    return (x + o + d) * 0.5


def sweep_fn(matmul):
    def fn(x, ws):
        for layer in ws:
            x = chain(x, layer, matmul)
        return x

    return jax.jit(fn)


def mm_bf16(x, w, s):
    return jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(jnp.bfloat16)


def mm_int8_cvt(x, w, s):
    acc = jax.lax.dot_general(
        x, w.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return (acc * s).astype(jnp.bfloat16)


def mm_int8_dot(x, w, s):
    xf = x.astype(jnp.float32)
    xs = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
    xs = jnp.where(xs == 0, 1.0, xs)
    xq = jnp.round(xf / xs).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    return (acc.astype(jnp.float32) * (xs * s)).astype(jnp.bfloat16)


def mm_int8_mix(x, w, s):
    acc = jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    return (acc * s).astype(jnp.bfloat16)


def mm_vpu(x, w, s):
    # broadcast-multiply-reduce: if XLA lowers this to a fused VPU
    # streaming reduce, the weight read is HBM-bound instead of
    # MXU-tile-load-bound; if it materializes the (B, in, out) outer
    # product it will be catastrophically slower.  Either way, data.
    acc = jnp.sum(
        x.astype(jnp.float32)[:, :, None] * w.astype(jnp.float32)[None],
        axis=1,
    )
    return (acc * s).astype(jnp.bfloat16)


def mm_int8_splitk(x, w, s, g=32):
    # split the contraction dim into g batch groups: (g, B, in/g) x
    # (g, in/g, out) batched dot, then reduce over g — same bytes, but
    # gives the compiler g independent tile streams to overlap.
    b, infeat = x.shape
    xg = x.reshape(b, g, infeat // g).transpose(1, 0, 2)
    wg = w.reshape(g, infeat // g, w.shape[1]).astype(jnp.bfloat16)
    acc = jax.lax.dot_general(
        xg, wg, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (g, B, out)
    return (acc.sum(0) * s).astype(jnp.bfloat16)


def mm_int8_scan(x, w, s):
    # tile the OUTPUT columns: each block's convert is a bounded temp
    out = w.shape[1]
    block = next(c for c in (2048, 1376, 1024, 688, 512, 256) if out % c == 0)
    nb = out // block
    w3 = w.reshape(w.shape[0], nb, block).transpose(1, 0, 2)
    s2 = s.reshape(nb, block)

    def body(carry, wb_sb):
        wb, sb = wb_sb
        acc = jax.lax.dot_general(
            x, wb.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return carry, (acc * sb).astype(jnp.bfloat16)

    _, outs = jax.lax.scan(body, 0, (w3, s2))  # (nb, B, block)
    return outs.transpose(1, 0, 2).reshape(x.shape[0], -1)


def mm_int8_pallas(x, w, s):
    # the order-preserving Pallas GEMV (ops/gemv.py): double-buffered
    # weight-tile DMA with fixed ascending-k f32 accumulation — the
    # split-K throughput target WITHOUT split-K's reordering.  Only
    # runnable on a direct-attached TPU (Mosaic can't compile through
    # the remote tunnel; CLAUDE.md).
    from mraudio_tpu.ops.gemv import decode_gemv

    return decode_gemv(x, w, s, out_dtype=jnp.bfloat16)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--variants", default="bf16,int8-cvt,int8-dot,int8-mix,int8-scan")
    ap.add_argument("--pallas", action="store_true",
                    help="shorthand for --variants int8-cvt,int8-pallas "
                         "(direct-attached TPU only)")
    args = ap.parse_args()
    if args.pallas:
        args.variants = "int8-cvt,int8-pallas"

    from bench import enable_compile_cache

    enable_compile_cache()
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}; sweep = {BYTES_INT8/2**30:.2f} GB int8 "
          f"({2*BYTES_INT8/2**30:.2f} GB bf16)", flush=True)

    x0 = jnp.asarray(
        np.random.default_rng(0).normal(size=(args.batch, H)) * 0.1,
        jnp.bfloat16,
    )

    variants = {
        "bf16": (jnp.bfloat16, mm_bf16),
        "int8-cvt": (jnp.int8, mm_int8_cvt),
        "int8-dot": (jnp.int8, mm_int8_dot),
        "int8-mix": (jnp.int8, mm_int8_mix),
        "int8-scan": (jnp.int8, mm_int8_scan),
        "int8-vpu": (jnp.int8, mm_vpu),
        "int8-splitk": (jnp.int8, mm_int8_splitk),
        "int8-pallas": (jnp.int8, mm_int8_pallas),
    }
    for name in args.variants.split(","):
        wdtype, mm = variants[name]
        ws = make_weights(jax.random.PRNGKey(0), wdtype)
        ws = jax.tree_util.tree_map(lambda a: a, ws)
        jax.block_until_ready(jax.tree_util.tree_leaves(ws))
        fn = sweep_fn(mm)
        t0 = time.perf_counter()
        np.asarray(fn(x0, ws))          # value readback: honest sync
        comp = time.perf_counter() - t0
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            np.asarray(fn(x0, ws))
            times.append(time.perf_counter() - t0)
        med = sorted(times)[len(times) // 2]
        gbs = (BYTES_INT8 if wdtype == jnp.int8 else 2 * BYTES_INT8) / med / 1e9
        print(f"{name:10s}: med {med*1000:7.1f} ms  "
              f"({gbs:6.1f} GB/s weight stream)  "
              f"all={['%.3f' % t for t in times]}", flush=True)
        del ws
        import gc

        gc.collect()


if __name__ == "__main__":
    main()
