"""Pallas flash attention for the LLM prefill.

At QVH shapes the interleaved prefill is ~4.7k tokens; materializing the
(B, 32, 4.7k, 4.7k) fp32 logits the naive path needs costs ~5.6 GB of
HBM — more than a v5e chip can spare next to a 7B model.  This kernel
computes attention with online softmax over (block_q × block_k) tiles
held in VMEM, so HBM traffic is O(S·D) instead of O(S²).

Supports a causal structure plus an arbitrary per-position validity mask
(B, S) — required here because padding occurs *inside* the sequence
(per-frame timestamp slots), not just at the edges.  Softmax statistics
accumulate in fp32; matmuls hit the MXU via ``jnp.dot`` with
``preferred_element_type``.

Decode steps (q_len = 1) stay on the plain einsum path — a 1×S product
has no tiling to win.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


@functools.partial(
    jax.jit,
    static_argnames=("causal", "block_k", "block_q", "causal_skip", "unroll_q"),
)
def chunked_attention(
    q: jax.Array,          # (B, H, S, D)
    k: jax.Array,          # (B, H, KV, D)
    v: jax.Array,          # (B, H, KV, D)
    mask: jax.Array,       # (B, KV) {0,1} validity
    causal: bool = True,
    block_k: int = 512,
    block_q: int = 512,
    causal_skip: bool = True,
    unroll_q: bool = False,
) -> jax.Array:
    """Online-softmax attention in pure XLA: an outer ``lax.map`` over
    query tiles and an inner ``lax.scan`` over kv chunks with running
    (max, sum, acc) statistics.  Temporaries are O(block_q x block_k)
    per step — tiling *both* axes is what lets a B=2, 5.3k-token
    prefill fit next to a 7B model (untiled queries cost a
    (B, H, S, block_k) fp32 logits buffer = GBs at that shape).  Same
    O(S·D) HBM footprint as the Pallas kernel, compiled through the
    ordinary XLA path — the portable default (the Mosaic custom-call
    path is not available behind every TPU frontend).

    ``unroll_q=True`` unrolls the query tiles at trace time, giving each
    tile a *static* kv-chunk upper bound so above-diagonal work is
    structurally absent from the HLO (vs the ``lax.cond`` skip whose win
    depends on the scheduler) — measured 24% faster at QVH prefill shape
    on v5e (docs/BENCHMARKS.md).  The generate prefill uses it; training
    keeps the scanned outer loop, whose backward has the proven memory
    profile at full-size shapes."""
    b, h, s, d = q.shape
    orig_s = s
    kv_len = k.shape[2]
    pad_k = (-kv_len) % block_k
    if pad_k:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad_k), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad_k), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, pad_k)))
        kv_len += pad_k
    num_chunks = kv_len // block_k

    block_q = min(block_q, max(s, 1))
    pad_q = (-s) % block_q
    if pad_q:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad_q), (0, 0)))
        s += pad_q
    num_q = s // block_q

    scale = 1.0 / math.sqrt(d)

    # K/V/Q stay in their natural (B, H, S, D) layout; each loop body
    # dynamic-slices its tile.  Pre-stacking chunks as scan xs makes the
    # backward materialize a (num_q, num_chunks, B, H, block_k, D) fp32
    # cotangent buffer (≈1 GB per layer at QVH training shapes — the
    # round-2 full-size train OOM); sliced captures accumulate into
    # K/V-shaped cotangents instead.
    def q_tile(qb_idx, static_upper=None):
        q_blk = jax.lax.dynamic_slice_in_dim(q, qb_idx * block_q, block_q, 2)
        q32 = q_blk.astype(jnp.float32) * scale
        q_pos = (qb_idx * block_q
                 + jnp.arange(block_q)[None, None, :, None])  # (1,1,bq,1)
        q_end = qb_idx * block_q + block_q - 1  # last query position

        def compute(carry, c_idx):
            acc, m_i, l_i = carry
            k_blk = jax.lax.dynamic_slice_in_dim(k, c_idx * block_k, block_k, 2)
            v_blk = jax.lax.dynamic_slice_in_dim(v, c_idx * block_k, block_k, 2)
            m_blk = jax.lax.dynamic_slice_in_dim(mask, c_idx * block_k, block_k, 1)
            logits = jnp.einsum(
                "bhsd,bhkd->bhsk", q32, k_blk.astype(jnp.float32),
                preferred_element_type=jnp.float32,
            )
            valid = m_blk[:, None, None, :].astype(bool)
            if causal:
                kv_pos = c_idx * block_k + jnp.arange(block_k)[None, None, None, :]
                valid = valid & (kv_pos <= q_pos)
            logits = jnp.where(valid, logits, NEG_INF)

            m_new = jnp.maximum(m_i, jnp.max(logits, axis=-1, keepdims=True))
            p = jnp.where(valid, jnp.exp(logits - m_new), 0.0)
            alpha = jnp.exp(m_i - m_new)
            l_new = alpha * l_i + jnp.sum(p, axis=-1, keepdims=True)
            acc = acc * alpha + jnp.einsum(
                "bhsk,bhkd->bhsd", p, v_blk.astype(jnp.float32),
                preferred_element_type=jnp.float32,
            )
            return acc, m_new, l_new

        def step(carry, c_idx):
            if static_upper is not None:
                # the chunk list is already causally clipped
                carry = compute(carry, c_idx)
            elif causal and causal_skip:
                # Skip chunks entirely above the causal diagonal for this
                # query tile — halves attention matmuls+exps at long S.
                # lax.cond executes one branch on TPU and stays
                # differentiable for the training path.
                carry = jax.lax.cond(
                    c_idx * block_k > q_end,
                    lambda c: c,
                    lambda c: compute(c, c_idx),
                    carry,
                )
            else:
                carry = compute(carry, c_idx)
            return carry, None

        init = (
            jnp.zeros((b, h, block_q, d), jnp.float32),
            jnp.full((b, h, block_q, 1), NEG_INF, jnp.float32),
            jnp.zeros((b, h, block_q, 1), jnp.float32),
        )
        # Remat each chunk: without this the scan's backward saves every
        # chunk's probability tile across every layer — at QVH scale
        # that is hundreds of GB.  Recomputing a chunk forward is one
        # small matmul.
        (acc, _, l_i), _ = jax.lax.scan(
            jax.checkpoint(step, prevent_cse=False),
            init,
            jnp.arange(num_chunks if static_upper is None else static_upper),
        )
        safe_l = jnp.where(l_i == 0, 1.0, l_i)
        return (acc / safe_l).astype(q.dtype)

    if unroll_q:
        tiles = []
        for qb in range(num_q):
            if causal:
                upper = min((qb * block_q + block_q + block_k - 1) // block_k,
                            num_chunks)
            else:
                upper = num_chunks
            tiles.append(q_tile(qb, static_upper=max(upper, 1)))
        out = jnp.concatenate(tiles, axis=2)
        return out[:, :, :orig_s]

    _, tiles = jax.lax.scan(
        lambda carry, qb_idx: (carry, q_tile(qb_idx)),
        None,
        jnp.arange(num_q),
    )  # tiles: (nq, B, H, bq, D)
    out = tiles.transpose(1, 2, 0, 3, 4).reshape(b, h, s, d)
    return out[:, :, :orig_s]


def _flash_kernel(
    mask_ref,     # (1, S) int8 validity for this batch row
    q_ref,        # (1, 1, block_q, D)
    k_ref,        # (1, 1, S, D)
    v_ref,        # (1, 1, S, D)
    o_ref,        # (1, 1, block_q, D)
    *,
    block_k: int,
    scale: float,
    causal: bool,
):
    block_q, d = q_ref.shape[2], q_ref.shape[3]
    seq_len = k_ref.shape[2]
    num_kv = seq_len // block_k
    batch_idx = pl.program_id(0)
    q_idx = pl.program_id(2)

    q = q_ref[0, 0].astype(jnp.float32) * scale

    acc = jnp.zeros((block_q, d), jnp.float32)
    m_i = jnp.full((block_q, 1), NEG_INF, jnp.float32)
    l_i = jnp.zeros((block_q, 1), jnp.float32)

    q_positions = q_idx * block_q + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_k), 0
    )

    def body(kv_idx, carry):
        acc, m_i, l_i = carry
        k_blk = k_ref[0, 0, pl.ds(kv_idx * block_k, block_k), :].astype(jnp.float32)
        v_blk = v_ref[0, 0, pl.ds(kv_idx * block_k, block_k), :].astype(jnp.float32)

        s = jnp.dot(q, k_blk.T, preferred_element_type=jnp.float32)

        kv_positions = kv_idx * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1
        )
        valid = mask_ref[pl.ds(batch_idx, 1), pl.ds(kv_idx * block_k, block_k)] > 0
        mask = jnp.broadcast_to(valid, (block_q, block_k))
        if causal:
            mask = mask & (kv_positions <= q_positions)
        s = jnp.where(mask, s, NEG_INF)

        m_new = jnp.maximum(m_i, jnp.max(s, axis=-1, keepdims=True))
        # explicit zero for masked entries: when a whole row is masked,
        # s - m_new == 0 and exp would resurrect them
        p = jnp.where(mask, jnp.exp(s - m_new), 0.0)
        alpha = jnp.exp(m_i - m_new)
        l_new = alpha * l_i + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.dot(p, v_blk, preferred_element_type=jnp.float32)
        return acc, m_new, l_new

    if causal:
        # only kv blocks that intersect the causal triangle
        upper = jax.lax.div(q_idx * block_q + block_q + block_k - 1, block_k)
        upper = jnp.minimum(upper, num_kv)
    else:
        upper = num_kv
    acc, m_i, l_i = jax.lax.fori_loop(0, upper, body, (acc, m_i, l_i))

    # fully-masked rows (padding queries) produce l=0 → emit zeros
    safe_l = jnp.where(l_i == 0, 1.0, l_i)
    o_ref[0, 0] = (acc / safe_l).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("causal", "block_q", "block_k", "interpret")
)
def flash_attention(
    q: jax.Array,          # (B, H, S, D)
    k: jax.Array,          # (B, H, S, D)
    v: jax.Array,          # (B, H, S, D)
    mask: jax.Array,       # (B, S) {0,1} validity
    causal: bool = True,
    block_q: int = 128,
    block_k: int = 128,
    interpret: bool = False,
) -> jax.Array:
    b, h, s, d = q.shape
    kv_len = k.shape[2]
    orig_s = s
    pad_q = (-s) % block_q
    if pad_q:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad_q), (0, 0)))
        s = s + pad_q
    pad_k = (-kv_len) % block_k
    if pad_k:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad_k), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad_k), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, pad_k)))
        kv_len = kv_len + pad_k

    scale = 1.0 / math.sqrt(d)
    grid = (b, h, s // block_q)

    out = pl.pallas_call(
        functools.partial(
            _flash_kernel, block_k=block_k, scale=scale, causal=causal
        ),
        grid=grid,
        in_specs=[
            # full mask resident in VMEM (TPU blocks need last-two-dims
            # alignment; the whole (B, KV) int8 array is tiny)
            pl.BlockSpec((b, kv_len), lambda bi, hi, qi: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, kv_len, d), lambda bi, hi, qi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, kv_len, d), lambda bi, hi, qi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, block_q, d), lambda bi, hi, qi: (bi, hi, qi, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, s, d), q.dtype),
        interpret=interpret,
    )(mask.astype(jnp.int8), q, k, v)

    return out[:, :, :orig_s]
