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

from mraudio_tpu.models.layers import NEG_INF


def pack_int4(q: jax.Array) -> jax.Array:
    """Pack int8 values in [-8, 7] into uint8 nibble pairs along the last
    axis: element ``i`` of the first half goes to the low nibble, element
    ``i`` of the second half to the high nibble (the same plane
    convention as the int4 weight path, ``models/llama.py``)."""
    d = q.shape[-1]
    lo = q[..., : d // 2].astype(jnp.int32)
    hi = q[..., d // 2:].astype(jnp.int32)
    return (((hi & 15) << 4) | (lo & 15)).astype(jnp.uint8)


def unpack_int4(packed: jax.Array) -> jax.Array:
    """Inverse of :func:`pack_int4`: uint8 (..., D/2) → int8 (..., D).
    Arithmetic shifts sign-extend each nibble."""
    i8 = jax.lax.bitcast_convert_type(packed, jnp.int8)
    lo = jax.lax.shift_right_arithmetic(
        jax.lax.shift_left(i8, jnp.int8(4)), jnp.int8(4)
    )
    hi = jax.lax.shift_right_arithmetic(i8, jnp.int8(4))
    return jnp.concatenate([lo, hi], axis=-1)


@functools.partial(
    jax.jit,
    static_argnames=("causal", "block_k", "block_q", "causal_skip", "unroll_q",
                     "kv_bshd", "q_bshd", "q_offset", "kv_packed",
                     "scales_bhs"),
)
def chunked_attention(
    q: jax.Array,          # (B, H, S, D); (B, S, H, D) with q_bshd=True
    k: jax.Array,          # (B, H, KV, D) — bf16, or int8 with k_scale;
                           # (B, KV, H, D) cache layout with kv_bshd=True
    v: jax.Array,          # like k
    mask: jax.Array,       # (B, KV) {0,1} validity
    causal: bool = True,
    block_k: int = 512,
    block_q: int = 512,
    causal_skip: bool = True,
    unroll_q: bool = False,
    k_scale: jax.Array | None = None,   # int8-KV dequant scales
    v_scale: jax.Array | None = None,
    kv_bshd: bool = False,
    q_bshd: bool = False,
    q_abs: jax.Array | None = None,     # (B, S) absolute kv columns of q
    q_offset: int = 0,                  # static column of query 0 (chunked prefill)
    kv_packed: bool = False,            # K/V are int4 nibble pairs: uint8
                                        # (B, KV, H*D/2), trailing dims
                                        # merged lane-aligned (requires
                                        # kv_bshd)
    scales_bhs: bool = False,           # scales are (B, H, KV) — the KV
                                        # cache's lane-aligned layout —
                                        # instead of following k's layout
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
    profile at full-size shapes.

    ``k_scale``/``v_scale`` enable the int8 KV cache to be consumed
    *directly* (per-tile dequant of 2 MB slices): a one-shot full-cache
    dequant before the call costs per-layer (B, H, KV, D) bf16 temps
    that give back everything the int8 storage saved.  K's scale folds
    into the f32 logits (exact — it is per kv row), V's into the
    probabilities before the PV matmul.

    ``kv_bshd=True`` takes K/V in the KV cache's native (B, KV, H, D)
    layout (scales as (B, KV, H), or (B, H, KV) with ``scales_bhs`` —
    the cache's lane-aligned scale storage): only the 2 MB per-chunk slices get
    transposed inside the dot, instead of two full-cache (B, H, KV, D)
    layout copies per layer living across the whole attention.
    ``q_bshd=True`` does the same for q and the output (both stay
    (B, S, H, D) — the decoder's natural activation layout).

    ``q_abs`` gives each query its *absolute* kv-column position per
    batch row, for calls whose queries do not start at column 0 — the
    multi-position speculative decode step writes row ``b``'s ``S``
    draft tokens at columns ``[len_b, len_b + S)`` of the cache and must
    be causal against those columns, which differ per row.  Tile-static
    causal skipping is disabled (the positions are traced); decode-time
    calls scan the whole cache anyway.

    ``q_offset`` is the *static* variant for chunked prefill: every row's
    queries start at the same known column, so causal positions shift by
    a compile-time constant and the static skip/tail logic stays intact —
    a prefill processed in chunks is bit-identical to the one-shot call
    (same kv tiles, same online-softmax order, masked blocks are exact
    no-ops)."""
    if kv_packed and not kv_bshd:
        raise ValueError("kv_packed requires the kv_bshd cache layout")
    if q_bshd:
        b, s, h, d = q.shape
    else:
        b, h, s, d = q.shape
    orig_s = s
    kv_axis = 1 if kv_bshd else 2
    kv_len = k.shape[kv_axis]
    scale = 1.0 / math.sqrt(d)

    # K/V/Q stay in their natural (B, H, S, D) layout; each block
    # dynamic-slices its tile.  Pre-stacking chunks as scan xs makes the
    # backward materialize a (num_q, num_chunks, B, H, block_k, D) fp32
    # cotangent buffer (≈1 GB per layer at QVH training shapes — the
    # round-2 full-size train OOM); sliced captures accumulate into
    # K/V-shaped cotangents instead.
    def attend(carry, q_blk, q_pos, kv_start, blk, min_kv=0):
        """One (q tile × kv block) online-softmax update.  ``kv_start``
        may be traced (scan path) or a static int (unroll tail);
        ``blk`` is always static.  ``min_kv`` masks kv rows already
        covered by earlier full chunks (the unroll path's overlapping
        tail block)."""
        acc, m_i, l_i = carry
        k_blk = jax.lax.dynamic_slice_in_dim(k, kv_start, blk, kv_axis)
        v_blk = jax.lax.dynamic_slice_in_dim(v, kv_start, blk, kv_axis)
        if kv_packed:
            # int4 cache: leaves arrive with trailing (H, D/2) merged to
            # H*D/2 (lane-aligned storage — models/llama.py init_cache);
            # reshape this tile back to heads and unpack its nibble
            # pairs to int8 (the tile is ~1 MB — the full-cache unpack
            # this avoids is the point).  Scales apply as in int8.
            k_blk = unpack_int4(k_blk.reshape(b, blk, h, d // 2))
            v_blk = unpack_int4(v_blk.reshape(b, blk, h, d // 2))
        m_blk = jax.lax.dynamic_slice_in_dim(mask, kv_start, blk, 1)
        kv_spec = "bkhd" if kv_bshd else "bhkd"
        q_spec = "bshd" if q_bshd else "bhsd"
        # Native-dtype operands + preferred_element_type=f32: the MXU
        # multiplies bf16 inputs exactly into f32 accumulators, so this
        # equals upcasting first — but an explicit per-tile .astype(f32)
        # on slices of the same array gets CSE-hoisted by XLA into one
        # full-(B,H,S,D) f32 convert (167 MB at QVH prefill shape; the
        # round-2 B=2 OOM).  Scale applies to the f32 logits, not the
        # bf16 operands, for exactness.
        logits = jnp.einsum(
            f"{q_spec},{kv_spec}->bhsk", q_blk, k_blk.astype(q_blk.dtype),
            preferred_element_type=jnp.float32,
        ) * scale
        if k_scale is not None:
            ks_blk = jax.lax.dynamic_slice_in_dim(
                k_scale, kv_start, blk,
                2 if scales_bhs else (1 if kv_bshd else 2),
            )
            if kv_bshd and not scales_bhs:
                ks_blk = ks_blk.transpose(0, 2, 1)
            logits = logits * ks_blk[:, :, None, :]
        kv_pos = kv_start + jnp.arange(blk)[None, None, None, :]
        valid = m_blk[:, None, None, :].astype(bool)
        if min_kv:
            valid = valid & (kv_pos >= min_kv)
        if causal:
            valid = valid & (kv_pos <= q_pos)
        logits = jnp.where(valid, logits, NEG_INF)

        m_new = jnp.maximum(m_i, jnp.max(logits, axis=-1, keepdims=True))
        p = jnp.where(valid, jnp.exp(logits - m_new), 0.0)
        alpha = jnp.exp(m_i - m_new)
        l_new = alpha * l_i + jnp.sum(p, axis=-1, keepdims=True)
        if v_scale is not None:
            vs_blk = jax.lax.dynamic_slice_in_dim(
                v_scale, kv_start, blk,
                2 if scales_bhs else (1 if kv_bshd else 2),
            )
            if kv_bshd and not scales_bhs:
                vs_blk = vs_blk.transpose(0, 2, 1)
            p = p * vs_blk[:, :, None, :]
        pv_dtype = q_blk.dtype
        acc = acc * alpha + jnp.einsum(
            f"bhsk,{kv_spec}->bhsd", p.astype(pv_dtype), v_blk.astype(pv_dtype),
            preferred_element_type=jnp.float32,
        )
        return acc, m_new, l_new

    def finish(carry, q_blk):
        acc, _, l_i = carry              # acc: (B, H, bq, D)
        safe_l = jnp.where(l_i == 0, 1.0, l_i)
        out = (acc / safe_l).astype(q_blk.dtype)
        return out.transpose(0, 2, 1, 3) if q_bshd else out

    def init_carry(bq):
        return (
            jnp.zeros((b, h, bq, d), jnp.float32),
            jnp.full((b, h, bq, 1), NEG_INF, jnp.float32),
            jnp.zeros((b, h, bq, 1), jnp.float32),
        )

    if unroll_q:
        # Pad-free path: static q tiles (last one smaller), full kv
        # chunks via a scan, and the ragged kv tail as one static block
        # that re-reads the cache's last ``block_k`` rows with the
        # overlap masked out — no (B, H, KV, D) padded copies of K/V
        # (3 × 88 MB at QVH full size).
        num_full = kv_len // block_k
        tail_len = kv_len - num_full * block_k
        tail_blk = min(block_k, kv_len)
        tail_start = kv_len - tail_blk
        tiles = []
        for qs in range(0, s, block_q):
            bq = min(block_q, s - qs)
            q_blk = q[:, qs:qs + bq] if q_bshd else q[:, :, qs:qs + bq]
            if q_abs is not None:
                # absolute per-row columns: no static diagonal to skip
                q_pos = q_abs[:, qs:qs + bq][:, None, :, None]
                nf = num_full
                need_tail = tail_len > 0
            else:
                q_pos = q_offset + qs + jnp.arange(bq)[None, None, :, None]
                q_end = q_offset + qs + bq - 1
                if causal:
                    nf = min((q_end + block_k) // block_k, num_full)
                    need_tail = tail_len > 0 and q_end >= num_full * block_k
                else:
                    nf = num_full
                    need_tail = tail_len > 0
            if tiles:
                # Order the (data-independent) tiles: without this the
                # scheduler interleaves them and keeps every tile's fp32
                # accumulators live at once — ~20 extra 16 MB temps at
                # QVH full-size, enough to OOM the B=2 generate graph.
                k, v = jax.lax.optimization_barrier((k, v, tiles[-1]))[:2]
            carry = init_carry(bq)
            if nf > 0:
                def step(c, c_idx, q_blk=q_blk, q_pos=q_pos):
                    return attend(c, q_blk, q_pos, c_idx * block_k, block_k), None
                carry, _ = jax.lax.scan(
                    jax.checkpoint(step, prevent_cse=False),
                    carry, jnp.arange(nf),
                )
            if need_tail or nf == 0:
                carry = jax.checkpoint(
                    lambda c, q_blk=q_blk, q_pos=q_pos: attend(
                        c, q_blk, q_pos, tail_start, tail_blk,
                        min_kv=num_full * block_k if tail_start else 0,
                    ),
                    prevent_cse=False,
                )(carry)
            tiles.append(finish(carry, q_blk))
        return jnp.concatenate(tiles, axis=1 if q_bshd else 2)

    # Scanned path (training + scanned prefill): pad q to whole tiles;
    # the kv axis runs as full chunks plus ONE static ragged tail block
    # that re-reads the last ``block_k`` rows with the overlap masked out
    # — pad-free, like the unroll path.  Padding kv instead costs
    # (B, KV, H, D) copies of K/V/scales *per call*: at B=4 full size the
    # scheduler kept four 88 MB padded cache copies live across the
    # prefill segments, which is exactly what kept B=4 from fitting.
    num_full = kv_len // block_k
    tail_len = kv_len - num_full * block_k
    tail_blk = min(block_k, kv_len)
    tail_start = kv_len - tail_blk

    block_q = min(block_q, max(s, 1))
    pad_q = (-s) % block_q
    q_axis = 1 if q_bshd else 2
    if pad_q:
        q_pads = [(0, 0)] * 4
        q_pads[q_axis] = (0, pad_q)
        q = jnp.pad(q, q_pads)
        if q_abs is not None:
            # padding queries attend nothing (their outputs are dropped):
            # column -1 fails every causal test
            q_abs = jnp.pad(q_abs, ((0, 0), (0, pad_q)), constant_values=-1)
        s += pad_q
    num_q = s // block_q

    def q_tile(qb_idx):
        q_blk = jax.lax.dynamic_slice_in_dim(q, qb_idx * block_q, block_q, q_axis)
        if q_abs is not None:
            q_pos = jax.lax.dynamic_slice_in_dim(
                q_abs, qb_idx * block_q, block_q, 1
            )[:, None, :, None]                               # (B,1,bq,1)
            q_end = jnp.max(q_pos)                            # traced bound
        else:
            q_pos = (q_offset + qb_idx * block_q
                     + jnp.arange(block_q)[None, None, :, None])  # (1,1,bq,1)
            q_end = q_offset + qb_idx * block_q + block_q - 1  # last query position

        def step(carry, c_idx):
            if causal and causal_skip:
                # Skip chunks entirely above the causal diagonal for this
                # query tile — halves attention matmuls+exps at long S.
                # lax.cond executes one branch on TPU and stays
                # differentiable for the training path.
                carry = jax.lax.cond(
                    c_idx * block_k > q_end,
                    lambda c: c,
                    lambda c: attend(c, q_blk, q_pos, c_idx * block_k, block_k),
                    carry,
                )
            else:
                carry = attend(carry, q_blk, q_pos, c_idx * block_k, block_k)
            return carry, None

        # Remat each chunk: without this the scan's backward saves every
        # chunk's probability tile across every layer — at QVH scale
        # that is hundreds of GB.  Recomputing a chunk forward is one
        # small matmul.
        carry = init_carry(block_q)
        if num_full > 0:
            carry, _ = jax.lax.scan(
                jax.checkpoint(step, prevent_cse=False),
                carry,
                jnp.arange(num_full),
            )
        if tail_len > 0 or num_full == 0:
            def tail(c):
                return attend(
                    c, q_blk, q_pos, tail_start, tail_blk,
                    min_kv=num_full * block_k if tail_start else 0,
                )

            if causal and causal_skip:
                carry = jax.lax.cond(
                    tail_start > q_end,
                    lambda c: c,
                    jax.checkpoint(tail, prevent_cse=False),
                    carry,
                )
            else:
                carry = jax.checkpoint(tail, prevent_cse=False)(carry)
        return finish(carry, q_blk)

    _, tiles = jax.lax.scan(
        lambda carry, qb_idx: (carry, q_tile(qb_idx)),
        None,
        jnp.arange(num_q),
    )  # tiles: (nq, B, H|S, bq, ...) per finish's layout
    if q_bshd:
        out = tiles.transpose(1, 0, 2, 3, 4).reshape(b, s, h, d)
        return out[:, :orig_s]
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
