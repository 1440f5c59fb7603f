"""Llama/Vicuna decoder in JAX with embedding-level inputs and KV cache.

Functional re-creation of the decoder path the reference drives through
HF ``LlamaForCausalLM`` (``models/xinstructblip.py:147-175``):

* accepts precomputed ``inputs_embeds`` (the multimodal interleave never
  goes through token ids — ``models/xinstructblip.py:387-392,598-604``);
* position ids derive from the attention mask (cumsum-1, clamped), so
  left-padded generation and interior timestamp padding behave exactly
  like HF's masked-position handling;
* the LM head always computes in fp32 (reference ``CastOutputToFloat``,
  ``models/xinstructblip.py:22-23,159``);
* base weights optionally int8-quantized per output channel — the TPU
  counterpart of ``load_in_8bit`` (``models/xinstructblip.py:151``) —
  with LoRA adapters on every projection (``models/model_utils.py``).

TPU-first: the decode loop lives in ``mraudio_tpu.infer.generate`` as a
``lax.scan`` over a preallocated static-shape KV cache; this module only
defines the per-call computation (prefill writes the cache slice,
single-token steps extend it).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from mraudio_tpu.config import LlamaConfig, LoraConfig
from mraudio_tpu.models.layers import NEG_INF, RMSNorm


def seq_shard(x: jax.Array, cfg: LlamaConfig) -> jax.Array:
    """Megatron-style sequence-parallel annotation on the residual
    stream (config ``seq_shard``): pin (B, S, D) to
    ``P(data?, "model", None)`` so GSPMD keeps the between-layers
    activations (norms, residual adds, saved remat inputs) seq-sharded
    over the ``model`` axis, turning each block's two all-reduces into
    reduce-scatter + all-gather pairs.  Reads the ambient mesh set by
    ``jax.set_mesh`` (trainer/evaluate); silently a no-op when there is
    no mesh, the model axis is 1, or S is too short to split (decode
    steps and sub-2-tokens-per-shard prefixes).  S need NOT tile the
    model axis — GSPMD pads the last shard internally (QVH's interleave
    is 5,353 tokens, indivisible by any axis width).
    """
    if not cfg.seq_shard or x.ndim != 3:
        return x
    mesh = jax.sharding.get_abstract_mesh()
    if mesh is None or mesh.empty:
        return x
    shape = mesh.shape
    m = shape.get("model", 1)
    if m <= 1 or x.shape[1] < 2 * m:
        return x
    if x.shape[0] % shape.get("data", 1):
        # constraint axes are exact, not hints: P(None, ...) on the
        # batch dim would FORCE replication of a data-sharded batch,
        # and P.UNCONSTRAINED collapses the padded uneven-S sharding to
        # replicated (measured) — when B doesn't tile the data axis
        # (OOM-fallback odd batches), skip SP rather than degrade.
        return x
    from jax.sharding import PartitionSpec as P

    return jax.lax.with_sharding_constraint(x, P("data", "model", None))


def quantize_kv(x: jax.Array):
    """Per-(row, position, head) absmax int8 quantization of K/V.

    Returns (int8 values, fp32 scales) with ``x ≈ q * scale[..., None]``."""
    scale = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1) / 127.0
    scale = jnp.where(scale == 0, 1.0, scale)
    q = jnp.round(x.astype(jnp.float32) / scale[..., None]).astype(jnp.int8)
    return q, scale


def quantize_kv4(x: jax.Array):
    """Per-(row, position, head) absmax int4 quantization of K/V, packed
    two values per byte along head_dim (``ops/attention.pack_int4``).

    Returns (uint8 packed (..., D/2), fp32 scales) with
    ``x ≈ unpack_int4(q) * scale[..., None]``.  Coarser than int8 (15
    levels per head row) — an accuracy trade for another 2x off decode
    cache reads; see ``LlamaConfig.kv_quant``."""
    from mraudio_tpu.ops.attention import pack_int4

    scale = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1) / 7.0
    scale = jnp.where(scale == 0, 1.0, scale)
    q = jnp.clip(
        jnp.round(x.astype(jnp.float32) / scale[..., None]), -7, 7
    ).astype(jnp.int8)
    return pack_int4(q), scale


def rope_frequencies(head_dim: int, theta: float) -> jnp.ndarray:
    return 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))


def apply_rope(x: jax.Array, positions: jax.Array, theta: float) -> jax.Array:
    """x: (B, S, H, D); positions: (B, S) int32.

    Angles/cos/sin are computed in f32 (they are (B, S, 1, D/2) — tiny),
    then the rotation itself runs in ``x.dtype`` — exactly HF's
    ``apply_rotary_pos_emb`` semantics (cos/sin cast to the hidden
    dtype, products in bf16).  Never upcast the (B, S, H, D) activation:
    a full-sequence f32 copy of it (167 MB at QVH prefill shape) is what
    repeatedly OOMed the B=2 full-size generate graph."""
    freqs = rope_frequencies(x.shape[-1], theta)  # (D/2,)
    angles = positions[..., None].astype(jnp.float32) * freqs  # (B, S, D/2)
    cos = jnp.cos(angles)[:, :, None, :].astype(x.dtype)
    sin = jnp.sin(angles)[:, :, None, :].astype(x.dtype)
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate(
        [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1
    )


class LlamaLinear(nn.Module):
    """Projection with optional int8 base weights and LoRA adapter.

    ``quantize_ok=False`` keeps the projection in float even when the
    config asks for int8 — used for ``lm_head``, matching the reference's
    ``load_in_8bit`` path where HF ``get_keys_to_not_convert`` leaves the
    lm_head unquantized in fp16 with an fp32 output cast
    (``models/xinstructblip.py:151,159``)."""

    features: int
    cfg: LlamaConfig
    lora: Optional[LoraConfig] = None
    lora_target: bool = False
    quantize_ok: bool = True
    # Qwen2-family q/k/v biases (cfg.attention_bias); the bias rides in
    # fp32 next to any quantized kernel and adds after the matmul, so
    # every quantization path supports it unchanged.
    use_bias: bool = False

    def _pallas_gemv_ok(self, x, in_features: int) -> bool:
        """Route decode-shaped calls (<= 32 rows) through the
        order-preserving Pallas GEMV (ops/gemv.py) when configured."""
        if self.cfg.decode_gemv != "pallas":
            return False
        import math as _math

        from mraudio_tpu.ops.gemv import supports

        return (_math.prod(x.shape[:-1]) <= 32
                and supports(in_features, self.features))

    @staticmethod
    def _pallas_gemv(x, w, scale, dtype):
        from mraudio_tpu.ops.gemv import decode_gemv

        rows = x.shape[:-1]
        x2 = x.reshape((-1, x.shape[-1])).astype(dtype)
        y = decode_gemv(
            x2, w, scale, out_dtype=dtype,
            # Mosaic only exists on real TPUs; CPU tests run interpreted
            interpret=jax.default_backend() != "tpu",
        )
        return y.reshape(rows + (y.shape[-1],))

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        dtype = jnp.dtype(self.cfg.dtype)
        in_features = x.shape[-1]

        if self.cfg.quantization == "int8" and self.quantize_ok:
            w_q = self.param(
                "w_int8",
                nn.initializers.zeros_init(),
                (in_features, self.features),
                jnp.int8,
            )
            scale = self.param(
                "scale",
                nn.initializers.constant(1.0 / 127.0),
                (self.features,),
                jnp.float32,
            )
            if self.cfg.int8_dot:
                # True MXU int8 path: dynamically quantize activations
                # per row (absmax), int8 x int8 -> int32 accumulate, then
                # rescale by act_scale * per-channel weight scale.  Naive
                # W8A8 (no outlier decomposition) — opt-in; measured
                # accuracy/speed trade-off recorded in docs/BENCHMARKS.md.
                xf = x.astype(jnp.float32)
                x_scale = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
                x_scale = jnp.where(x_scale == 0, 1.0, x_scale)
                x_q = jnp.round(xf / x_scale).astype(jnp.int8)
                acc = jax.lax.dot_general(
                    x_q,
                    w_q,
                    dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                y = (acc.astype(jnp.float32) * (x_scale * scale)).astype(dtype)
            elif self._pallas_gemv_ok(x, in_features):
                # cfg.decode_gemv="pallas": same math (bf16 dot, f32
                # accumulate, * scale) with the weight-tile DMA
                # double-buffered and a FIXED ascending-k accumulation
                # order per output tile (ops/gemv.py)
                y = self._pallas_gemv(x, w_q, scale, dtype)
            else:
                # Weight-only int8: the HBM/storage win of load_in_8bit
                # (weights stream at 1 byte/param) with the matmul itself
                # running in bf16 after an on-the-fly dequant — XLA fuses
                # the dequant into the matmul's weight read, so decode
                # stays HBM-bound at the int8 byte rate.
                acc = jax.lax.dot_general(
                    x.astype(dtype),
                    w_q.astype(dtype),
                    dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                y = (acc * scale).astype(dtype)
        elif self.cfg.quantization == "int4" and self.quantize_ok:
            # Group-wise int4 (AWQ/GPTQ-style): weights live PACKED two
            # nibbles per uint8 byte — shape (groups, group/2, out), one
            # fp32 scale per (group, out).  uint8 rather than jnp.int4
            # storage because S4 arrays cannot cross the host→device
            # boundary on every backend (the axon plugin's device_put
            # recurses on tiled S4 layouts).  Packing pairs group-HALVES
            # (byte j holds elements j and j+g/2 of its group), so each
            # nibble plane contracts against a CONTIGUOUS half of the
            # activation group and — crucially — the computation never
            # concatenates the planes back together: a jnp.stack/reshape
            # unpack is a materialized full-size int8 copy per call
            # (concats don't fuse into dot operands; measured 0.33 vs
            # 0.50 clips/s end-to-end at full size), while per-plane
            # shift/convert chains are elementwise and fuse into the
            # matmul's weight read like the int8 path's dequant.  The
            # projection becomes TWO K=in/2 dots (one per plane) summed.
            g = self.cfg.int4_group_size
            if in_features % g:
                raise ValueError(
                    f"int4_group_size={g} must divide in_features={in_features}"
                )
            ngroups = in_features // g
            w_q = self.param(
                "w_int4",
                nn.initializers.zeros_init(),
                (ngroups, g // 2, self.features),
                jnp.uint8,
            )
            scale = self.param(
                "w_int4_scale",
                nn.initializers.constant(1.0 / 7.0),
                (ngroups, self.features),
                jnp.float32,
            )
            # Per-plane unpack (arithmetic shifts sign-extend): lo plane
            # = group elements [0, g/2), hi plane = [g/2, g).
            w8 = jax.lax.bitcast_convert_type(w_q, jnp.int8)
            lo = jax.lax.shift_right_arithmetic(
                jax.lax.shift_left(w8, jnp.int8(4)), jnp.int8(4)
            )
            hi = jax.lax.shift_right_arithmetic(w8, jnp.int8(4))
            # XLA:CPU's DotThunk can't execute some bf16 dot layouts
            # (fine on the MXU); tests/debug runs take f32 operands.
            op_dtype = (
                dtype if jax.default_backend() == "tpu" else jnp.float32
            )
            xg = x.astype(op_dtype).reshape(x.shape[:-1] + (ngroups, g))
            xa, xb = xg[..., : g // 2], xg[..., g // 2:]
            ntok = math.prod(x.shape[:-1])
            if ntok > 16:
                # Prefill/training: group-wise scales do not factor out
                # of the contraction (they vary along it), so fold them
                # into each plane's operand — an elementwise
                # convert×broadcast-mul chain XLA fuses into the dot's
                # weight read — and contract (groups, g/2) in one
                # two-dim dot_general per plane (collapses to a single
                # K=in/2 matmul; the dequant FLOPs are in×out,
                # negligible against S×in×out).
                lo_w = (lo * scale[:, None, :]).astype(op_dtype)
                hi_w = (hi * scale[:, None, :]).astype(op_dtype)
                nd = xa.ndim
                dims = (((nd - 2, nd - 1), (0, 1)), ((), ()))
                acc = jax.lax.dot_general(
                    xa, lo_w, dimension_numbers=dims,
                    preferred_element_type=jnp.float32,
                ) + jax.lax.dot_general(
                    xb, hi_w, dimension_numbers=dims,
                    preferred_element_type=jnp.float32,
                )
                y = acc.astype(dtype)
            else:
                # Decode GEMV: HBM-bound — the packed bytes stream once
                # at 0.5 byte/param with the shift/convert fused into
                # the read; per-group partial sums keep the group axis
                # so the fp32 scales apply before the group reduce.
                acc = jnp.einsum(
                    "...gi,gio->...go", xa, lo.astype(op_dtype),
                    preferred_element_type=jnp.float32,
                ) + jnp.einsum(
                    "...gi,gio->...go", xb, hi.astype(op_dtype),
                    preferred_element_type=jnp.float32,
                )
                y = (acc * scale).sum(axis=-2).astype(dtype)
        else:
            kernel = self.param(
                "kernel",
                nn.initializers.normal(0.02),
                (in_features, self.features),
                jnp.float32,
            )
            if self._pallas_gemv_ok(x, in_features):
                y = self._pallas_gemv(
                    x, kernel.astype(dtype), None, dtype
                )
            else:
                y = jax.lax.dot_general(
                    x.astype(dtype),
                    kernel.astype(dtype),
                    dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(dtype)

        if self.use_bias:
            b = self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
            y = y + b.astype(y.dtype)

        if self.lora is not None and self.lora.enabled and self.lora_target:
            r = self.lora.rank
            a = self.param(
                "lora_a",
                nn.initializers.normal(1.0 / r),
                (in_features, r),
                jnp.float32,
            )
            b = self.param("lora_b", nn.initializers.zeros, (r, self.features), jnp.float32)
            h = x
            if not deterministic and self.lora.dropout > 0:
                h = nn.Dropout(rate=self.lora.dropout, deterministic=False)(h)
            delta = (h.astype(dtype) @ a.astype(dtype)) @ b.astype(dtype)
            y = y + delta * (self.lora.alpha / r)
        return y


class LlamaAttention(nn.Module):
    cfg: LlamaConfig
    lora: Optional[LoraConfig]

    @nn.compact
    def __call__(self, x, mask, positions, cache=None, cache_index=None,
                 deterministic: bool = True, kv_valid=None, causal=False,
                 obs_start=None):
        cfg = self.cfg
        b, s, _ = x.shape
        h, d = cfg.num_heads, cfg.head_dim
        kv_h = cfg.num_kv_heads

        def lin(name, feats, target):
            return LlamaLinear(
                feats, cfg, lora=self.lora,
                lora_target=target and name in (self.lora.target_modules if self.lora else ()),
                # Qwen2 flavor: biases on q/k/v only, o_proj bias-free
                use_bias=cfg.attention_bias
                and name in ("q_proj", "k_proj", "v_proj"),
                name=name,
            )

        q = lin("q_proj", h * d, True)(x, deterministic).reshape(b, s, h, d)
        k = lin("k_proj", kv_h * d, True)(x, deterministic).reshape(b, s, kv_h, d)
        v = lin("v_proj", kv_h * d, True)(x, deterministic).reshape(b, s, kv_h, d)

        q = apply_rope(q, positions, cfg.rope_theta)
        k = apply_rope(k, positions, cfg.rope_theta)

        per_row_index = cache is not None and getattr(cache_index, "ndim", 0) == 1
        # Chunked prefill passes cache_index as a static Python int (the
        # chunk's first cache column); absolute causal positions shift by
        # it but all tile bounds stay compile-time static.
        q_offset = cache_index if isinstance(cache_index, int) else 0
        if per_row_index:
            # Row b's tokens land at its own columns — continuous-batching
            # decode (s == 1) and the speculative multi-position step
            # (s > 1, infer/generate.py::grammar_generate).  These columns
            # are also each query's absolute causal position.
            q_cols = cache_index[:, None] + jnp.arange(s)[None, :]  # (B, S)
        else:
            q_cols = None

        if cache is not None:
            # cache["k"]: (B, max_len, kv_h, d).  Scalar cache_index writes
            # this call's keys at [cache_index, cache_index + s) for every
            # row; a (B,)-shaped cache_index writes row b's s tokens at its
            # own columns [cache_index[b], cache_index[b] + s) via an XLA
            # scatter (in-place on the donated decode-loop carry).
            # With kv_quant="int8" the cache stores int8 values + per
            # (row, position, head) fp32 scales — halves decode HBM reads
            # and doubles how many slots fit next to the 7B weights.
            # kv_quant="int4" packs nibble pairs for another 2x, stored
            # uint8 (B, max_len, kv_h*D/2) — trailing dims merged so the
            # lane dim is a 128 multiple (a 4D D/2=64 leaf pads 2x in
            # HBM); the chunked kernel unpacks per tile.
            quantized = "k_scale" in cache
            packed = quantized and cache["k"].dtype == jnp.uint8

            def write(dst, val):
                if per_row_index:
                    rows = jnp.arange(b)[:, None]
                    return dst.at[rows, q_cols].set(val.astype(dst.dtype))
                idx = (0, cache_index) + (0,) * (dst.ndim - 2)
                return jax.lax.dynamic_update_slice(dst, val.astype(dst.dtype), idx)

            def write_scale(dst, val):
                # Scale leaves store (B, kv_h, max_len) — columns LAST —
                # so the f32 lane dim is the long sequence axis instead
                # of kv_h (32 lanes of a 128 tile = 4x padding in HBM,
                # ~0.5 GB of dead residency + dead decode reads at full
                # size).  ``val`` arrives (B, s, kv_h) from the
                # quantizer.
                if per_row_index:
                    rows = jnp.arange(b)[:, None]
                    # advanced indices (rows, q_cols) around the head
                    # slice: element [i, j, :] lands at
                    # dst[rows[i], :, q_cols[i, j]]
                    return dst.at[rows, :, q_cols].set(val.astype(dst.dtype))
                return jax.lax.dynamic_update_slice(
                    dst, val.transpose(0, 2, 1).astype(dst.dtype),
                    (0, 0, cache_index),
                )

            if quantized:
                kq, ks = (quantize_kv4 if packed else quantize_kv)(k)
                vq, vs = (quantize_kv4 if packed else quantize_kv)(v)
                if packed:
                    # int4 leaves store trailing (H, D/2) MERGED to H*D/2
                    # (init_cache): D/2 = 64 is half a 128-lane TPU tile,
                    # so the 4D layout padded every packed buffer 2x in
                    # HBM — the cache occupied (and decode re-read) the
                    # same bytes as int8.  Merged, the lane dim is H*D/2
                    # and the cache is tile-clean; readers reshape 2 MB
                    # chunk slices back to heads at the point of use.
                    kq = kq.reshape(b, s, -1)
                    vq = vq.reshape(b, s, -1)
                new_cache = {
                    "k": write(cache["k"], kq),
                    "v": write(cache["v"], vq),
                    "k_scale": write_scale(cache["k_scale"], ks),
                    "v_scale": write_scale(cache["v_scale"], vs),
                }
                # Do NOT dequantize the whole cache here: decode steps
                # consume the int8 tensors directly (scales folded into
                # the logits/probs below), keeping per-step HBM reads at
                # the int8 byte rate — materializing a bf16 copy each
                # step costs more than the quantization saves.
                k_full, v_full = new_cache["k"], new_cache["v"]
                k_scale, v_scale = new_cache["k_scale"], new_cache["v_scale"]
            else:
                new_cache = {
                    "k": write(cache["k"], k),
                    "v": write(cache["v"], v),
                }
                k_full, v_full = new_cache["k"], new_cache["v"]
                k_scale = v_scale = None
            if "valid" in cache:
                # Compacted cache (compact_cache): per-LAYER validity of
                # the kept columns rides in the cache itself — layers
                # keep different positions, so the caller's shared mask
                # cannot express it.  New tokens are valid everywhere.
                new_cache["valid"] = write(
                    cache["valid"], jnp.ones((b, s), cache["valid"].dtype)
                )
                layer_valid = new_cache["valid"]
                if kv_valid is not None:
                    kv_valid = kv_valid * layer_valid
                mask = mask & (layer_valid[:, None, None, :] > 0)
        else:
            new_cache = None
            k_full, v_full = k, v
            quantized = False
            packed = False
            k_scale = v_scale = None

        if kv_h != h:
            rep = h // kv_h
            if packed:
                # merged int4 leaves: heads live inside the last axis —
                # un-merge, repeat, re-merge (same full-cache temp the
                # unpacked repeat below already materializes)
                half = d // 2
                kv_len_full = k_full.shape[1]
                k_full = jnp.repeat(
                    k_full.reshape(b, kv_len_full, kv_h, half), rep, axis=2
                ).reshape(b, kv_len_full, h * half)
                v_full = jnp.repeat(
                    v_full.reshape(b, kv_len_full, kv_h, half), rep, axis=2
                ).reshape(b, kv_len_full, h * half)
            else:
                k_full = jnp.repeat(k_full, rep, axis=2)
                v_full = jnp.repeat(v_full, rep, axis=2)
            if quantized:
                # scales are (B, kv_h, KV): heads on axis 1
                k_scale = jnp.repeat(k_scale, rep, axis=1)
                v_scale = jnp.repeat(v_scale, rep, axis=1)

        if (
            cfg.kv_keep > 0 and cache is not None and not per_row_index
            and "valid" not in cache and obs_start is not None
        ):
            # Prefill under KV compaction: score every cache column by
            # the softmax mass the prefix's last `kv_keep_obs` queries
            # (the text prompt) put on it — the SnapKV observation-window
            # statistic compact_cache consumes.  ``obs_start`` is the
            # *absolute* column where that window begins (the caller —
            # prefill_cache — computes it from the FULL prefix length);
            # under chunked prefill each chunk contributes the scores of
            # its queries that fall inside the window, ACCUMULATED into
            # the cache's running ``obs_score``, so the final statistic
            # is exactly the one-shot pass's (each query's softmax row is
            # identical: it attends the same already-written columns).
            # Scored in head-group chunks (fori_loop): softmax is
            # per-head independent, so the (B, hc, W, KV) tile per step
            # replaces a full (B, H, W, KV) f32 tile per layer (≥ 130 MB
            # at B=3 QVH full size — the allocation that kept
            # int4 + kv_keep from fitting B=3).
            kv_len = k_full.shape[1]
            prev_score = cache.get(
                "obs_score", jnp.zeros((b, kv_len), jnp.float32)
            )
            lo = max(obs_start - q_offset, 0)  # static chunk-local start
            if lo < s:
                w_obs = s - lo
                obs_q = q[:, lo:]
                kv_cols = jnp.arange(kv_len)[None, None, None, :]
                q_cols_obs = (
                    q_offset + lo
                ) + jnp.arange(w_obs)[None, None, :, None]
                ok = (kv_cols <= q_cols_obs)
                if kv_valid is not None:
                    ok = ok & (kv_valid[:, None, None, :] > 0)
                    # padding queries (interior timestamp slots / short
                    # rows) contribute nothing; their validity lives at
                    # their ABSOLUTE columns of the cache-wide mask
                    qv = jax.lax.dynamic_slice_in_dim(
                        kv_valid, q_offset + lo, w_obs, 1
                    )
                hc = 4 if h % 4 == 0 else 1

                def _obs_chunk(i, acc):
                    q_c = jax.lax.dynamic_slice_in_dim(obs_q, i * hc, hc, axis=2)
                    if packed:
                        # merged leaf (B, KV, H*D/2): this head chunk is
                        # hc*D/2 contiguous lanes
                        from mraudio_tpu.ops.attention import unpack_int4

                        half = d // 2
                        k_c = jax.lax.dynamic_slice_in_dim(
                            k_full, i * (hc * half), hc * half, axis=2
                        )
                        k_c = unpack_int4(k_c.reshape(b, kv_len, hc, half))
                    else:
                        k_c = jax.lax.dynamic_slice_in_dim(
                            k_full, i * hc, hc, axis=2
                        )
                    logits = jnp.einsum(
                        "bwhd,bkhd->bhwk", q_c, k_c.astype(q_c.dtype),
                        preferred_element_type=jnp.float32,
                    ) * (d ** -0.5)
                    if quantized:
                        # scales (B, H, KV): head chunk on axis 1
                        ks_c = jax.lax.dynamic_slice_in_dim(
                            k_scale, i * hc, hc, axis=1
                        )
                        logits = logits * ks_c[:, :, None, :]
                    logits = jnp.where(ok, logits, NEG_INF)
                    probs = jax.nn.softmax(logits, axis=-1)
                    if kv_valid is not None:
                        probs = probs * qv[:, None, :, None].astype(probs.dtype)
                    return acc + probs.sum(axis=(1, 2))

                new_cache["obs_score"] = jax.lax.fori_loop(
                    0, h // hc, _obs_chunk, prev_score
                )
            else:
                # chunk entirely before the observation window: carry the
                # running score through unchanged
                new_cache["obs_score"] = prev_score

        # Memory-efficient attention for multi-token calls
        # (prefill/training).  Decode steps (s == 1) use the dense path
        # — except over a quantized cache, where the dense dot would
        # force a full-cache bf16 convert as its materialized operand
        # every step (read int8 2.9 GB -> write+read bf16 2x5.7 GB per
        # layer sweep); the chunked kernel reads the int8 tiles
        # directly, so decode stays at the int8 byte rate.
        impl = cfg.attention_impl
        use_streaming = (
            impl in ("chunked", "pallas")
            and kv_valid is not None
            and ((s > 1 and causal) or (s == 1 and quantized))
        )
        if use_streaming and impl == "pallas" and (
            jax.default_backend() != "tpu" or s == 1 or per_row_index
            or q_offset > 0
        ):
            # Mosaic kernels: real TPUs, multi-token, column-0-aligned
            # queries only (the per-row speculative step needs q_abs).
            impl = "chunked"
        dtype = jnp.dtype(cfg.dtype)
        if use_streaming:
            from mraudio_tpu.ops.attention import chunked_attention, flash_attention

            if impl == "pallas":
                fn = flash_attention
                extra = {}
                if quantized:
                    # The Mosaic kernel takes bf16 K/V; one-shot dequant.
                    if packed:
                        from mraudio_tpu.ops.attention import unpack_int4

                        kv_l = k_full.shape[1]
                        k_full = unpack_int4(
                            k_full.reshape(b, kv_l, h, d // 2)
                        )
                        v_full = unpack_int4(
                            v_full.reshape(b, kv_l, h, d // 2)
                        )
                    # scales (B, H, KV) -> broadcast over (B, KV, H, D)
                    k_full = k_full.astype(dtype) * (
                        k_scale.transpose(0, 2, 1)[..., None].astype(dtype)
                    )
                    v_full = v_full.astype(dtype) * (
                        v_scale.transpose(0, 2, 1)[..., None].astype(dtype)
                    )
            else:
                fn = chunked_attention
                # Unroll policy: decode steps (one q tile) always;
                # prefill only when cfg.attention_unroll_prefill (24%
                # faster per layer but ~10x the HLO — see config.py).
                # The training path (no cache) keeps the scanned outer
                # loop with the proven backward memory profile.
                # kv_bshd/q_bshd: K/V stay in the cache's (B, KV, H, D)
                # layout and q/out in the decoder's natural (B, S, H, D)
                # — the kernel transposes 2 MB chunk slices instead of
                # materializing four full-sequence layout copies per
                # layer.
                if cache is not None:
                    # decode steps and small speculative drafts are one
                    # static tile; real prefills follow the config flag
                    unroll = s <= 16 or cfg.attention_unroll_prefill
                else:
                    unroll = cfg.attention_unroll_train
                extra = {"unroll_q": unroll, "kv_bshd": True,
                         "q_bshd": True}
                if causal and per_row_index:
                    # per-row absolute causal columns (speculative step)
                    extra["q_abs"] = q_cols
                elif causal and q_offset:
                    # static shared offset (chunked prefill)
                    extra["q_offset"] = q_offset
                if quantized:
                    # Feed the int8/int4 cache directly; the kernel
                    # dequants (and for int4, unpacks) 2 MB tiles — a
                    # full-cache bf16 dequant here costs per-layer
                    # (B, H, KV, D) temps that cancel the quantized
                    # storage saving.
                    extra["k_scale"] = k_scale
                    extra["v_scale"] = v_scale
                    extra["scales_bhs"] = True  # cache layout (B, H, KV)
                    extra["kv_packed"] = packed
            if impl == "pallas":
                out = fn(
                    q.transpose(0, 2, 1, 3),
                    k_full.transpose(0, 2, 1, 3),
                    v_full.transpose(0, 2, 1, 3),
                    kv_valid,
                    causal=True,
                    **extra,
                ).transpose(0, 2, 1, 3)
            else:
                # causal only for multi-token prefill: a decode step's
                # single query attends every valid slot (the kernel's
                # q positions are tile-relative, not absolute).
                out = fn(q, k_full, v_full, kv_valid, causal=s > 1, **extra)
        else:
            if packed:
                # dense fallback path: unpack the whole int4 cache (this
                # path is for debug/`attention_impl="dense"` runs only)
                from mraudio_tpu.ops.attention import unpack_int4

                kv_l = k_full.shape[1]
                k_full = unpack_int4(k_full.reshape(b, kv_l, h, d // 2))
                v_full = unpack_int4(v_full.reshape(b, kv_l, h, d // 2))
            logits = jnp.einsum(
                "bqhd,bkhd->bhqk", q, k_full.astype(q.dtype),
                preferred_element_type=jnp.float32,
            ) * (d ** -0.5)
            if quantized:
                # Fold the per-(row, position, head) K scale into the
                # logits instead of dequantizing the cache: XLA fuses the
                # int8->bf16 convert into the dot's operand read.
                # scales (B, H, KV): already in the logits' head-major order
                logits = logits * k_scale[:, :, None, :]
            logits = jnp.where(mask, logits, NEG_INF)
            probs = jax.nn.softmax(logits, axis=-1)
            if quantized:
                probs = probs * v_scale[:, :, None, :]
            out = jnp.einsum(
                "bhqk,bkhd->bqhd", probs.astype(dtype), v_full.astype(dtype)
            )
        out = out.reshape(b, s, h * d)
        out = lin("o_proj", cfg.hidden_size, True)(out, deterministic)
        return out, new_cache


class _MlpCore(nn.Module):
    """SwiGLU feed-forward on one token tile; ``(carry, x) -> (carry, y)``
    signature so it can be ``nn.scan``-ned over sequence chunks with
    broadcast (shared) params."""

    cfg: LlamaConfig
    lora: Optional[LoraConfig]
    deterministic: bool = True

    @nn.compact
    def __call__(self, carry, x):
        cfg = self.cfg

        def lin(name, feats):
            return LlamaLinear(
                feats, cfg, lora=self.lora,
                lora_target=name in (self.lora.target_modules if self.lora else ()),
                name=name,
            )

        gate = lin("gate_proj", cfg.intermediate_size)(x, self.deterministic)
        up = lin("up_proj", cfg.intermediate_size)(x, self.deterministic)
        out = lin("down_proj", cfg.hidden_size)(
            nn.silu(gate) * up, self.deterministic
        )
        return carry, out


class LlamaMlp(nn.Module):
    cfg: LlamaConfig
    lora: Optional[LoraConfig]

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        cfg = self.cfg
        chunk = cfg.mlp_seq_chunk
        b, s, d = x.shape
        if not chunk or s <= chunk:
            core = _MlpCore(cfg, self.lora, deterministic)
            nn.share_scope(self, core)  # params stay at mlp/{gate,up,down}_proj
            return core(None, x)[1]

        # Tile the token axis: nn.scan with broadcast params + per-tile
        # remat caps the (tile, intermediate) temps — see
        # config.mlp_seq_chunk.  Param tree identical to the plain path.
        pad = (-s) % chunk
        xp = jnp.pad(x, ((0, 0), (0, pad), (0, 0))) if pad else x
        xs = xp.reshape(b, -1, chunk, d).transpose(1, 0, 2, 3)  # (n,B,c,D)
        scan_cls = nn.scan(
            nn.remat(_MlpCore),
            variable_broadcast="params",
            split_rngs={"params": False, "dropout": True},
            in_axes=0,
            out_axes=0,
        )
        core = scan_cls(cfg, self.lora, deterministic)
        nn.share_scope(self, core)
        _, ys = core(None, xs)
        y = ys.transpose(1, 0, 2, 3).reshape(b, -1, d)
        return y[:, :s] if pad else y


class LlamaBlock(nn.Module):
    cfg: LlamaConfig
    lora: Optional[LoraConfig]

    @nn.compact
    def __call__(self, x, mask, positions, cache=None, cache_index=None,
                 deterministic: bool = True, kv_valid=None, causal=False,
                 obs_start=None):
        h = RMSNorm(epsilon=self.cfg.rms_norm_eps, name="input_norm")(x)
        h, new_cache = LlamaAttention(self.cfg, self.lora, name="attn")(
            h, mask, positions, cache, cache_index, deterministic,
            kv_valid=kv_valid, causal=causal, obs_start=obs_start,
        )
        x = seq_shard(x + h, self.cfg)
        h = RMSNorm(epsilon=self.cfg.rms_norm_eps, name="post_attn_norm")(x)
        mlp_cls = LlamaMlp
        if self.cfg.grad_checkpoint:
            # Nested remat: when the (already-rematted) block's backward
            # recomputes its forward, the MLP's (S, 11008) gate/up/silu
            # temps (3 x 114 MB at QVH full size) and the attention
            # temps would otherwise be live together; checkpointing the
            # MLP separately splits the block-local peak.
            mlp_cls = nn.remat(LlamaMlp, static_argnums=(2,))
        h = mlp_cls(self.cfg, self.lora, name="mlp")(h, deterministic)
        return seq_shard(x + h, self.cfg), new_cache


class LlamaModel(nn.Module):
    """Decoder stack.  Call with either ``input_ids`` or ``inputs_embeds``.

    ``mask`` must be a bool attend-mask broadcastable to
    (B, heads, q_len, kv_len) — the caller owns causal/padding semantics
    (built in ``mraudio_tpu.infer.generate`` /
    ``mraudio_tpu.models.xinstructblip``).
    """

    cfg: LlamaConfig
    lora: Optional[LoraConfig] = None

    def setup(self):
        # padded_vocab_size: zero rows appended past vocab_size so the
        # vocab dim tiles evenly over any model axis (config
        # vocab_pad_multiple); `logits` masks the pad columns.
        self.embed_tokens = nn.Embed(
            self.cfg.padded_vocab_size,
            self.cfg.hidden_size,
            param_dtype=jnp.float32,
            name="embed_tokens",
        )
        block_cls = LlamaBlock
        if self.cfg.grad_checkpoint:
            # static args: deterministic (6), causal (8), obs_start (9)
            # — flax remat counts `self` as arg 0
            block_cls = nn.remat(LlamaBlock, static_argnums=(6, 8, 9))
        if self.cfg.scan_layers:
            # One nn.scan body instead of num_layers traced copies:
            # params/cache gain a leading (L,) axis (see
            # config.scan_layers).  x is the carry; the per-layer cache
            # is scanned in/out; everything else broadcasts.
            self.layers = nn.scan(
                block_cls,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=(nn.broadcast, nn.broadcast, 0, nn.broadcast,
                         nn.broadcast, nn.broadcast, nn.broadcast,
                         nn.broadcast),
                out_axes=0,
                length=self.cfg.num_layers,
            )(self.cfg, self.lora)
            self.blocks = ()
        else:
            self.blocks = [
                block_cls(self.cfg, self.lora, name=f"layer_{i}")
                for i in range(self.cfg.num_layers)
            ]
        self.final_norm = RMSNorm(epsilon=self.cfg.rms_norm_eps, name="final_norm")
        # Never quantized: mirrors HF get_keys_to_not_convert under
        # load_in_8bit (reference models/xinstructblip.py:151).
        self.lm_head = LlamaLinear(
            self.cfg.padded_vocab_size, self.cfg, name="lm_head",
            quantize_ok=False,
        )

    def embed(self, input_ids: jax.Array) -> jax.Array:
        return self.embed_tokens(input_ids).astype(jnp.dtype(self.cfg.dtype))

    def logits(self, hidden: jax.Array) -> jax.Array:
        """fp32 lm_head logits (reference CastOutputToFloat) with padded
        vocab columns masked to finfo.min — softmax/log_softmax/argmax
        over the result are bit-identical to the unpadded model (the pad
        columns contribute exp(min - max) = 0 and never win an argmax).
        All lm_head consumers must route through here, not call
        ``lm_head`` directly."""
        out = self.lm_head(hidden).astype(jnp.float32)
        v = self.cfg.vocab_size
        if self.cfg.padded_vocab_size != v:
            col = jax.lax.broadcasted_iota(jnp.int32, out.shape, out.ndim - 1)
            out = jnp.where(col < v, out, jnp.finfo(jnp.float32).min)
        return out

    def init_all(self, inputs_embeds, mask, positions, input_ids):
        """Initialization entry point touching every submodule (the main
        ``__call__`` never invokes ``embed_tokens``, so plain init would
        skip its parameters)."""
        _ = self.embed(input_ids)
        return self(inputs_embeds, mask, positions)

    def __call__(
        self,
        inputs_embeds: jax.Array,      # (B, S, D)
        mask: jax.Array,               # bool, broadcastable (B, 1|H, S, KV)
        positions: jax.Array,          # (B, S) int32
        cache: Optional[list] = None,  # per-layer {"k","v"} or None
        cache_index: Optional[jax.Array] = None,
        deterministic: bool = True,
        return_hidden: bool = False,
        kv_valid: Optional[jax.Array] = None,  # (B, KV) {0,1}: enables flash
        causal: bool = False,
        obs_start: Optional[int] = None,  # abs col where the SnapKV obs window starts
    ):
        x = seq_shard(inputs_embeds.astype(jnp.dtype(self.cfg.dtype)), self.cfg)
        if self.cfg.scan_layers:
            # cache: stacked pytree with leading (L,) axis (init_cache)
            x, scanned_cache = self.layers(
                x, mask, positions, cache, cache_index,
                deterministic, kv_valid, causal, obs_start,
            )
            new_cache = scanned_cache if cache is not None else []
        else:
            new_cache = []
            for i, block in enumerate(self.blocks):
                layer_cache = cache[i] if cache is not None else None
                # fully positional so nn.remat's static_argnums line up
                x, c = block(x, mask, positions, layer_cache, cache_index,
                             deterministic, kv_valid, causal, obs_start)
                new_cache.append(c)
        x = self.final_norm(x)
        if return_hidden:
            return x, (new_cache if cache is not None else None)
        # fp32 logits (reference CastOutputToFloat), pad columns masked.
        return self.logits(x), (new_cache if cache is not None else None)


def _compact_layer(layer: dict, kv_valid, keep: int, sink: int, obs: int,
                   prefix_len: int, extra_cols: int) -> dict:
    """Top-``keep`` gather of one layer's cache columns by its prefill
    observation-window scores (``LlamaAttention`` ``obs_score``).  The
    first ``sink`` columns (attention sinks) and the last ``obs`` prefix
    columns (the text prompt) are always kept; invalid columns lose every
    tie.  Returns a fresh cache dict with KV axis ``keep + extra_cols``
    and a per-layer ``valid`` mask (rows with fewer than ``keep`` valid
    columns mark the surplus invalid)."""
    score = layer["obs_score"][:, :prefix_len].astype(jnp.float32)
    valid = kv_valid[:, :prefix_len] > 0
    col = jnp.arange(prefix_len)
    protect = (col < sink) | (col >= prefix_len - obs)
    score = jnp.where(protect[None, :], jnp.float32(1e30), score)
    score = jnp.where(valid, score, jnp.float32(-1e30))
    _, idx = jax.lax.top_k(score, keep)                     # (B, keep)
    idx = jnp.sort(idx, axis=-1)  # original order (ties/debuggability)

    def gather(x):
        ix = idx.reshape(idx.shape + (1,) * (x.ndim - 2))
        g = jnp.take_along_axis(x[:, :prefix_len], ix, axis=1)
        pads = [(0, 0)] * g.ndim
        pads[1] = (0, extra_cols)
        return jnp.pad(g, pads)

    def gather_scale(x):
        # scale leaves are (B, H, S): columns on the LAST axis
        g = jnp.take_along_axis(x[:, :, :prefix_len], idx[:, None, :], axis=2)
        return jnp.pad(g, [(0, 0), (0, 0), (0, extra_cols)])

    new = {k: gather(layer[k]) for k in ("k", "v") if k in layer}
    for k in ("k_scale", "v_scale"):
        if k in layer:
            new[k] = gather_scale(layer[k])
    new["valid"] = gather(kv_valid.astype(jnp.int32))
    return new


def compact_cache(cfg: LlamaConfig, cache, kv_valid, prefix_len: int,
                  extra_cols: int):
    """Post-prefill KV compaction (``cfg.kv_keep``; see config.py).

    ``cache`` is the prefill cache whose layers carry ``obs_score``
    (written when ``cfg.kv_keep > 0``); ``kv_valid`` the (B, KV) prefix
    validity.  Selection is per layer — the layer-adaptive focusing of
    AccKV (arXiv:2511.11106) with a static per-layer budget so every
    shape stays compile-time fixed.  Returns a cache with
    ``keep + extra_cols`` columns per layer whose per-layer ``valid``
    mask rides in the cache (``LlamaAttention`` consumes it)."""
    keep = min(cfg.kv_keep, prefix_len)
    # Protected regions clamp to the budget (tiny prefixes in tests);
    # the observation window is what the attention side scored with.
    sink = min(cfg.kv_keep_sink, keep)
    obs = min(cfg.kv_keep_obs, prefix_len, max(keep - sink, 0))
    if isinstance(cache, dict):  # scan_layers: stacked (L, ...) leaves
        return jax.vmap(
            lambda lay: _compact_layer(
                lay, kv_valid, keep, sink, obs, prefix_len, extra_cols
            )
        )(cache)
    return [
        _compact_layer(layer, kv_valid, keep, sink, obs, prefix_len, extra_cols)
        for layer in cache
    ]


def init_cache(cfg: LlamaConfig, batch: int, max_len: int):
    """Preallocate a static-shape KV cache (quantized values + scales
    when ``cfg.kv_quant`` is ``"int8"`` or ``"int4"`` — int4 packs two
    values per byte along head_dim).  Per-layer list of dicts; with
    ``cfg.scan_layers`` one dict whose leaves carry a leading
    (num_layers,) axis instead (the nn.scan xs/ys layout)."""
    shape = (batch, max_len, cfg.num_kv_heads, cfg.head_dim)
    if cfg.kv_quant == "int8":
        qshape, qdtype = shape, jnp.int8
    elif cfg.kv_quant == "int4":
        if cfg.head_dim % 2:
            raise ValueError("kv_quant='int4' needs an even head_dim")
        # trailing (H, D/2) dims MERGED: D/2 is typically 64 — half a
        # 128-lane TPU tile — and a 4D u8[..., H, 64] leaf pads 2x in
        # HBM ("extra memory due to padding: 2.0x expansion" in the
        # compiler's B=4 OOM dump), making the int4 cache occupy and
        # stream the same bytes as int8.  Merged, the lane dim is
        # H*D/2 (tile-clean); readers reshape chunk slices to heads.
        qshape = shape[:-2] + (cfg.num_kv_heads * cfg.head_dim // 2,)
        qdtype = jnp.uint8
    else:
        qshape = qdtype = None
    # Scale leaves store (B, kv_h, max_len) — the long axis LAST so the
    # f32 lane dim is the sequence, not kv_h (32 lanes of a 128 tile =
    # 4x padding: ~0.5 GB dead residency + reads at full size).
    sshape = (batch, cfg.num_kv_heads, max_len)
    if cfg.scan_layers:
        if qshape is not None:
            lq = (cfg.num_layers,) + qshape
            ls = (cfg.num_layers,) + sshape
            return {
                "k": jnp.zeros(lq, qdtype),
                "v": jnp.zeros(lq, qdtype),
                "k_scale": jnp.zeros(ls, jnp.float32),
                "v_scale": jnp.zeros(ls, jnp.float32),
            }
        dtype = jnp.dtype(cfg.dtype)
        lshape = (cfg.num_layers,) + shape
        return {"k": jnp.zeros(lshape, dtype), "v": jnp.zeros(lshape, dtype)}
    if qshape is not None:
        return [
            {
                "k": jnp.zeros(qshape, qdtype),
                "v": jnp.zeros(qshape, qdtype),
                "k_scale": jnp.zeros(sshape, jnp.float32),
                "v_scale": jnp.zeros(sshape, jnp.float32),
            }
            for _ in range(cfg.num_layers)
        ]
    dtype = jnp.dtype(cfg.dtype)
    return [
        {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}
        for _ in range(cfg.num_layers)
    ]
