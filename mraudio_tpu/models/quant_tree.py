"""Tree-level int8 compression for frozen parameter subtrees.

The reference trains LoRA over a bitsandbytes 8-bit LLM base
(``load_in_8bit``, ``/root/reference/models/xinstructblip.py:151``) but
keeps its frozen encoders fp16.  On a 16 GB v5e the frozen *encoders*
(EVA-ViT-g + BEATs + two Q-Formers + projections ≈ 2.7 GB bf16) are what
stand between the full-size 7B LoRA train step and a single chip (see
docs/BENCHMARKS.md "Full-size training"), so this module provides an
opt-in storage transform over any frozen flat param dict
(``train.quant_frozen = "int8"``):

* ``quantize_frozen`` replaces each large float ``kernel`` leaf with an
  int8 tensor + per-output-channel fp32 scale (absmax over the input
  axis, the bitsandbytes convention);
* ``dequantize_frozen`` restores the original keys *inside the jitted
  step*, where XLA fuses the convert×scale chain into each matmul's
  weight read — the bf16 copy is never materialized in HBM on the
  forward-only encoder program (``train.split_encode_step``).

This is a memory lever, not a parity path: int8 encoder weights are an
approximation relative to the reference's fp16 encoders (the LLM's int8
path, by contrast, *is* reference behavior).  Keys are untouched for the
LLM subtree because its projections already hold int8 leaves when
``LlamaConfig.quantization == "int8"``; ``lm_head`` float kernels are
excluded to mirror HF ``get_keys_to_not_convert``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# A quantized leaf (..., "kernel") is stored as two keys
# (..., "kernel", QKEY) and (..., "kernel", SKEY).  Genuine parameter
# paths never pass *through* a "kernel" component (it is always the leaf
# name), so the pairing is unambiguous.
QKEY = "int8"
SKEY = "scale"

# Leaves eligible for quantization: float kernels with a real input
# axis to amortize the fp32 scale over, and big enough to matter.
MIN_DIM0 = 16
MIN_SIZE = 65536


def _eligible(path: tuple, leaf) -> bool:
    if path[-1] != "kernel" or any(p == "lm_head" for p in path):
        return False
    if not jnp.issubdtype(leaf.dtype, jnp.floating):
        return False
    return (
        leaf.ndim >= 2 and leaf.shape[0] >= MIN_DIM0 and leaf.size >= MIN_SIZE
    )


@jax.jit
def _quantize_one(w):
    wf = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(wf), axis=0)
    scale = jnp.where(absmax == 0, 1.0, absmax / 127.0)
    return jnp.round(wf / scale).astype(jnp.int8), scale


def quantize_frozen(flat: dict) -> dict:
    """flat {path tuple: array} -> same dict with eligible kernels
    replaced by int8 + scale pairs.  Quantizes on device, leaf by leaf
    (the original's buffer frees as soon as the dict stops referencing
    it — no host round trip, no second full tree resident)."""
    out = {}
    for k, v in flat.items():
        if not _eligible(k, v):
            out[k] = v
            continue
        q, scale = _quantize_one(v)
        out[k + (QKEY,)] = q
        out[k + (SKEY,)] = scale
    return out


def dequantize_frozen(flat: dict, dtype=jnp.bfloat16) -> dict:
    """Inverse of ``quantize_frozen`` key-wise; call *inside* jit so each
    leaf's convert×scale fuses into its consumer's weight read.  A dict
    with no quantized keys passes through unchanged."""
    out = {}
    for k, v in flat.items():
        if len(k) >= 2 and k[-1] == QKEY and k[-2] == "kernel":
            base = k[:-1]
            out[base] = (v * flat[base + (SKEY,)]).astype(dtype)
        elif len(k) >= 2 and k[-1] == SKEY and k[-2] == "kernel":
            continue
        else:
            out[k] = v
    return out


def quantize_subtrees(params: dict, keys) -> dict:
    """Nested-tree front end for the eval graph: quantize the large
    float kernels of ``params[k]`` for every ``k`` in ``keys`` (the
    frozen encoder components, ``XInstructBLIP.ENCODER_PARAM_KEYS``).
    The model dequantizes on use inside its jitted programs
    (``_encode_modality_tokens``), where XLA fuses the convert×scale
    into each matmul's weight read — so the ~2.7 GB bf16 encoder stack
    is HBM-resident at ~1.35 GB, the margin that fits one more eval
    batch row beside the 7B decode cache on a 16 GB chip.  Same
    approximation status as ``train.quant_frozen`` (the reference keeps
    its encoders fp16): opt-in, documented, off for parity runs."""
    from flax import traverse_util

    out = dict(params)
    for k in keys:
        sub = out.get(k)
        if not isinstance(sub, dict):
            continue
        flat = traverse_util.flatten_dict(sub)
        out[k] = traverse_util.unflatten_dict(quantize_frozen(flat))
    return out


def dequantize_subtrees(params: dict, keys, dtype=jnp.bfloat16) -> dict:
    """Inverse of :func:`quantize_subtrees`; call inside jit.  Subtrees
    with no quantized leaves pass through untouched (structural check,
    free at trace time)."""
    from flax import traverse_util

    out = dict(params)
    for k in keys:
        sub = out.get(k)
        if not isinstance(sub, dict):
            continue
        flat = traverse_util.flatten_dict(sub)
        if not any(p[-1] == QKEY for p in flat):
            continue
        out[k] = traverse_util.unflatten_dict(dequantize_frozen(flat, dtype))
    return out


def quantized_bytes_saved(flat: dict) -> int:
    """Diagnostic: bytes saved vs. bf16 storage of the quantized leaves."""
    saved = 0
    for k, v in flat.items():
        if len(k) >= 2 and k[-1] == QKEY and k[-2] == "kernel":
            saved += v.size  # bf16(2B) -> int8(1B)
            saved -= flat[k[:-1] + (SKEY,)].size * 4
    return saved
