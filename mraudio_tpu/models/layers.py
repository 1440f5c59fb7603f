"""Shared neural building blocks (flax.linen).

Conventions:
* Modules compute in a configurable ``dtype`` (bf16 on TPU) with fp32
  parameters; layer norms always reduce in fp32 and cast back, matching
  the reference's fp16-safe LayerNorm subclass
  (``models/xinstructblip.py:822-828``) — on TPU this keeps the VPU in
  its fast path while preserving statistics.
* Attention is a single einsum-based core so the Pallas flash-attention
  kernel (``mraudio_tpu.ops.attention``) can be swapped in behind one
  switch; every model-specific variant (RoPE, relative bias, cross
  attention) feeds the same core.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

# Exact (erf-based) GELU: torch ``nn.GELU()`` / HF ``"gelu"`` semantics.
# ``nn.gelu``'s default is the tanh approximation, which would be a small
# systematic divergence from every reference encoder (EVA-ViT, Q-Former,
# BEATs all use torch's default GELU).
gelu_exact = functools.partial(nn.gelu, approximate=False)

# Large negative value for masked logits — the single definition shared
# by the dense paths and the streaming attention kernels
# (ops/attention.py imports it), so masked-softmax behavior never drifts
# between implementations.  Representable in bf16 and f32 (bf16 carries
# the full f32 exponent range); exp(NEG_INF - m) underflows to exact 0.
NEG_INF = -1e30


class LayerNormFp32(nn.Module):
    """LayerNorm computed in float32 regardless of activation dtype."""

    epsilon: float = 1e-6
    use_bias: bool = True
    use_scale: bool = True

    @nn.compact
    def __call__(self, x):
        orig_dtype = x.dtype
        y = nn.LayerNorm(
            epsilon=self.epsilon,
            use_bias=self.use_bias,
            use_scale=self.use_scale,
            dtype=jnp.float32,
            param_dtype=jnp.float32,
        )(x.astype(jnp.float32))
        return y.astype(orig_dtype)


class RMSNorm(nn.Module):
    """Llama RMSNorm; variance in fp32."""

    epsilon: float = 1e-6

    @nn.compact
    def __call__(self, x):
        orig_dtype = x.dtype
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],), jnp.float32)
        xf = x.astype(jnp.float32)
        var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
        y = xf * jax.lax.rsqrt(var + self.epsilon)
        return (y * scale).astype(orig_dtype)


def dot_product_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: Optional[jax.Array] = None,
    bias: Optional[jax.Array] = None,
    scale: Optional[float] = None,
) -> jax.Array:
    """Attention core.  q: (B, Nq, H, D); k/v: (B, Nk, H, D);
    mask: broadcastable to (B, H, Nq, Nk) bool (True = attend);
    bias: additive logits bias, same broadcast.  Softmax in fp32."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    if mask is not None:
        logits = jnp.where(mask, logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


class Attention(nn.Module):
    """Multi-head (optionally cross) attention with fused-friendly layout."""

    num_heads: int
    head_dim: Optional[int] = None
    out_features: Optional[int] = None
    use_qkv_bias: bool = True
    use_out_bias: bool = True
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, kv=None, mask=None, bias=None):
        kv = x if kv is None else kv
        d_model = x.shape[-1]
        head_dim = self.head_dim or d_model // self.num_heads
        out_features = self.out_features or d_model

        dense = lambda name, feats, bias_flag: nn.DenseGeneral(
            features=feats,
            use_bias=bias_flag,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name=name,
        )
        q = dense("q", (self.num_heads, head_dim), self.use_qkv_bias)(x)
        k = dense("k", (self.num_heads, head_dim), self.use_qkv_bias)(kv)
        v = dense("v", (self.num_heads, head_dim), self.use_qkv_bias)(kv)

        out = dot_product_attention(q, k, v, mask=mask, bias=bias)
        return nn.DenseGeneral(
            features=out_features,
            axis=(-2, -1),
            use_bias=self.use_out_bias,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="out",
        )(out)


class Mlp(nn.Module):
    hidden_dim: int
    activation: Callable = gelu_exact
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        h = nn.Dense(self.hidden_dim, dtype=self.dtype, param_dtype=jnp.float32, name="fc1")(x)
        h = self.activation(h)
        return nn.Dense(d, dtype=self.dtype, param_dtype=jnp.float32, name="fc2")(h)


def make_padding_mask(attention_mask: jax.Array) -> jax.Array:
    """(B, Nk) {0,1} → (B, 1, 1, Nk) bool attend-mask."""
    return attention_mask[:, None, None, :].astype(bool)


def make_causal_padding_mask(attention_mask: jax.Array) -> jax.Array:
    """(B, N) {0,1} → (B, 1, N, N) bool causal+padding attend-mask."""
    n = attention_mask.shape[-1]
    causal = jnp.tril(jnp.ones((n, n), dtype=bool))
    pad = attention_mask[:, None, None, :].astype(bool)
    return causal[None, None] & pad


def positions_from_mask(attention_mask: jax.Array) -> jax.Array:
    """HF-compatible position ids: cumsum(mask)-1 clamped at 0, so
    left-padding (generate) and interior timestamp padding both index
    RoPE/positions exactly as the reference's HF Llama does."""
    pos = jnp.cumsum(attention_mask.astype(jnp.int32), axis=-1) - 1
    return jnp.maximum(pos, 0)
