"""BEATs-style audio encoder in JAX.

Functional re-creation of the encoder the reference binds via LAVIS
``BeatsEncoder`` (``models/xinstructblip.py:670-676``; checkpoint
``BEATs_iter3_plus_AS2M.pt``): a ViT-style patch embedding over the
log-mel fbank, a convolutional relative positional embedding, and 12
post-norm transformer layers with gated (T5-bucketed) relative position
bias.  ``num_features`` = 768.

Input here is one audio chunk's fbank (N, T_mel, n_mels) — chunks are
folded into the batch dimension by the assembly exactly like video
frames, replacing the reference's per-chunk Python loop
(``models/xinstructblip.py:271-275``).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from mraudio_tpu.config import BeatsConfig
from mraudio_tpu.models.layers import Attention, LayerNormFp32, Mlp, gelu_exact


def t5_relative_buckets(
    relative_position: np.ndarray, num_buckets: int, max_distance: int
) -> np.ndarray:
    """Bidirectional T5 bucketing of relative positions (host-side,
    static sequence length)."""
    ret = np.zeros_like(relative_position)
    n_buckets = num_buckets // 2
    ret += (relative_position > 0).astype(np.int64) * n_buckets
    rel = np.abs(relative_position)

    max_exact = n_buckets // 2
    is_small = rel < max_exact
    large = max_exact + (
        np.log(np.maximum(rel, 1) / max_exact)
        / np.log(max_distance / max_exact)
        * (n_buckets - max_exact)
    ).astype(np.int64)
    large = np.minimum(large, n_buckets - 1)
    ret += np.where(is_small, rel, large)
    return ret


class RelativePositionTable(nn.Module):
    """Shared T5-bucketed relative position bias table (BEATs keeps one
    table on layer 0, reused by every layer)."""

    cfg: BeatsConfig

    @nn.compact
    def __call__(self, seq_len: int) -> jax.Array:
        cfg = self.cfg
        rel = np.arange(seq_len)[None, :] - np.arange(seq_len)[:, None]
        buckets = t5_relative_buckets(
            rel, cfg.rel_pos_buckets, cfg.rel_pos_max_distance
        )
        table = self.param(
            "rel_attn_bias",
            nn.initializers.normal(0.02),
            (cfg.rel_pos_buckets, cfg.num_heads),
            jnp.float32,
        )
        bias = table[jnp.asarray(buckets)]  # (L, L, H)
        return bias.transpose(2, 0, 1)[None]  # (1, H, L, L)


class GatedBias(nn.Module):
    """Per-layer query-conditioned gate on the shared bias — BEATs'
    ``gru_rel_pos`` gating, structure-exact: ``grep_linear`` projects each
    query head to 8 values, summed in two groups of 4 and squashed to
    (gate_a, gate_b); the bias scale is
    ``gate_a * (gate_b * grep_a - 1) + 2`` with a learned per-head
    ``grep_a`` (BEATs ``backbone.MultiheadAttention``, bound via
    reference ``models/xinstructblip.py:670-676``)."""

    cfg: BeatsConfig
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, q: jax.Array, bias: jax.Array) -> jax.Array:
        # q: (B, L, H, Dh)
        g = nn.DenseGeneral(
            features=8, axis=-1, dtype=self.dtype, param_dtype=jnp.float32,
            name="grep_linear",
        )(q)  # (B, L, H, 8)
        g = g.astype(jnp.float32).reshape(g.shape[:-1] + (2, 4)).sum(-1)
        gate_a, gate_b = jnp.split(jax.nn.sigmoid(g), 2, axis=-1)  # (B,L,H,1)
        grep_a = self.param(
            "grep_a", nn.initializers.ones, (self.cfg.num_heads,), jnp.float32
        )
        gate = gate_a * (gate_b * grep_a[None, None, :, None] - 1.0) + 2.0
        return gate.transpose(0, 2, 1, 3) * bias  # (B,H,L,1) * (1,H,L,L)


class BeatsBlock(nn.Module):
    """Post-LN transformer layer (wav2vec2-style, layer_norm_first=False)."""

    cfg: BeatsConfig
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x, bias):
        cfg = self.cfg
        h = Attention(num_heads=cfg.num_heads, dtype=self.dtype, name="attn")(
            x, bias=bias
        )
        x = LayerNormFp32(epsilon=cfg.layer_norm_eps, name="norm1")(x + h)
        h = Mlp(hidden_dim=cfg.mlp_dim, dtype=self.dtype, name="mlp")(x)
        return LayerNormFp32(epsilon=cfg.layer_norm_eps, name="norm2")(x + h)


class BeatsEncoder(nn.Module):
    cfg: BeatsConfig

    @nn.compact
    def __call__(self, fbank: jnp.ndarray) -> jnp.ndarray:
        """fbank: (N, T_mel, n_mels) normalized log-mels.
        Returns (N, tokens, width)."""
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        n, t, f = fbank.shape
        p, s = cfg.patch_size, cfg.patch_stride

        # Patch embedding as one GEMM over (p, p) fbank tiles.
        gt, gf = t // s, f // s
        x = fbank[:, : gt * s, : gf * s].reshape(n, gt, s, gf, s)
        x = x.transpose(0, 1, 3, 2, 4).reshape(n, gt * gf, s * s)
        x = nn.Dense(
            cfg.conv_dim, dtype=dtype, param_dtype=jnp.float32, name="patch_embed"
        )(x.astype(dtype))

        x = LayerNormFp32(epsilon=cfg.layer_norm_eps, name="patch_norm")(x)
        if cfg.conv_dim != cfg.width:
            x = nn.Dense(
                cfg.width, dtype=dtype, param_dtype=jnp.float32, name="post_extract_proj"
            )(x)

        # Convolutional positional embedding (grouped conv1d + GELU),
        # added residually.  wav2vec2-style padding: pad k//2 both sides
        # then trim the LAST output for even kernels ("SamePad") — i.e.
        # (k//2, k//2 - 1), which differs from XLA SAME's (63, 64) split
        # at the real kernel size of 128; the asymmetry shifts every
        # position embedding by one otherwise.
        k = cfg.conv_pos_kernel
        pos = nn.Conv(
            features=cfg.width,
            kernel_size=(k,),
            padding=((k // 2, k // 2 - 1),) if k % 2 == 0 else ((k // 2, k // 2),),
            feature_group_count=cfg.conv_pos_groups,
            dtype=dtype,
            param_dtype=jnp.float32,
            name="pos_conv",
        )(x)
        x = x + gelu_exact(pos)
        x = LayerNormFp32(epsilon=cfg.layer_norm_eps, name="pre_encoder_norm")(x)

        seq_len = x.shape[1]
        shared_bias = RelativePositionTable(cfg, name="rel_pos_bias")(seq_len)

        for i in range(cfg.depth):
            # shared table, per-layer gate conditioned on the layer input
            bias = GatedBias(cfg, dtype, name=f"gate_{i}")(
                x.reshape(n, seq_len, cfg.num_heads, cfg.width // cfg.num_heads),
                shared_bias,
            )
            x = BeatsBlock(cfg, dtype, name=f"block_{i}")(x, bias)
        return x
