"""EVA-ViT-g/14 frame encoder in JAX.

Functional re-creation of the encoder the reference builds via LAVIS
``create_eva_vit_g`` (``models/xinstructblip.py:658-666``): patch-embed
conv, class token, learned absolute position embeddings, 39 pre-norm
transformer blocks with qkv bias, **no final layer norm** (the external
``video_ln`` fp32 LayerNorm is applied by the assembly, as in the
reference).  224² input → 257 tokens × 1408 features.

TPU-first notes: frames arrive folded into the batch dimension
((B*T, H, W, 3)) so all frames of all clips go through one MXU-shaped
matmul stream — the reference instead loops Python-side over 60 frames
per clip (``models/xinstructblip.py:262-266``).  The patch conv is a
reshape+matmul (14×14 patches → one (196, 588)×(588, 1408) GEMM per
image), which XLA maps onto the MXU directly.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from mraudio_tpu.config import ViTConfig
from mraudio_tpu.models.layers import Attention, LayerNormFp32, Mlp


class ViTBlock(nn.Module):
    cfg: ViTConfig
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        h = LayerNormFp32(epsilon=cfg.layer_norm_eps, name="norm1")(x)
        h = Attention(num_heads=cfg.num_heads, dtype=self.dtype, name="attn")(h)
        x = x + h
        h = LayerNormFp32(epsilon=cfg.layer_norm_eps, name="norm2")(x)
        h = Mlp(hidden_dim=cfg.mlp_dim, dtype=self.dtype, name="mlp")(h)
        return x + h


class EvaViT(nn.Module):
    cfg: ViTConfig

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        """images: (N, H, W, 3) normalized, model dtype.
        Returns (N, seq_len, width)."""
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        n, h, w, c = images.shape
        p = cfg.patch_size

        # Patch embedding as a single GEMM: (N, gh*gw, p*p*3) @ (p*p*3, D).
        gh, gw = h // p, w // p
        patches = images.reshape(n, gh, p, gw, p, c).transpose(0, 1, 3, 2, 4, 5)
        patches = patches.reshape(n, gh * gw, p * p * c)
        x = nn.Dense(
            cfg.width, dtype=dtype, param_dtype=jnp.float32, name="patch_embed"
        )(patches.astype(dtype))

        if cfg.use_class_token:
            cls = self.param(
                "cls_token", nn.initializers.normal(0.02), (1, 1, cfg.width), jnp.float32
            )
            x = jnp.concatenate([jnp.broadcast_to(cls, (n, 1, cfg.width)).astype(dtype), x], axis=1)

        pos = self.param(
            "pos_embed",
            nn.initializers.normal(0.02),
            (1, cfg.seq_len, cfg.width),
            jnp.float32,
        )
        x = x + pos.astype(dtype)

        block_cls = ViTBlock
        if cfg.grad_checkpoint:
            block_cls = nn.remat(ViTBlock)
        for i in range(cfg.depth):
            x = block_cls(cfg, dtype, name=f"block_{i}")(x)
        return x
