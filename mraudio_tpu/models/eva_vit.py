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

Temporal-residual mode (``cfg.keyframe_interval > 1``, opt-in, off by
default — a ResidualViT-style optimization, PAPERS.md): consecutive
video frames are highly redundant, so only every K-th frame runs the
full transformer; in-between frames run it on their ``residual_tokens``
most-changed patches (L2 distance of raw patch embeddings vs. the
preceding keyframe) and inherit the keyframe's features for the rest.
Everything is static-shape (fixed top-R per frame) and the blocks are
the same modules, applied to a shorter token axis — FLOPs per non-key
frame drop to roughly (R/P)² of attention + R/P of MLP.  This changes
model outputs (an approximation), so it is not used for reference
parity; enable it for throughput-oriented deployments.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from mraudio_tpu.config import ViTConfig
from mraudio_tpu.models.layers import Attention, LayerNormFp32, Mlp


def _vit_activation(name: str):
    """Tower-flavor MLP activations (ViTConfig.mlp_act): EVA uses exact
    gelu, CLIP towers quick_gelu, SigLIP towers (VideoLLaMA2.1)
    gelu_pytorch_tanh."""
    import functools

    if name == "gelu":
        from mraudio_tpu.models.layers import gelu_exact

        return gelu_exact
    if name == "quick_gelu":
        return lambda x: x * nn.sigmoid(1.702 * x)
    if name == "gelu_tanh":
        return functools.partial(nn.gelu, approximate=True)
    raise ValueError(f"unknown ViTConfig.mlp_act {name!r}")


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
        h = Mlp(hidden_dim=cfg.mlp_dim, dtype=self.dtype, name="mlp",
                activation=_vit_activation(cfg.mlp_act))(h)
        return x + h


class EvaViT(nn.Module):
    cfg: ViTConfig

    @nn.compact
    def __call__(
        self, images: jnp.ndarray, n_frms: Optional[int] = None
    ) -> jnp.ndarray:
        """images: (N, H, W, 3) normalized, model dtype.
        Returns (N, seq_len, width).

        With ``cfg.keyframe_interval > 1`` and ``n_frms`` given (N must
        be B*n_frms, frames contiguous per clip), runs the
        temporal-residual path described in the module docstring."""
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        n, h, w, c = images.shape
        p = cfg.patch_size

        # Patch embedding as a single GEMM: (N, gh*gw, p*p*3) @ (p*p*3, D).
        gh, gw = h // p, w // p
        num_patches = gh * gw
        patches = images.reshape(n, gh, p, gw, p, c).transpose(0, 1, 3, 2, 4, 5)
        patches = patches.reshape(n, num_patches, p * p * c)
        x = nn.Dense(
            cfg.width, dtype=dtype, param_dtype=jnp.float32, name="patch_embed"
        )(patches.astype(dtype))

        if cfg.use_class_token:
            cls = self.param(
                "cls_token", nn.initializers.normal(0.02), (1, 1, cfg.width), jnp.float32
            )
        pos = self.param(
            "pos_embed",
            nn.initializers.normal(0.02),
            (1, cfg.seq_len, cfg.width),
            jnp.float32,
        )

        block_cls = ViTBlock
        if cfg.grad_checkpoint:
            block_cls = nn.remat(ViTBlock)
        blocks = [block_cls(cfg, dtype, name=f"block_{i}") for i in range(cfg.depth)]

        def with_cls_and_pos(tokens, pos_tokens):
            """tokens: (M, L, D) patch embeddings; pos_tokens: (M|1, L, D)."""
            m = tokens.shape[0]
            if cfg.use_class_token:
                c0 = jnp.broadcast_to(cls, (m, 1, cfg.width)).astype(dtype)
                c0 = c0 + pos[:, :1].astype(dtype)
                tokens = jnp.concatenate([c0, tokens + pos_tokens], axis=1)
            else:
                tokens = tokens + pos_tokens
            return tokens

        def run(tokens):
            for blk in blocks:
                tokens = blk(tokens)
            return tokens

        residual = (
            cfg.keyframe_interval > 1
            and n_frms is not None
            and n_frms > 1
        )
        patch_pos = pos[:, 1:] if cfg.use_class_token else pos
        if not residual:
            return run(with_cls_and_pos(x, patch_pos.astype(dtype)))

        # ---- temporal-residual path ----
        t = n_frms
        b = n // t
        k_int = cfg.keyframe_interval
        r = min(cfg.residual_tokens, num_patches)
        key_idx = list(range(0, t, k_int))
        nn_idx = [i for i in range(t) if i % k_int != 0]
        nk, nn_ = len(key_idx), len(nn_idx)

        emb = x.reshape(b, t, num_patches, cfg.width)

        # Keyframes: full transformer.
        key_emb = emb[:, key_idx].reshape(b * nk, num_patches, cfg.width)
        key_out = run(with_cls_and_pos(key_emb, patch_pos.astype(dtype)))
        seq_len = key_out.shape[1]
        key_out = key_out.reshape(b, nk, seq_len, cfg.width)

        if nn_ == 0:
            return key_out.reshape(b * nk, seq_len, cfg.width)

        # Non-key frames: top-R most-changed patches vs. their keyframe.
        prev_key = [(i // k_int) for i in nn_idx]          # index into key axis
        nn_emb = emb[:, nn_idx]                            # (B, nn, P, D)
        ref_emb = emb[:, [key_idx[j] for j in prev_key]]   # (B, nn, P, D)
        diff = jnp.sum(
            (nn_emb.astype(jnp.float32) - ref_emb.astype(jnp.float32)) ** 2,
            axis=-1,
        )                                                  # (B, nn, P)
        _, idx = jax.lax.top_k(diff, r)                    # (B, nn, R)

        bidx = jnp.arange(b)[:, None, None]
        fidx = jnp.arange(nn_)[None, :, None]
        sel = nn_emb[bidx, fidx, idx]                      # (B, nn, R, D)
        sel_pos = patch_pos.astype(dtype)[0][idx]          # (B, nn, R, D)
        sub = sel + sel_pos
        sub = sub.reshape(b * nn_, r, cfg.width)
        if cfg.use_class_token:
            c0 = jnp.broadcast_to(cls, (b * nn_, 1, cfg.width)).astype(dtype)
            c0 = c0 + pos[:, :1].astype(dtype)
            sub = jnp.concatenate([c0, sub], axis=1)
        sub_out = run(sub).reshape(b, nn_, sub.shape[1], cfg.width)

        # Assemble: non-key frames inherit keyframe tokens, overwritten at
        # the recomputed patches (+ their own cls).
        nn_out = key_out[:, prev_key]                      # (B, nn, L, D)
        off = 1 if cfg.use_class_token else 0
        if cfg.use_class_token:
            nn_out = nn_out.at[:, :, 0].set(sub_out[:, :, 0])
        nn_out = nn_out.at[bidx, fidx, idx + off].set(sub_out[:, :, off:])

        out = jnp.zeros((b, t, seq_len, cfg.width), key_out.dtype)
        out = out.at[:, key_idx].set(key_out)
        out = out.at[:, nn_idx].set(nn_out)
        return out.reshape(b * t, seq_len, cfg.width)
