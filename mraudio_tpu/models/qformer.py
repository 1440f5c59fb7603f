"""Q-Former: querying transformer bridging frozen encoders to the LLM.

Functional re-creation of the BLIP-2 Q-Former the reference instantiates
per modality (``models/xinstructblip.py:614-655``): a BERT-base encoder
whose input is [32 learned query tokens ; tokenized instruction text].
Self-attention is joint over queries+text; every
``cross_attention_freq``-th layer adds cross-attention from the *query*
positions into the frozen encoder's output; the feed-forward uses
separate weights for query vs. text positions.  The LM head is unused
(the reference sets ``qformer.cls = None``) and therefore not built.

TPU note: the assembly calls this with frames folded into the batch
dimension — (B·T) independent rows — so the whole per-frame Q-Former
sweep of the reference (``models/xinstructblip.py:286-293``) is one
batched jitted call.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from mraudio_tpu.config import QFormerConfig
from mraudio_tpu.models.layers import (
    Attention,
    LayerNormFp32,
    Mlp,
    make_padding_mask,
)


class QFormerLayer(nn.Module):
    cfg: QFormerConfig
    has_cross_attention: bool
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x, self_mask, encoder_states, encoder_mask, query_length):
        cfg = self.cfg

        # Joint self-attention over [queries ; text] (post-LN, BERT style).
        h = Attention(num_heads=cfg.num_heads, dtype=self.dtype, name="self_attn")(
            x, mask=self_mask
        )
        x = LayerNormFp32(epsilon=cfg.layer_norm_eps, name="self_norm")(x + h)

        queries, text = x[:, :query_length], x[:, query_length:]

        if self.has_cross_attention:
            h = Attention(
                num_heads=cfg.num_heads, dtype=self.dtype, name="cross_attn"
            )(queries, kv=encoder_states, mask=encoder_mask)
            queries = LayerNormFp32(epsilon=cfg.layer_norm_eps, name="cross_norm")(
                queries + h
            )

        # Separate FFN weight sets for query vs. text positions.
        hq = Mlp(hidden_dim=cfg.intermediate_size, dtype=self.dtype, name="mlp_query")(
            queries
        )
        queries = LayerNormFp32(epsilon=cfg.layer_norm_eps, name="ffn_norm_query")(
            queries + hq
        )
        if text.shape[1] > 0:
            ht = Mlp(hidden_dim=cfg.intermediate_size, dtype=self.dtype, name="mlp_text")(
                text
            )
            text = LayerNormFp32(epsilon=cfg.layer_norm_eps, name="ffn_norm_text")(
                text + ht
            )
        return jnp.concatenate([queries, text], axis=1)


class QFormer(nn.Module):
    cfg: QFormerConfig

    @nn.compact
    def __call__(
        self,
        query_embeds: jax.Array,       # (N, Q, H) learned query tokens
        input_ids: jax.Array,          # (N, L) instruction token ids
        attention_mask: jax.Array,     # (N, L) {0,1} for the text part
        encoder_hidden_states: jax.Array,  # (N, S, E) frozen encoder output
        encoder_attention_mask: jax.Array | None = None,  # (N, S)
    ) -> jax.Array:
        """Returns last hidden states (N, Q+L, H)."""
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        n, q_len, _ = query_embeds.shape
        l_len = input_ids.shape[1]

        word = nn.Embed(
            cfg.vocab_size, cfg.hidden_size, param_dtype=jnp.float32, name="word_embeddings"
        )(input_ids)
        pos = self.param(
            "position_embeddings",
            nn.initializers.normal(cfg.initializer_range),
            (cfg.max_position_embeddings, cfg.hidden_size),
            jnp.float32,
        )
        text = (word + pos[:l_len][None]).astype(dtype)
        # Zero padded text positions: their values are never attended, but
        # a garbage embedding there would still poison the output through
        # 0·NaN in the probs@values matmul.
        text = text * attention_mask[..., None].astype(dtype)

        x = jnp.concatenate([query_embeds.astype(dtype), text], axis=1)
        x = LayerNormFp32(epsilon=cfg.layer_norm_eps, name="embeddings_norm")(x)

        # Queries always valid; text per attention_mask.
        joint_mask = jnp.concatenate(
            [jnp.ones((n, q_len), dtype=attention_mask.dtype), attention_mask], axis=1
        )
        self_mask = make_padding_mask(joint_mask)
        if encoder_attention_mask is None:
            encoder_attention_mask = jnp.ones(
                encoder_hidden_states.shape[:2], dtype=jnp.int32
            )
        enc_mask = make_padding_mask(encoder_attention_mask)

        enc = encoder_hidden_states.astype(dtype)
        for i in range(cfg.num_layers):
            x = QFormerLayer(
                cfg,
                has_cross_attention=(i % cfg.cross_attention_freq == 0),
                dtype=dtype,
                name=f"layer_{i}",
            )(x, self_mask, enc, enc_mask, q_len)
        return x
