"""HF-oracle numerics tests for the encoder stacks.

Round-1 review: the Q-Former and ViT converters were structure-verified
only (Llama was the lone numerics-verified stack).  These tests verify
the *math* of the shared ``layers.Attention`` / ``Mlp`` / ``LayerNormFp32``
machinery against torch implementations of the same architectures:

* :class:`QFormer` vs HF ``BertLMHeadModel`` (is_decoder +
  add_cross_attention) — the exact model class BLIP-2/LAVIS subclass for
  the reference's Q-Formers (``/root/reference/models/xinstructblip.py:614-655``).
  Query-only input with ``cross_attention_freq=1`` makes the two
  architectures mathematically identical (HF cross-attends every
  position of every layer; with no text positions that equals the
  LAVIS query-only cross-attention).
* :class:`EvaViT` vs HF ``CLIPVisionModel`` — the VideoLLaMA2 vision
  tower layout (``convert_clip_vit_hf``); pre-LN blocks, class token,
  learned positions are shared with the EVA path.

Both run in fp32 on CPU; tolerances are float-roundoff scale.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from mraudio_tpu.config import QFormerConfig, ViTConfig


def _np_sd(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def test_qformer_matches_hf_bert_numerically():
    from transformers import BertConfig, BertLMHeadModel

    from mraudio_tpu.models.convert_weights import convert_qformer
    from mraudio_tpu.models.qformer import QFormer

    B, Q, S, H = 2, 4, 3, 32
    cfg = QFormerConfig(
        hidden_size=H, num_layers=3, num_heads=4, intermediate_size=64,
        cross_attention_freq=1, num_query_tokens=Q, vocab_size=64,
        max_position_embeddings=16, dtype="float32",
    )
    hf_cfg = BertConfig(
        vocab_size=64, hidden_size=H, num_hidden_layers=3,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=16, is_decoder=True,
        add_cross_attention=True, hidden_act="gelu", layer_norm_eps=1e-12,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    hf = BertLMHeadModel(hf_cfg).eval()
    # LAVIS's BertEmbeddings has no token_type term and does not add
    # position embeddings to query tokens — zero both in the HF model so
    # the two compute the same function on query-only input.
    with torch.no_grad():
        hf.bert.embeddings.token_type_embeddings.weight.zero_()
        hf.bert.embeddings.position_embeddings.weight.zero_()

    sd = _np_sd(hf)
    # HF bert has a single FFN per layer; the LAVIS Q-Former adds a
    # separate query-position FFN (intermediate_query/output_query, the
    # only structural difference) — alias it to the same weights.
    for i in range(cfg.num_layers):
        pre = f"bert.encoder.layer.{i}"
        for a, b in ((f"{pre}.intermediate_query", f"{pre}.intermediate"),
                     (f"{pre}.output_query", f"{pre}.output")):
            for suffix in ("dense.weight", "dense.bias"):
                sd[f"{a}.{suffix}"] = sd[f"{b}.{suffix}"]
            if "output" in a:
                for suffix in ("LayerNorm.weight", "LayerNorm.bias"):
                    sd[f"{a}.{suffix}"] = sd[f"{b}.{suffix}"]
    params = convert_qformer(sd, cfg)

    rng = np.random.default_rng(1)
    query = rng.standard_normal((B, Q, H)).astype(np.float32)
    enc = rng.standard_normal((B, S, H)).astype(np.float32)

    with torch.no_grad():
        # 3D all-ones mask: bypasses the is_decoder causal-mask path so
        # self-attention stays bidirectional, as in the LAVIS Q-Former.
        ref = hf.bert(
            inputs_embeds=torch.from_numpy(query),
            attention_mask=torch.ones(B, Q, Q),
            encoder_hidden_states=torch.from_numpy(enc),
            encoder_attention_mask=torch.ones(B, S),
        ).last_hidden_state.numpy()

    out = QFormer(cfg).apply(
        {"params": params},
        jnp.asarray(query),
        jnp.zeros((B, 0), jnp.int32),
        jnp.zeros((B, 0), jnp.int32),
        jnp.asarray(enc),
        jnp.ones((B, S), jnp.int32),
    )
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=2e-5)


def test_eva_vit_matches_hf_clip_numerically():
    from transformers import CLIPVisionConfig, CLIPVisionModel

    from mraudio_tpu.models.convert_weights import convert_clip_vit_hf
    from mraudio_tpu.models.eva_vit import EvaViT

    B, D = 2, 32
    cfg = ViTConfig(
        image_size=28, patch_size=14, width=D, depth=3, num_heads=4,
        mlp_dim=64, layer_norm_eps=1e-5, dtype="float32",
    )
    hf_cfg = CLIPVisionConfig(
        hidden_size=D, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=4, image_size=28, patch_size=14,
        hidden_act="gelu", layer_norm_eps=1e-5, attention_dropout=0.0,
    )
    torch.manual_seed(0)
    hf = CLIPVisionModel(hf_cfg).eval()
    # Our ViT (like the reference's EVA path) has no embedding-level
    # LayerNorm; CLIP's post_layernorm only touches the pooled output,
    # which we don't compare.
    hf.vision_model.pre_layrnorm = torch.nn.Identity()

    sd = _np_sd(hf)
    params = convert_clip_vit_hf(sd, cfg)

    rng = np.random.default_rng(2)
    pixels = rng.standard_normal((B, 3, 28, 28)).astype(np.float32)
    with torch.no_grad():
        ref = hf(pixel_values=torch.from_numpy(pixels)).last_hidden_state.numpy()

    out = EvaViT(cfg).apply(
        {"params": params}, jnp.asarray(pixels.transpose(0, 2, 3, 1))
    )
    assert out.shape == ref.shape == (B, cfg.seq_len, D)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=2e-5)
