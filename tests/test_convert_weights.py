"""Weight-converter tests.

Two levels:
1. Structure: converted trees must match ``init_params`` exactly in
   paths and shapes (catches mapping bugs without real checkpoints).
2. Numerics: our Llama forward must match HF ``LlamaForCausalLM``
   (torch, CPU) on the same random weights and inputs — the strongest
   available parity oracle for the decode path.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mraudio_tpu.config import tiny_data_config, tiny_model_config
from mraudio_tpu.models.convert_weights import (
    convert_eva_vit,
    convert_llama_hf,
    convert_qformer_bundle,
    quantize_llama_int8,
)
from mraudio_tpu.models.llama import LlamaModel
from mraudio_tpu.models.xinstructblip import XInstructBLIP


CFG = tiny_model_config()


def _tree_spec(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_tree_spec(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = tuple(v.shape)
    return out


def _synthetic_eva_sd(cfg):
    rng = np.random.default_rng(0)
    d, p = cfg.width, cfg.patch_size
    sd = {
        "patch_embed.proj.weight": rng.standard_normal((d, 3, p, p), dtype=np.float32),
        "patch_embed.proj.bias": rng.standard_normal(d).astype(np.float32),
        "cls_token": rng.standard_normal((1, 1, d)).astype(np.float32),
        "pos_embed": rng.standard_normal((1, cfg.seq_len, d)).astype(np.float32),
    }
    for i in range(cfg.depth):
        pre = f"blocks.{i}"
        sd[f"{pre}.norm1.weight"] = np.ones(d, np.float32)
        sd[f"{pre}.norm1.bias"] = np.zeros(d, np.float32)
        sd[f"{pre}.norm2.weight"] = np.ones(d, np.float32)
        sd[f"{pre}.norm2.bias"] = np.zeros(d, np.float32)
        sd[f"{pre}.attn.qkv.weight"] = rng.standard_normal((3 * d, d)).astype(np.float32)
        sd[f"{pre}.attn.q_bias"] = rng.standard_normal(d).astype(np.float32)
        sd[f"{pre}.attn.v_bias"] = rng.standard_normal(d).astype(np.float32)
        sd[f"{pre}.attn.proj.weight"] = rng.standard_normal((d, d)).astype(np.float32)
        sd[f"{pre}.attn.proj.bias"] = rng.standard_normal(d).astype(np.float32)
        sd[f"{pre}.mlp.fc1.weight"] = rng.standard_normal((cfg.mlp_dim, d)).astype(np.float32)
        sd[f"{pre}.mlp.fc1.bias"] = rng.standard_normal(cfg.mlp_dim).astype(np.float32)
        sd[f"{pre}.mlp.fc2.weight"] = rng.standard_normal((d, cfg.mlp_dim)).astype(np.float32)
        sd[f"{pre}.mlp.fc2.bias"] = rng.standard_normal(d).astype(np.float32)
    return sd


def test_eva_vit_converter_structure():
    model = XInstructBLIP(CFG, audio_cfg=tiny_data_config().audio)
    ref = model.init_params(jax.random.PRNGKey(0))["vit"]
    converted = convert_eva_vit(_synthetic_eva_sd(CFG.vit), CFG.vit)
    assert _tree_spec(converted) == _tree_spec(ref)


def _synthetic_qformer_bundle_sd(cfg, modality, encoder_width):
    rng = np.random.default_rng(1)
    h = cfg.hidden_size

    def lin(shape):
        return rng.standard_normal(shape).astype(np.float32)

    sd = {
        f"{modality}_query_tokens": lin((1, cfg.num_query_tokens, h)),
        f"{modality}_ln.weight": np.ones(encoder_width, np.float32),
        f"{modality}_ln.bias": np.zeros(encoder_width, np.float32),
        f"{modality}_llm_proj.weight": lin((CFG.llm.hidden_size, h)),
        f"{modality}_llm_proj.bias": lin(CFG.llm.hidden_size),
        f"{modality}_Qformer.bert.embeddings.word_embeddings.weight": lin((cfg.vocab_size, h)),
        f"{modality}_Qformer.bert.embeddings.position_embeddings.weight": lin(
            (cfg.max_position_embeddings, h)
        ),
        f"{modality}_Qformer.bert.embeddings.LayerNorm.weight": np.ones(h, np.float32),
        f"{modality}_Qformer.bert.embeddings.LayerNorm.bias": np.zeros(h, np.float32),
    }
    for i in range(cfg.num_layers):
        pre = f"{modality}_Qformer.bert.encoder.layer.{i}"
        for blk, kv_w in [("attention", h)] + (
            [("crossattention", encoder_width)] if i % cfg.cross_attention_freq == 0 else []
        ):
            sd[f"{pre}.{blk}.self.query.weight"] = lin((h, h))
            sd[f"{pre}.{blk}.self.query.bias"] = lin(h)
            sd[f"{pre}.{blk}.self.key.weight"] = lin((h, kv_w))
            sd[f"{pre}.{blk}.self.key.bias"] = lin(h)
            sd[f"{pre}.{blk}.self.value.weight"] = lin((h, kv_w))
            sd[f"{pre}.{blk}.self.value.bias"] = lin(h)
            sd[f"{pre}.{blk}.output.dense.weight"] = lin((h, h))
            sd[f"{pre}.{blk}.output.dense.bias"] = lin(h)
            sd[f"{pre}.{blk}.output.LayerNorm.weight"] = np.ones(h, np.float32)
            sd[f"{pre}.{blk}.output.LayerNorm.bias"] = np.zeros(h, np.float32)
        for stem in ("intermediate", "intermediate_query"):
            sd[f"{pre}.{stem}.dense.weight"] = lin((cfg.intermediate_size, h))
            sd[f"{pre}.{stem}.dense.bias"] = lin(cfg.intermediate_size)
        for stem in ("output", "output_query"):
            sd[f"{pre}.{stem}.dense.weight"] = lin((h, cfg.intermediate_size))
            sd[f"{pre}.{stem}.dense.bias"] = lin(h)
            sd[f"{pre}.{stem}.LayerNorm.weight"] = np.ones(h, np.float32)
            sd[f"{pre}.{stem}.LayerNorm.bias"] = np.zeros(h, np.float32)
    return sd


def test_qformer_bundle_converter_structure():
    model = XInstructBLIP(CFG, audio_cfg=tiny_data_config().audio)
    ref = model.init_params(jax.random.PRNGKey(0))
    sd = _synthetic_qformer_bundle_sd(CFG.qformer, "video", CFG.vit.width)
    out = convert_qformer_bundle(sd, CFG.qformer, "video")
    assert set(out) == {"video_qformer", "video_query_tokens", "video_ln", "video_proj"}
    assert _tree_spec(out["video_qformer"]) == _tree_spec(ref["video_qformer"])
    assert _tree_spec(out["video_proj"]) == _tree_spec(ref["video_proj"])
    assert _tree_spec(out["video_ln"]) == _tree_spec(ref["video_ln"])


def _hf_tiny_llama_config():
    from transformers import LlamaConfig as HFLlamaConfig

    c = CFG.llm
    return HFLlamaConfig(
        vocab_size=c.vocab_size,
        hidden_size=c.hidden_size,
        intermediate_size=c.intermediate_size,
        num_hidden_layers=c.num_layers,
        num_attention_heads=c.num_heads,
        num_key_value_heads=c.num_kv_heads,
        rms_norm_eps=c.rms_norm_eps,
        rope_theta=c.rope_theta,
        attention_bias=False,
        tie_word_embeddings=False,
    )


def test_llama_matches_hf_numerically():
    import torch
    from transformers import LlamaForCausalLM

    torch.manual_seed(0)
    hf = LlamaForCausalLM(_hf_tiny_llama_config()).eval()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}

    cfg = CFG.llm.replace(dtype="float32")
    ours = LlamaModel(cfg, None)
    params = {"params": convert_llama_hf(sd, cfg)}

    b, s = 2, 7
    rng = np.random.default_rng(0)
    embeds = rng.standard_normal((b, s, cfg.hidden_size)).astype(np.float32) * 0.02
    attn_mask = np.ones((b, s), np.int64)
    attn_mask[0, :2] = 0  # left padding on row 0

    with torch.no_grad():
        hf_out = hf(
            inputs_embeds=torch.from_numpy(embeds),
            attention_mask=torch.from_numpy(attn_mask),
        ).logits.numpy()

    positions = np.maximum(np.cumsum(attn_mask, axis=-1) - 1, 0)
    causal = np.tril(np.ones((s, s), bool))[None, None]
    mask = causal & attn_mask[:, None, None, :].astype(bool)
    logits, _ = ours.apply(
        params, jnp.asarray(embeds), jnp.asarray(mask), jnp.asarray(positions)
    )
    # compare only non-padded positions (HF computes garbage on pads)
    ours_np = np.asarray(logits)
    np.testing.assert_allclose(
        ours_np[0, 2:], hf_out[0, 2:], rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(ours_np[1], hf_out[1], rtol=2e-4, atol=2e-4)


def test_int8_quantization_roundtrip():
    cfg = CFG.llm
    rng = np.random.default_rng(0)
    tree = {
        "layer_0": {
            "attn": {"q_proj": {"kernel": rng.standard_normal((8, 8)).astype(np.float32)}}
        },
        "final_norm": {"scale": np.ones(8, np.float32)},
    }
    q = quantize_llama_int8(tree)
    assert q["layer_0"]["attn"]["q_proj"]["w_int8"].dtype == np.int8
    assert "scale" in q["layer_0"]["attn"]["q_proj"]
    assert "kernel" not in q["layer_0"]["attn"]["q_proj"]
    # dequantized error bounded by scale/2
    w = tree["layer_0"]["attn"]["q_proj"]["kernel"]
    deq = q["layer_0"]["attn"]["q_proj"]["w_int8"].astype(np.float32) * q["layer_0"]["attn"]["q_proj"]["scale"]
    assert np.abs(deq - w).max() <= np.abs(w).max() / 127 + 1e-6
    assert (q["final_norm"]["scale"] == 1).all()


def test_clip_vit_converter_structure_and_gqa_llama():
    """CLIP-HF vision tower mapping + GQA (Mistral-style) Llama conversion."""
    from mraudio_tpu.models.convert_weights import convert_clip_vit_hf

    cfg = CFG.vit
    rng = np.random.default_rng(3)
    d, p = cfg.width, cfg.patch_size
    sd = {
        "vision_model.embeddings.patch_embedding.weight":
            rng.standard_normal((d, 3, p, p)).astype(np.float32),
        "vision_model.embeddings.class_embedding":
            rng.standard_normal(d).astype(np.float32),
        "vision_model.embeddings.position_embedding.weight":
            rng.standard_normal((cfg.seq_len, d)).astype(np.float32),
    }
    for i in range(cfg.depth):
        pre = f"vision_model.encoder.layers.{i}"
        for ln in ("layer_norm1", "layer_norm2"):
            sd[f"{pre}.{ln}.weight"] = np.ones(d, np.float32)
            sd[f"{pre}.{ln}.bias"] = np.zeros(d, np.float32)
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            sd[f"{pre}.self_attn.{proj}.weight"] = rng.standard_normal((d, d)).astype(np.float32)
            sd[f"{pre}.self_attn.{proj}.bias"] = rng.standard_normal(d).astype(np.float32)
        sd[f"{pre}.mlp.fc1.weight"] = rng.standard_normal((cfg.mlp_dim, d)).astype(np.float32)
        sd[f"{pre}.mlp.fc1.bias"] = rng.standard_normal(cfg.mlp_dim).astype(np.float32)
        sd[f"{pre}.mlp.fc2.weight"] = rng.standard_normal((d, cfg.mlp_dim)).astype(np.float32)
        sd[f"{pre}.mlp.fc2.bias"] = rng.standard_normal(d).astype(np.float32)

    from mraudio_tpu.models.eva_vit import EvaViT

    ref = EvaViT(cfg).init(
        jax.random.PRNGKey(0), jnp.zeros((1, cfg.image_size, cfg.image_size, 3))
    )["params"]
    converted = convert_clip_vit_hf(sd, cfg)
    assert _tree_spec(converted) == _tree_spec(ref)

    # GQA decoder (num_kv_heads < num_heads) through the HF converter
    import torch
    from transformers import LlamaForCausalLM

    gqa = CFG.llm.replace(num_kv_heads=2, dtype="float32")
    torch.manual_seed(0)
    hf = LlamaForCausalLM(_hf_tiny_llama_config_gqa(gqa)).eval()
    sd2 = {k: v.numpy() for k, v in hf.state_dict().items()}
    params = {"params": convert_llama_hf(sd2, gqa)}
    ours = LlamaModel(gqa, None)
    b, s = 1, 5
    rng2 = np.random.default_rng(1)
    embeds = rng2.standard_normal((b, s, gqa.hidden_size)).astype(np.float32) * 0.02
    mask01 = np.ones((b, s), np.int64)
    with torch.no_grad():
        hf_logits = hf(inputs_embeds=torch.from_numpy(embeds)).logits.numpy()
    causal = np.tril(np.ones((s, s), bool))[None, None]
    logits, _ = ours.apply(
        params, jnp.asarray(embeds),
        jnp.asarray(causal & mask01[:, None, None, :].astype(bool)),
        jnp.asarray(np.maximum(np.cumsum(mask01, -1) - 1, 0)),
    )
    np.testing.assert_allclose(np.asarray(logits), hf_logits, rtol=3e-4, atol=3e-4)


def _hf_tiny_llama_config_gqa(cfg):
    from transformers import LlamaConfig as HFLlamaConfig

    return HFLlamaConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size, num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads, num_key_value_heads=cfg.num_kv_heads,
        rms_norm_eps=cfg.rms_norm_eps, rope_theta=cfg.rope_theta,
        attention_bias=False, tie_word_embeddings=False,
    )
