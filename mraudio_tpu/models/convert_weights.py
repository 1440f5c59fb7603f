"""PyTorch → JAX weight converters for the five upstream checkpoints.

The reference assembles its model from heterogeneous checkpoints with
key-routing surgery (``models/xinstructblip.py:614-655`` Q-Formers,
``:694-704`` layer norms, ``:706-735`` projections, ``:769-816`` general
routing; EVA-ViT and BEATs load inside LAVIS; Vicuna comes from HF).
These converters reproduce that routing against our parameter tree:

========================  =============================================
checkpoint                converter
========================  =============================================
EVA-ViT-g ``.pth``        :func:`convert_eva_vit`
BEATs iter3+ ``.pt``      :func:`convert_beats`
video/audio Q-Former      :func:`convert_qformer_bundle` (Q-Former +
``*_qformer.pth``         query tokens + modality LN + LLM projection,
                          filtered by the ``{modality}_`` prefixes)
BLIP-2 stage-1 ``.pth``   :func:`convert_qformer_bundle` (fallback keys)
Vicuna-7B HF weights      :func:`convert_llama_hf`
========================  =============================================

All converters take a flat ``{torch_name: np.ndarray}`` dict (use
:func:`load_torch_state_dict`) and return the nested JAX param subtree.
Linear weights transpose (out,in)→(in,out); attention projections
reshape to DenseGeneral's (in, heads, head_dim) layout.
"""

from __future__ import annotations

import logging

import numpy as np

logger = logging.getLogger("mraudio_tpu")


def load_torch_state_dict(path: str) -> dict:
    """Load a torch checkpoint into {name: np.ndarray} without CUDA."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "model" in ckpt:
        ckpt = ckpt["model"]
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v) for k, v in ckpt.items()}


def _lin(sd, name):
    """(out,in) torch Linear → (in,out) kernel + bias."""
    out = {"kernel": sd[f"{name}.weight"].T}
    if f"{name}.bias" in sd:
        out["bias"] = sd[f"{name}.bias"]
    return out


def _heads(w, num_heads):
    """(out,in) → (in, heads, head_dim) for DenseGeneral q/k/v."""
    out_dim, in_dim = w.shape
    return w.T.reshape(in_dim, num_heads, out_dim // num_heads)


def _heads_bias(b, num_heads):
    return b.reshape(num_heads, -1)


def _ln(sd, name):
    return {"scale": sd[f"{name}.weight"], "bias": sd[f"{name}.bias"]}


# ---------------------------------------------------------------------------
# EVA-ViT-g
# ---------------------------------------------------------------------------


def convert_eva_vit(sd: dict, cfg) -> dict:
    """LAVIS ``eva_vit`` checkpoint → :class:`EvaViT` params.

    EVA quirks handled: fused ``attn.qkv.weight`` split in thirds; no key
    bias (``attn.q_bias``/``attn.v_bias`` only — k bias set to zeros);
    conv patch embed flattened to our (py, px, c) patch-vector order.
    """
    p = cfg.patch_size
    width = cfg.width
    heads = cfg.num_heads

    conv = sd["patch_embed.proj.weight"]  # (D, 3, p, p)
    kernel = conv.transpose(2, 3, 1, 0).reshape(p * p * 3, width)
    params = {
        "patch_embed": {"kernel": kernel, "bias": sd["patch_embed.proj.bias"]},
        "cls_token": sd["cls_token"],
        "pos_embed": sd["pos_embed"],
    }

    for i in range(cfg.depth):
        pre = f"blocks.{i}"
        qkv = sd[f"{pre}.attn.qkv.weight"]  # (3D, D)
        qw, kw, vw = np.split(qkv, 3, axis=0)
        q_bias = sd.get(f"{pre}.attn.q_bias", np.zeros(width, qkv.dtype))
        v_bias = sd.get(f"{pre}.attn.v_bias", np.zeros(width, qkv.dtype))
        params[f"block_{i}"] = {
            "norm1": {"LayerNorm_0": _ln(sd, f"{pre}.norm1")},
            "norm2": {"LayerNorm_0": _ln(sd, f"{pre}.norm2")},
            "attn": {
                "q": {"kernel": _heads(qw, heads), "bias": _heads_bias(q_bias, heads)},
                "k": {"kernel": _heads(kw, heads), "bias": _heads_bias(np.zeros(width, qkv.dtype), heads)},
                "v": {"kernel": _heads(vw, heads), "bias": _heads_bias(v_bias, heads)},
                "out": {
                    "kernel": sd[f"{pre}.attn.proj.weight"].T.reshape(heads, width // heads, width),
                    "bias": sd[f"{pre}.attn.proj.bias"],
                },
            },
            "mlp": {
                "fc1": _lin(sd, f"{pre}.mlp.fc1"),
                "fc2": _lin(sd, f"{pre}.mlp.fc2"),
            },
        }
    return params


# ---------------------------------------------------------------------------
# Q-Former bundle (Q-Former + query tokens + LN + projection per modality)
# ---------------------------------------------------------------------------


def convert_qformer(sd: dict, cfg, prefix: str = "") -> dict:
    """BLIP-2 ``BertLMHeadModel`` weights → :class:`QFormer` params.

    ``sd`` keys are relative to the Q-Former root (``bert.…``), i.e.
    already stripped of the ``{modality}_Qformer.`` routing prefix the
    reference removes at ``models/xinstructblip.py:642-651``.
    """
    g = lambda name: sd[f"{prefix}{name}"]
    heads = cfg.num_heads

    params = {
        "word_embeddings": {"embedding": g("bert.embeddings.word_embeddings.weight")},
        "position_embeddings": g("bert.embeddings.position_embeddings.weight"),
        "embeddings_norm": {
            "LayerNorm_0": {
                "scale": g("bert.embeddings.LayerNorm.weight"),
                "bias": g("bert.embeddings.LayerNorm.bias"),
            }
        },
    }

    def attn(pre, kv_pre=None):
        kv_pre = kv_pre or pre
        return {
            "q": {
                "kernel": _heads(g(f"{pre}.self.query.weight"), heads),
                "bias": _heads_bias(g(f"{pre}.self.query.bias"), heads),
            },
            "k": {
                "kernel": _heads(g(f"{kv_pre}.self.key.weight"), heads),
                "bias": _heads_bias(g(f"{kv_pre}.self.key.bias"), heads),
            },
            "v": {
                "kernel": _heads(g(f"{kv_pre}.self.value.weight"), heads),
                "bias": _heads_bias(g(f"{kv_pre}.self.value.bias"), heads),
            },
            "out": {
                "kernel": g(f"{pre}.output.dense.weight").T.reshape(
                    heads, cfg.hidden_size // heads, cfg.hidden_size
                ),
                "bias": g(f"{pre}.output.dense.bias"),
            },
        }

    def ln_of(name):
        return {
            "LayerNorm_0": {
                "scale": g(f"{name}.weight"),
                "bias": g(f"{name}.bias"),
            }
        }

    for i in range(cfg.num_layers):
        pre = f"bert.encoder.layer.{i}"
        layer = {
            "self_attn": attn(f"{pre}.attention"),
            "self_norm": ln_of(f"{pre}.attention.output.LayerNorm"),
            "mlp_query": {
                "fc1": _lin(sd, f"{prefix}{pre}.intermediate_query.dense"),
                "fc2": _lin(sd, f"{prefix}{pre}.output_query.dense"),
            },
            "ffn_norm_query": ln_of(f"{pre}.output_query.LayerNorm"),
            "mlp_text": {
                "fc1": _lin(sd, f"{prefix}{pre}.intermediate.dense"),
                "fc2": _lin(sd, f"{prefix}{pre}.output.dense"),
            },
            "ffn_norm_text": ln_of(f"{pre}.output.LayerNorm"),
        }
        if i % cfg.cross_attention_freq == 0:
            layer["cross_attn"] = attn(f"{pre}.crossattention")
            layer["cross_norm"] = ln_of(f"{pre}.crossattention.output.LayerNorm")
        params[f"layer_{i}"] = layer
    return params


def convert_qformer_bundle(sd: dict, cfg, modality: str) -> dict:
    """Route a ``{modality}_*`` checkpoint (video_qformer.pth etc.) into
    the assembly's four per-modality subtrees, reproducing the prefix
    filtering of ``init_Qformer``/``init_ln``/``init_vicuna_projection``."""
    qf_prefix = f"{modality}_Qformer."
    qf_sd = {k[len(qf_prefix):]: v for k, v in sd.items() if k.startswith(qf_prefix)}
    out = {}
    if qf_sd:
        out[f"{modality}_qformer"] = convert_qformer(qf_sd, cfg)
    if f"{modality}_query_tokens" in sd:
        out[f"{modality}_query_tokens"] = sd[f"{modality}_query_tokens"]
    # LN routing: "{modality}_ln", with the video branch also accepting
    # "ln_vision" — the reference maps load_ln_type "vision" to that name
    # (models/xinstructblip.py:694-696), and the Salesforce video bundle
    # stores its LN under it.
    ln_key = f"{modality}_ln"
    if f"{ln_key}.weight" not in sd and modality == "video" and "ln_vision.weight" in sd:
        ln_key = "ln_vision"
    if f"{ln_key}.weight" in sd:
        out[f"{modality}_ln"] = {
            "ln": {
                "LayerNorm_0": {
                    "scale": sd[f"{ln_key}.weight"],
                    "bias": sd[f"{ln_key}.bias"],
                }
            }
        }
    proj_key = f"{modality}_llm_proj"
    if f"{proj_key}.weight" in sd:
        out[f"{modality}_proj"] = {
            "proj": {
                "kernel": sd[f"{proj_key}.weight"].T,
                "bias": sd[f"{proj_key}.bias"],
            }
        }
    return out


# ---------------------------------------------------------------------------
# Llama / Vicuna (HF layout)
# ---------------------------------------------------------------------------


def convert_llama_hf(sd: dict, cfg) -> dict:
    """HF llama-family causal-LM state dict → :class:`LlamaModel` params.
    Rows beyond the checkpoint vocab (the appended [PAD]) are zero-init,
    matching ``resize_token_embeddings`` (``models/xinstructblip.py:154``).

    Covers the whole llama-layout family: Llama/Vicuna, Mistral (same
    keys, GQA via ``cfg.num_kv_heads``), and Qwen2 (adds q/k/v biases —
    requires ``cfg.attention_bias=True``; that plus rope_theta/dims is
    the VideoLLaMA2.1 decoder).  Tied-embedding checkpoints (no
    ``lm_head.weight``) reuse the embedding matrix, matching HF
    ``tie_word_embeddings``."""
    has_bias = f"model.layers.0.self_attn.q_proj.bias" in sd
    if has_bias and not cfg.attention_bias:
        raise ValueError(
            "checkpoint carries q/k/v biases (Qwen2 flavor) but "
            "cfg.attention_bias is False — set LlamaConfig.attention_bias"
        )
    if cfg.attention_bias and not has_bias:
        raise ValueError(
            "cfg.attention_bias=True but the checkpoint has no q/k/v "
            "biases — wrong decoder flavor for this checkpoint"
        )

    def pad_vocab(w, axis=0):
        # pad to padded_vocab_size (= vocab_size + the sharding-alignment
        # rows of cfg.vocab_pad_multiple; logits() masks the pad columns)
        if w.shape[axis] < cfg.padded_vocab_size:
            pad = [(0, 0)] * w.ndim
            pad[axis] = (0, cfg.padded_vocab_size - w.shape[axis])
            w = np.pad(w, pad)
        return w

    head_w = sd.get("lm_head.weight", sd["model.embed_tokens.weight"])
    params = {
        "embed_tokens": {"embedding": pad_vocab(sd["model.embed_tokens.weight"])},
        "final_norm": {"scale": sd["model.norm.weight"]},
        "lm_head": {"kernel": pad_vocab(head_w, axis=0).T},
    }

    def proj(pre, name):
        out = {"kernel": sd[f"{pre}.self_attn.{name}.weight"].T}
        bkey = f"{pre}.self_attn.{name}.bias"
        if bkey in sd:
            out["bias"] = sd[bkey]
        return out

    for i in range(cfg.num_layers):
        pre = f"model.layers.{i}"
        params[f"layer_{i}"] = {
            "input_norm": {"scale": sd[f"{pre}.input_layernorm.weight"]},
            "post_attn_norm": {"scale": sd[f"{pre}.post_attention_layernorm.weight"]},
            "attn": {
                "q_proj": proj(pre, "q_proj"),
                "k_proj": proj(pre, "k_proj"),
                "v_proj": proj(pre, "v_proj"),
                "o_proj": proj(pre, "o_proj"),
            },
            "mlp": {
                "gate_proj": {"kernel": sd[f"{pre}.mlp.gate_proj.weight"].T},
                "up_proj": {"kernel": sd[f"{pre}.mlp.up_proj.weight"].T},
                "down_proj": {"kernel": sd[f"{pre}.mlp.down_proj.weight"].T},
            },
        }
    return params


# Qwen2 is llama-layout plus q/k/v biases; the same converter handles it
# (cfg.attention_bias selects the flavor).
convert_qwen2_hf = convert_llama_hf


def quantize_llama_int8(params: dict) -> dict:
    """Float param tree → int8 per-output-channel weights + scales (the
    TPU counterpart of ``load_in_8bit``).  LoRA/norm/embedding params
    pass through; ``lm_head`` stays float, matching HF's
    ``get_keys_to_not_convert`` under ``load_in_8bit`` (reference
    ``models/xinstructblip.py:151``)."""
    import jax

    def visit(path, leaf):
        names = [str(getattr(p, "key", p)) for p in path]
        if "lm_head" in names:
            return leaf
        if names[-1] == "kernel" and any(n.endswith("_proj") for n in names):
            scale = np.abs(leaf).max(axis=0) / 127.0
            scale = np.where(scale == 0, 1.0, scale)
            return {"w_int8": np.round(leaf / scale).astype(np.int8),
                    "scale": scale.astype(np.float32)}
        return leaf

    flat = jax.tree_util.tree_map_with_path(visit, params)

    # splice the {w_int8, scale} dicts in place of kernels
    def fix(tree):
        if isinstance(tree, dict):
            out = {}
            for k, v in tree.items():
                if isinstance(v, dict) and set(v) == {"w_int8", "scale"} and k == "kernel":
                    out["w_int8"] = v["w_int8"]
                    out["scale"] = v["scale"]
                else:
                    out[k] = fix(v)
            return out
        return tree

    return fix(flat)


def quantize_llama_int4(params: dict, group_size: int = 128) -> dict:
    """Float param tree → group-wise int4 weights + per-(group, out)
    fp32 scales (``LlamaConfig.quantization="int4"``).  Symmetric absmax
    per group along the input dim (the AWQ/GPTQ grouping convention);
    values pack two nibbles per uint8 byte pairing group-halves (byte j
    holds element j in the low nibble and element j+g/2 in the high —
    ``LlamaLinear`` contracts each nibble plane separately on device so
    the unpack never materializes).
    LoRA/norm/embedding params pass through and ``lm_head`` stays float
    like the int8 path."""
    import jax
    import jax.numpy as jnp

    def visit(path, leaf):
        names = [str(getattr(p, "key", p)) for p in path]
        if "lm_head" in names:
            return leaf
        if names[-1] == "kernel" and any(n.endswith("_proj") for n in names):
            inf, outf = leaf.shape
            if inf % group_size:
                raise ValueError(
                    f"group_size={group_size} must divide in_features={inf}"
                )
            grouped = np.asarray(leaf, np.float32).reshape(
                inf // group_size, group_size, outf
            )
            scale = np.abs(grouped).max(axis=1) / 7.0
            scale = np.where(scale == 0, 1.0, scale)
            q = np.clip(np.round(grouped / scale[:, None, :]), -8, 7)
            qi = q.astype(np.int32) & 0xF
            half = group_size // 2
            packed = (qi[:, :half, :] | (qi[:, half:, :] << 4)).astype(np.uint8)
            return {
                "w_int4": jnp.asarray(packed),
                "w_int4_scale": scale.astype(np.float32),
            }
        return leaf

    flat = jax.tree_util.tree_map_with_path(visit, params)

    def fix(tree):
        if isinstance(tree, dict):
            out = {}
            for k, v in tree.items():
                if (isinstance(v, dict)
                        and set(v) == {"w_int4", "w_int4_scale"}
                        and k == "kernel"):
                    out.update(v)
                else:
                    out[k] = fix(v)
            return out
        return tree

    return fix(flat)


# ---------------------------------------------------------------------------
# BEATs
# ---------------------------------------------------------------------------


def convert_beats(sd: dict, cfg) -> dict:
    """BEATs iter3+ checkpoint → :class:`BeatsEncoder` params.

    BEATs keeps one shared relative-attention-bias table on layer 0
    (reused by every layer) and per-layer ``grep_linear`` (head_dim→8)
    + ``grep_a`` gate parameters — all mapped exactly."""
    heads = cfg.num_heads
    width = cfg.width
    p = cfg.patch_size

    conv = sd["patch_embedding.weight"]  # (conv_dim, 1, p, p)
    kernel = conv[:, 0].transpose(1, 2, 0).reshape(p * p, cfg.conv_dim)
    params: dict = {
        "patch_embed": {"kernel": kernel},
        "patch_norm": {"LayerNorm_0": _ln(sd, "layer_norm")},
    }
    if "patch_embedding.bias" in sd:
        params["patch_embed"]["bias"] = sd["patch_embedding.bias"]
    else:
        params["patch_embed"]["bias"] = np.zeros(cfg.conv_dim, np.float32)
    if cfg.conv_dim != width and "post_extract_proj.weight" in sd:
        params["post_extract_proj"] = _lin(sd, "post_extract_proj")

    if "encoder.pos_conv.0.weight_v" in sd:
        # The real BEATs checkpoint stores the pos conv weight-normed
        # (torch.nn.utils.weight_norm, dim=2): weight = g * v / ||v||
        # with the norm over dims (0, 1) per kernel position.
        g = sd["encoder.pos_conv.0.weight_g"]
        v = sd["encoder.pos_conv.0.weight_v"]
        norm = np.sqrt((v ** 2).sum(axis=(0, 1), keepdims=True))
        w = g * v / np.maximum(norm, 1e-12)
    elif "encoder.pos_conv.0.weight" in sd:
        w = sd["encoder.pos_conv.0.weight"]
    else:
        w = None
    if w is not None:
        # torch conv1d weight (out, in/groups, k) → flax (k, in/groups, out)
        params["pos_conv"] = {
            "kernel": w.transpose(2, 1, 0),
            "bias": sd.get("encoder.pos_conv.0.bias", np.zeros(width, np.float32)),
        }
    if "encoder.layer_norm.weight" in sd:
        params["pre_encoder_norm"] = {"LayerNorm_0": _ln(sd, "encoder.layer_norm")}

    bias_key = "encoder.layers.0.self_attn.relative_attention_bias.weight"
    if bias_key in sd:
        params["rel_pos_bias"] = {"rel_attn_bias": sd[bias_key]}
    for i in range(cfg.depth):
        gate_key = f"encoder.layers.{i}.self_attn.grep_linear.weight"
        if gate_key in sd:
            # grep_linear: torch Linear(head_dim, 8); grep_a: (1, H, 1, 1)
            gw = sd[gate_key]
            params[f"gate_{i}"] = {
                "grep_linear": {
                    "kernel": gw.T,
                    "bias": sd.get(
                        f"encoder.layers.{i}.self_attn.grep_linear.bias",
                        np.zeros(8, np.float32),
                    ),
                },
                "grep_a": sd.get(
                    f"encoder.layers.{i}.self_attn.grep_a",
                    np.ones((1, cfg.num_heads, 1, 1), np.float32),
                ).reshape(cfg.num_heads),
            }

    for i in range(cfg.depth):
        pre = f"encoder.layers.{i}"
        params[f"block_{i}"] = {
            "attn": {
                "q": {
                    "kernel": _heads(sd[f"{pre}.self_attn.q_proj.weight"], heads),
                    "bias": _heads_bias(sd[f"{pre}.self_attn.q_proj.bias"], heads),
                },
                "k": {
                    "kernel": _heads(sd[f"{pre}.self_attn.k_proj.weight"], heads),
                    "bias": _heads_bias(
                        sd.get(f"{pre}.self_attn.k_proj.bias", np.zeros(width, np.float32)),
                        heads,
                    ),
                },
                "v": {
                    "kernel": _heads(sd[f"{pre}.self_attn.v_proj.weight"], heads),
                    "bias": _heads_bias(sd[f"{pre}.self_attn.v_proj.bias"], heads),
                },
                "out": {
                    "kernel": sd[f"{pre}.self_attn.out_proj.weight"].T.reshape(
                        heads, width // heads, width
                    ),
                    "bias": sd[f"{pre}.self_attn.out_proj.bias"],
                },
            },
            "norm1": {"LayerNorm_0": _ln(sd, f"{pre}.self_attn_layer_norm")},
            "mlp": {
                "fc1": _lin(sd, f"{pre}.fc1"),
                "fc2": _lin(sd, f"{pre}.fc2"),
            },
            "norm2": {"LayerNorm_0": _ln(sd, f"{pre}.final_layer_norm")},
        }
    return params


# ---------------------------------------------------------------------------
# Top-level loader
# ---------------------------------------------------------------------------


def stack_llm_layers(llm: dict, num_layers: int) -> dict:
    """``layer_i`` subtrees → one ``layers`` subtree with leaves stacked
    along a new leading (num_layers,) axis — the ``cfg.scan_layers``
    param layout (one nn.scan body over the stack)."""
    import jax

    out = {k: v for k, v in llm.items() if not k.startswith("layer_")}
    layers = [llm[f"layer_{i}"] for i in range(num_layers)]
    out["layers"] = jax.tree_util.tree_map(
        lambda *xs: np.stack([np.asarray(x) for x in xs]), *layers
    )
    return out


def load_pretrained_params(model, cfg) -> dict:
    """Random-init the assembly, then overlay every converted checkpoint
    whose path is configured (empty paths stay random — weight-free smoke
    mode).  Mirrors the reference's load order: per-modality bundles,
    then BLIP-2 stage-1 fallback, then the LLM.

    For the VideoLLaMA backbone, ``cfg.llm_weights`` names the single
    merged VideoLLaMA2-AV checkpoint (the reference's ``--model-path`` →
    ``model_init(path)``, ``models/videollama.py:5-6``); ``beats_weights``
    may still overlay a standalone audio tower."""
    import jax

    params = model.init_params(jax.random.PRNGKey(cfg.train.seed))

    def overlay(dst: dict, src: dict):
        for k, v in src.items():
            if isinstance(v, dict) and isinstance(dst.get(k), dict):
                overlay(dst[k], v)
            else:
                dst[k] = np.asarray(v)

    from mraudio_tpu.models.videollama import VideoLLaMA

    if isinstance(model, VideoLLaMA):
        if cfg.llm_weights:
            sd = load_torch_state_dict(cfg.llm_weights)
            converted = convert_videollama(sd, model.cfg)
            if model.cfg.llm.quantization == "int8" and "llm" in converted:
                converted["llm"] = quantize_llama_int8(converted["llm"])
            elif model.cfg.llm.quantization == "int4" and "llm" in converted:
                converted["llm"] = quantize_llama_int4(
                    converted["llm"], model.cfg.llm.int4_group_size
                )
            if model.cfg.llm.scan_layers and "llm" in converted:
                converted["llm"] = stack_llm_layers(
                    converted["llm"], model.cfg.llm.num_layers
                )
            overlay(params, converted)
            logger.info("loaded VideoLLaMA checkpoint from %s", cfg.llm_weights)
        if cfg.beats_weights:
            sd = load_torch_state_dict(cfg.beats_weights)
            overlay(params["beats"], convert_beats(sd, model.cfg.beats))
            logger.info("loaded BEATs weights from %s", cfg.beats_weights)
        return params

    for modality, path in (
        ("video", cfg.video_qformer_weights),
        ("audio", cfg.audio_qformer_weights),
    ):
        if path:
            sd = load_torch_state_dict(path)
            overlay(params, convert_qformer_bundle(sd, cfg.model.qformer, modality))
            logger.info("loaded %s Q-Former bundle from %s", modality, path)
    if cfg.blip2_stage1_weights:
        sd = load_torch_state_dict(cfg.blip2_stage1_weights)
        for modality in cfg.model.modalities:
            overlay(params, convert_qformer_bundle(sd, cfg.model.qformer, modality))
        logger.info("loaded BLIP-2 stage-1 weights from %s", cfg.blip2_stage1_weights)
    if cfg.vit_weights:
        sd = load_torch_state_dict(cfg.vit_weights)
        params["vit"] = convert_eva_vit(sd, cfg.model.vit)
        logger.info("loaded EVA-ViT weights from %s", cfg.vit_weights)
    if cfg.beats_weights:
        sd = load_torch_state_dict(cfg.beats_weights)
        overlay(params["beats"], convert_beats(sd, cfg.model.beats))
        logger.info("loaded BEATs weights from %s", cfg.beats_weights)
    if cfg.llm_weights:
        sd = load_torch_state_dict(cfg.llm_weights)
        llm = convert_llama_hf(sd, cfg.model.llm)
        if cfg.model.llm.quantization == "int8":
            llm = quantize_llama_int8(llm)
        elif cfg.model.llm.quantization == "int4":
            llm = quantize_llama_int4(llm, cfg.model.llm.int4_group_size)
        if cfg.model.llm.scan_layers:
            llm = stack_llm_layers(llm, cfg.model.llm.num_layers)
        overlay(params["llm"], llm)
        logger.info("loaded LLM weights from %s", cfg.llm_weights)
    return params


# ---------------------------------------------------------------------------
# CLIP ViT (HF layout) — VideoLLaMA2-style vision towers
# ---------------------------------------------------------------------------


def convert_clip_vit_hf(sd: dict, cfg, prefix: str = "vision_model.") -> dict:
    """HF ``CLIPVisionModel`` weights → :class:`EvaViT` params.

    VideoLLaMA2-class models use a CLIP/SigLIP vision tower; its HF
    layout (separate q/k/v with biases, pre-LN blocks, class embedding +
    learned positions) maps 1:1 onto our ViT module.  The final
    ``post_layernorm`` is intentionally dropped — like the reference's
    EVA path, normalization happens in the consumer."""
    g = lambda name: sd[f"{prefix}{name}"]
    heads = cfg.num_heads
    width = cfg.width
    p = cfg.patch_size

    conv = g("embeddings.patch_embedding.weight")  # (D, 3, p, p)
    params = {
        "patch_embed": {
            "kernel": conv.transpose(2, 3, 1, 0).reshape(p * p * 3, width),
            "bias": sd.get(f"{prefix}embeddings.patch_embedding.bias",
                           np.zeros(width, np.float32)),
        },
        "cls_token": g("embeddings.class_embedding").reshape(1, 1, width),
        "pos_embed": g("embeddings.position_embedding.weight")[None],
    }
    for i in range(cfg.depth):
        pre = f"encoder.layers.{i}"
        params[f"block_{i}"] = {
            "norm1": {"LayerNorm_0": {
                "scale": g(f"{pre}.layer_norm1.weight"),
                "bias": g(f"{pre}.layer_norm1.bias"),
            }},
            "norm2": {"LayerNorm_0": {
                "scale": g(f"{pre}.layer_norm2.weight"),
                "bias": g(f"{pre}.layer_norm2.bias"),
            }},
            "attn": {
                "q": {"kernel": _heads(g(f"{pre}.self_attn.q_proj.weight"), heads),
                      "bias": _heads_bias(g(f"{pre}.self_attn.q_proj.bias"), heads)},
                "k": {"kernel": _heads(g(f"{pre}.self_attn.k_proj.weight"), heads),
                      "bias": _heads_bias(g(f"{pre}.self_attn.k_proj.bias"), heads)},
                "v": {"kernel": _heads(g(f"{pre}.self_attn.v_proj.weight"), heads),
                      "bias": _heads_bias(g(f"{pre}.self_attn.v_proj.bias"), heads)},
                "out": {
                    "kernel": g(f"{pre}.self_attn.out_proj.weight").T.reshape(
                        heads, width // heads, width
                    ),
                    "bias": g(f"{pre}.self_attn.out_proj.bias"),
                },
            },
            "mlp": {
                "fc1": {"kernel": g(f"{pre}.mlp.fc1.weight").T,
                        "bias": g(f"{pre}.mlp.fc1.bias")},
                "fc2": {"kernel": g(f"{pre}.mlp.fc2.weight").T,
                        "bias": g(f"{pre}.mlp.fc2.bias")},
            },
        }
    return params


def convert_siglip_vit_hf(sd: dict, cfg, prefix: str = "vision_model.") -> dict:
    """HF ``SiglipVisionModel`` weights → :class:`EvaViT` params.

    The VideoLLaMA2.1 vision tower (``requirements_videoLLaMA.txt:1`` —
    the audio_visual branch builds SigLIP-so400m at 384²).  SigLIP's
    layout is CLIP-like but with NO class embedding (config:
    ``use_class_token=False``), gelu_pytorch_tanh MLPs (config:
    ``mlp_act="gelu_tanh"``), and position embeddings covering patch
    tokens only.  The final ``post_layernorm`` and the attention-pooling
    ``head`` are dropped, like the CLIP converter: VideoLLaMA2's tower
    consumes encoder hidden states, and normalization happens in the
    consumer."""
    if getattr(cfg, "use_class_token", True):
        raise ValueError(
            "SigLIP towers have no class token — build the ViTConfig with "
            "use_class_token=False (see videollama21_av_config)"
        )
    g = lambda name: sd[f"{prefix}{name}"]
    heads = cfg.num_heads
    width = cfg.width
    p = cfg.patch_size

    conv = g("embeddings.patch_embedding.weight")  # (D, 3, p, p)
    params = {
        "patch_embed": {
            "kernel": conv.transpose(2, 3, 1, 0).reshape(p * p * 3, width),
            "bias": g("embeddings.patch_embedding.bias"),
        },
        "pos_embed": g("embeddings.position_embedding.weight")[None],
    }
    for i in range(cfg.depth):
        pre = f"encoder.layers.{i}"
        params[f"block_{i}"] = {
            "norm1": {"LayerNorm_0": {
                "scale": g(f"{pre}.layer_norm1.weight"),
                "bias": g(f"{pre}.layer_norm1.bias"),
            }},
            "norm2": {"LayerNorm_0": {
                "scale": g(f"{pre}.layer_norm2.weight"),
                "bias": g(f"{pre}.layer_norm2.bias"),
            }},
            "attn": {
                "q": {"kernel": _heads(g(f"{pre}.self_attn.q_proj.weight"), heads),
                      "bias": _heads_bias(g(f"{pre}.self_attn.q_proj.bias"), heads)},
                "k": {"kernel": _heads(g(f"{pre}.self_attn.k_proj.weight"), heads),
                      "bias": _heads_bias(g(f"{pre}.self_attn.k_proj.bias"), heads)},
                "v": {"kernel": _heads(g(f"{pre}.self_attn.v_proj.weight"), heads),
                      "bias": _heads_bias(g(f"{pre}.self_attn.v_proj.bias"), heads)},
                "out": {
                    "kernel": g(f"{pre}.self_attn.out_proj.weight").T.reshape(
                        heads, width // heads, width
                    ),
                    "bias": g(f"{pre}.self_attn.out_proj.bias"),
                },
            },
            "mlp": {
                "fc1": {"kernel": g(f"{pre}.mlp.fc1.weight").T,
                        "bias": g(f"{pre}.mlp.fc1.bias")},
                "fc2": {"kernel": g(f"{pre}.mlp.fc2.weight").T,
                        "bias": g(f"{pre}.mlp.fc2.bias")},
            },
        }
    return params


# ---------------------------------------------------------------------------
# VideoLLaMA2-AV (single merged checkpoint)
# ---------------------------------------------------------------------------


def convert_videollama(sd: dict, cfg) -> dict:
    """VideoLLaMA2-AV-style merged checkpoint → :class:`VideoLLaMA` params.

    The reference binds VideoLLaMA2 as a black box (``model_init(path)``,
    ``models/videollama.py:5-6``); the checkpoint that path names is one
    state dict holding four components, keyed:

    * ``model.vision_tower.vision_tower.vision_model.*`` — HF CLIP-layout
      vision tower → :func:`convert_clip_vit_hf`;
    * ``model.mm_projector.readout.{0,2}.*`` — the STC connector's readout
      MLP → ``connector.proj_in/proj_out`` (the conv downsampling blocks
      have no counterpart in our pooling connector and are dropped with a
      log line — docs/DIVERGENCES.md);
    * ``model.audio_tower.*`` — BEATs-layout audio tower →
      :func:`convert_beats`;
    * ``model.mm_projector_a.{readout.}{0,2}.*`` — audio projector MLP →
      ``audio_proj.fc1/fc2``;
    * ``model.embed_tokens/layers/norm`` + ``lm_head`` — HF llama-layout
      LLM → :func:`convert_llama_hf`: llama/vicuna/mistral, and Qwen2
      (q/k/v biases; requires ``cfg.llm.attention_bias`` — the
      VideoLLaMA2.1 decoder flavor).

    The vision tower routes by layout: a ``class_embedding`` key means a
    CLIP tower (:func:`convert_clip_vit_hf`), its absence a SigLIP tower
    (:func:`convert_siglip_vit_hf`, VideoLLaMA2.1) — so the 2.1-AV
    checkpoint is config-only (``videollama21_av_config``).
    """
    params: dict = {}

    vision_prefix = "model.vision_tower.vision_tower.vision_model."
    if any(k.startswith(vision_prefix) for k in sd):
        if f"{vision_prefix}embeddings.class_embedding" in sd:
            params["vit"] = convert_clip_vit_hf(sd, cfg.vit, prefix=vision_prefix)
        else:
            params["vit"] = convert_siglip_vit_hf(
                sd, cfg.vit, prefix=vision_prefix
            )

    audio_prefix = "model.audio_tower."
    audio_sd = {k[len(audio_prefix):]: v for k, v in sd.items() if k.startswith(audio_prefix)}
    if audio_sd:
        params["beats"] = convert_beats(audio_sd, cfg.beats)

    def mlp_pair(prefix, names):
        for base in (f"{prefix}readout.", prefix):
            if f"{base}0.weight" in sd:
                return {
                    names[0]: _lin(sd, f"{base}0"),
                    names[1]: _lin(sd, f"{base}2"),
                }
        return None

    connector = mlp_pair("model.mm_projector.", ("proj_in", "proj_out"))
    if connector:
        params["connector"] = connector
        dropped = [
            k for k in sd
            if k.startswith("model.mm_projector.") and ".readout." not in k
        ]
        if dropped:
            logger.info(
                "convert_videollama: dropped %d mm_projector conv/downsample "
                "keys (pooling connector has no counterpart)", len(dropped),
            )
    audio_proj = mlp_pair("model.mm_projector_a.", ("fc1", "fc2"))
    if audio_proj:
        params["audio_proj"] = audio_proj

    if "model.embed_tokens.weight" in sd:
        params["llm"] = convert_llama_hf(sd, cfg.llm)
    return params
