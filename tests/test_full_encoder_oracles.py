"""FULL-forward torch oracles for the EVA-ViT and BEATs converter paths.

Round-2 review: the QFormer and CLIP-ViT stacks had whole-forward torch
oracles, but the EVA-specific converter quirks (fused qkv split,
q/v-bias-only with zero k bias — ``convert_weights.py::convert_eva_vit``)
and the full BEATs stack (conv patch embed → LN → projection → weight-
normed positional conv → gated-relative-bias transformer) were verified
only structurally.  These tests drive fabricated torch checkpoints
through the converters and require fp32 allclose on whole-model outputs,
so only the literal checkpoint bytes remain environment-blocked.

Oracles:
* EVA: a minimal torch module implementing the EVA block math the LAVIS
  ``eva_vit`` checkpoint format implies (fused ``attn.qkv.weight`` with
  separate ``q_bias``/``v_bias`` and NO k bias; pre-LN; conv patch embed;
  cls + learned positions; no final norm) — reference binding
  ``/root/reference/models/xinstructblip.py:658-666``.
* BEATs: HF ``WavLMEncoder`` — the architecture BEATs' encoder is built
  from (post-norm layers, shared T5-bucketed relative bias on layer 0,
  ``gru_rel_pos`` gating on the layer input, weight-normed positional
  conv with even-kernel SamePad trim) — plus a torch front end for the
  fbank patch embedding.  Reference binding
  ``/root/reference/models/xinstructblip.py:670-676``.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from mraudio_tpu.config import BeatsConfig, ViTConfig


def _np_sd(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


# ---------------------------------------------------------------------------
# EVA-ViT
# ---------------------------------------------------------------------------


class _TorchEvaAttention(torch.nn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.heads = heads
        self.scale = (dim // heads) ** -0.5
        self.qkv = torch.nn.Linear(dim, dim * 3, bias=False)
        self.q_bias = torch.nn.Parameter(torch.randn(dim) * 0.02)
        self.v_bias = torch.nn.Parameter(torch.randn(dim) * 0.02)
        self.proj = torch.nn.Linear(dim, dim)

    def forward(self, x):
        b, n, d = x.shape
        bias = torch.cat(
            (self.q_bias, torch.zeros_like(self.q_bias), self.v_bias)
        )
        qkv = torch.nn.functional.linear(x, self.qkv.weight, bias)
        qkv = qkv.reshape(b, n, 3, self.heads, d // self.heads).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q * self.scale) @ k.transpose(-2, -1)
        attn = attn.softmax(dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(b, n, d)
        return self.proj(out)


class _TorchEvaBlock(torch.nn.Module):
    def __init__(self, dim, heads, mlp_dim, eps):
        super().__init__()
        self.norm1 = torch.nn.LayerNorm(dim, eps=eps)
        self.attn = _TorchEvaAttention(dim, heads)
        self.norm2 = torch.nn.LayerNorm(dim, eps=eps)
        self.mlp = torch.nn.ModuleDict({
            "fc1": torch.nn.Linear(dim, mlp_dim),
            "fc2": torch.nn.Linear(mlp_dim, dim),
        })

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        h = self.mlp["fc2"](torch.nn.functional.gelu(self.mlp["fc1"](self.norm2(x))))
        return x + h


class _TorchEva(torch.nn.Module):
    """LAVIS eva_vit checkpoint layout: patch_embed.proj (conv), cls_token,
    pos_embed, blocks.{i}.…"""

    def __init__(self, cfg: ViTConfig):
        super().__init__()
        self.patch_embed = torch.nn.ModuleDict({
            "proj": torch.nn.Conv2d(3, cfg.width, cfg.patch_size, cfg.patch_size)
        })
        n_tok = (cfg.image_size // cfg.patch_size) ** 2 + 1
        self.cls_token = torch.nn.Parameter(torch.randn(1, 1, cfg.width) * 0.02)
        self.pos_embed = torch.nn.Parameter(torch.randn(1, n_tok, cfg.width) * 0.02)
        self.blocks = torch.nn.ModuleList([
            _TorchEvaBlock(cfg.width, cfg.num_heads, cfg.mlp_dim, cfg.layer_norm_eps)
            for _ in range(cfg.depth)
        ])

    def forward(self, pixels):  # (B, 3, H, W)
        x = self.patch_embed["proj"](pixels)               # (B, D, gh, gw)
        x = x.flatten(2).transpose(1, 2)                   # (B, gh*gw, D)
        cls = self.cls_token.expand(x.shape[0], -1, -1)
        x = torch.cat((cls, x), dim=1) + self.pos_embed
        for blk in self.blocks:
            x = blk(x)
        return x


def test_eva_vit_full_forward_matches_torch_oracle():
    from mraudio_tpu.models.convert_weights import convert_eva_vit
    from mraudio_tpu.models.eva_vit import EvaViT

    cfg = ViTConfig(
        image_size=28, patch_size=14, width=32, depth=3, num_heads=4,
        mlp_dim=64, layer_norm_eps=1e-6, dtype="float32",
    )
    torch.manual_seed(0)
    ref_model = _TorchEva(cfg).eval()
    sd = _np_sd(ref_model)
    # eva checkpoint qkv has no fused bias entry; q_bias/v_bias ride as
    # their own keys — exactly what the torch module's state dict holds
    sd = {k.replace("attn.qkv.weight", "attn.qkv.weight"): v for k, v in sd.items()}
    params = convert_eva_vit(sd, cfg)

    rng = np.random.default_rng(3)
    pixels = rng.standard_normal((2, 3, 28, 28)).astype(np.float32)
    with torch.no_grad():
        want = ref_model(torch.from_numpy(pixels)).numpy()
    got = EvaViT(cfg).apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        jnp.asarray(pixels.transpose(0, 2, 3, 1)),
    )
    assert got.shape == want.shape == (2, cfg.seq_len, cfg.width)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=3e-5)


def test_eva_converter_zero_k_bias():
    """The checkpoint has no k bias; the converter must install zeros
    (LAVIS builds qkv_bias = cat(q_bias, 0, v_bias))."""
    from mraudio_tpu.models.convert_weights import convert_eva_vit

    cfg = ViTConfig(image_size=28, patch_size=14, width=32, depth=1,
                    num_heads=4, mlp_dim=64, dtype="float32")
    torch.manual_seed(1)
    sd = _np_sd(_TorchEva(cfg))
    params = convert_eva_vit(sd, cfg)
    assert (params["block_0"]["attn"]["k"]["bias"] == 0).all()
    assert not (params["block_0"]["attn"]["q"]["bias"] == 0).all()


# ---------------------------------------------------------------------------
# BEATs vs HF WavLM (the architecture BEATs' encoder is built from)
# ---------------------------------------------------------------------------


BEATS_CFG = BeatsConfig(
    num_mel_bins=16, patch_size=4, patch_stride=4, conv_dim=24, width=32,
    depth=3, num_heads=4, mlp_dim=64, conv_pos_kernel=8, conv_pos_groups=4,
    rel_pos_buckets=16, rel_pos_max_distance=20, layer_norm_eps=1e-5,
    dtype="float32",
)


class _TorchBeatsFrontEnd(torch.nn.Module):
    """fbank → conv patch embed → LN → projection (the BEATs front end
    ahead of the wav2vec2-style encoder)."""

    def __init__(self, cfg: BeatsConfig):
        super().__init__()
        self.patch_embedding = torch.nn.Conv2d(
            1, cfg.conv_dim, cfg.patch_size, cfg.patch_stride, bias=False
        )
        self.layer_norm = torch.nn.LayerNorm(cfg.conv_dim, eps=cfg.layer_norm_eps)
        self.post_extract_proj = torch.nn.Linear(cfg.conv_dim, cfg.width)

    def forward(self, fbank):  # (B, T, F)
        x = self.patch_embedding(fbank.unsqueeze(1))       # (B, D, gt, gf)
        x = x.reshape(x.shape[0], x.shape[1], -1).transpose(1, 2)
        x = self.layer_norm(x)
        return self.post_extract_proj(x)


def _wavlm_encoder(cfg: BeatsConfig):
    from transformers import WavLMConfig
    from transformers.models.wavlm.modeling_wavlm import WavLMEncoder

    hf_cfg = WavLMConfig(
        hidden_size=cfg.width, num_hidden_layers=cfg.depth,
        num_attention_heads=cfg.num_heads, intermediate_size=cfg.mlp_dim,
        num_conv_pos_embeddings=cfg.conv_pos_kernel,
        num_conv_pos_embedding_groups=cfg.conv_pos_groups,
        num_buckets=cfg.rel_pos_buckets,
        max_bucket_distance=cfg.rel_pos_max_distance,
        hidden_dropout=0.0, activation_dropout=0.0, attention_dropout=0.0,
        feat_proj_dropout=0.0, layerdrop=0.0, hidden_act="gelu",
        layer_norm_eps=cfg.layer_norm_eps,
    )
    return WavLMEncoder(hf_cfg).eval()


def _beats_sd_from(front, enc, cfg: BeatsConfig) -> dict:
    """Assemble a BEATs-iter3-format state dict from the torch oracle
    modules (the name surgery the real checkpoint layout implies)."""
    fsd = _np_sd(front)
    esd = _np_sd(enc)
    sd = {
        "patch_embedding.weight": fsd["patch_embedding.weight"],
        "layer_norm.weight": fsd["layer_norm.weight"],
        "layer_norm.bias": fsd["layer_norm.bias"],
        "post_extract_proj.weight": fsd["post_extract_proj.weight"],
        "post_extract_proj.bias": fsd["post_extract_proj.bias"],
        "encoder.layer_norm.weight": esd["layer_norm.weight"],
        "encoder.layer_norm.bias": esd["layer_norm.bias"],
        "encoder.layers.0.self_attn.relative_attention_bias.weight":
            esd["layers.0.attention.rel_attn_embed.weight"],
        "encoder.pos_conv.0.bias": esd["pos_conv_embed.conv.bias"],
    }
    # weight-normed pos conv: keep g/v split, as the real checkpoint does
    for hf_key, beats_key in (
        ("pos_conv_embed.conv.parametrizations.weight.original0",
         "encoder.pos_conv.0.weight_g"),
        ("pos_conv_embed.conv.parametrizations.weight.original1",
         "encoder.pos_conv.0.weight_v"),
        ("pos_conv_embed.conv.weight_g", "encoder.pos_conv.0.weight_g"),
        ("pos_conv_embed.conv.weight_v", "encoder.pos_conv.0.weight_v"),
    ):
        if hf_key in esd:
            sd[beats_key] = esd[hf_key]
    for i in range(cfg.depth):
        src = f"layers.{i}"
        dst = f"encoder.layers.{i}"
        for proj in ("q_proj", "v_proj", "out_proj"):
            sd[f"{dst}.self_attn.{proj}.weight"] = esd[f"{src}.attention.{proj}.weight"]
            sd[f"{dst}.self_attn.{proj}.bias"] = esd[f"{src}.attention.{proj}.bias"]
        sd[f"{dst}.self_attn.k_proj.weight"] = esd[f"{src}.attention.k_proj.weight"]
        # BEATs k_proj carries no bias (the torch model's is zeroed)
        sd[f"{dst}.self_attn.grep_linear.weight"] = esd[f"{src}.attention.gru_rel_pos_linear.weight"]
        sd[f"{dst}.self_attn.grep_linear.bias"] = esd[f"{src}.attention.gru_rel_pos_linear.bias"]
        sd[f"{dst}.self_attn.grep_a"] = esd[f"{src}.attention.gru_rel_pos_const"]
        sd[f"{dst}.self_attn_layer_norm.weight"] = esd[f"{src}.layer_norm.weight"]
        sd[f"{dst}.self_attn_layer_norm.bias"] = esd[f"{src}.layer_norm.bias"]
        sd[f"{dst}.fc1.weight"] = esd[f"{src}.feed_forward.intermediate_dense.weight"]
        sd[f"{dst}.fc1.bias"] = esd[f"{src}.feed_forward.intermediate_dense.bias"]
        sd[f"{dst}.fc2.weight"] = esd[f"{src}.feed_forward.output_dense.weight"]
        sd[f"{dst}.fc2.bias"] = esd[f"{src}.feed_forward.output_dense.bias"]
        sd[f"{dst}.final_layer_norm.weight"] = esd[f"{src}.final_layer_norm.weight"]
        sd[f"{dst}.final_layer_norm.bias"] = esd[f"{src}.final_layer_norm.bias"]
    return sd


def test_beats_full_forward_matches_wavlm_oracle():
    from mraudio_tpu.models.beats import BeatsEncoder
    from mraudio_tpu.models.convert_weights import convert_beats

    cfg = BEATS_CFG
    torch.manual_seed(0)
    front = _TorchBeatsFrontEnd(cfg).eval()
    enc = _wavlm_encoder(cfg)
    with torch.no_grad():
        for layer in enc.layers:
            layer.attention.k_proj.bias.zero_()  # BEATs: no k bias

    sd = _beats_sd_from(front, enc, cfg)
    assert "encoder.pos_conv.0.weight_g" in sd  # weight-norm path exercised
    params = convert_beats(sd, cfg)

    rng = np.random.default_rng(4)
    fbank = rng.standard_normal((2, 24, cfg.num_mel_bins)).astype(np.float32)
    with torch.no_grad():
        x = front(torch.from_numpy(fbank))
        want = enc(x).last_hidden_state.numpy()

    got = BeatsEncoder(cfg).apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        jnp.asarray(fbank),
    )
    assert got.shape == want.shape == (2, 24, cfg.width)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=5e-5)


def test_beats_pos_conv_weight_norm_fusion():
    """g/v fusion must equal torch's effective conv weight."""
    from mraudio_tpu.models.convert_weights import convert_beats

    cfg = BEATS_CFG
    torch.manual_seed(2)
    front = _TorchBeatsFrontEnd(cfg).eval()
    enc = _wavlm_encoder(cfg)
    sd = _beats_sd_from(front, enc, cfg)
    params = convert_beats(sd, cfg)
    eff = enc.pos_conv_embed.conv.weight.detach().numpy()  # (out, in/g, k)
    np.testing.assert_allclose(
        params["pos_conv"]["kernel"], eff.transpose(2, 1, 0), rtol=1e-6, atol=1e-7
    )
