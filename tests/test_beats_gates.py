"""Exact BEATs ``gru_rel_pos`` gate structure + full-checkpoint mapping.

Oracle: the gating formula from BEATs ``backbone.MultiheadAttention``
(microsoft/unilm), re-derived here in numpy with no imports from the
module under test:

    g = q @ W_grep.T + b_grep              # (B, H, L, 8)
    a, b = sigmoid(g.view(..., 2, 4).sum(-1)).chunk(2)
    scale = a * (b * grep_a - 1) + 2       # grep_a: (1, H, 1, 1)
    gated_bias = scale * position_bias

Reference binding: ``models/xinstructblip.py:670-676`` (BeatsEncoder,
checkpoint ``BEATs_iter3_plus_AS2M.pt``).
"""

import numpy as np

import jax
import jax.numpy as jnp

from mraudio_tpu.config import tiny_model_config
from mraudio_tpu.models.beats import BeatsEncoder, GatedBias
from mraudio_tpu.models.convert_weights import convert_beats

CFG = tiny_model_config().beats


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def _oracle_gate(q_blhd, w, b, grep_a, bias):
    """q: (B, L, H, Dh); w: (8, Dh); grep_a: (H,); bias: (1, H, L, L)."""
    g = q_blhd @ w.T + b                                   # (B, L, H, 8)
    s = _sigmoid(g.reshape(g.shape[:-1] + (2, 4)).sum(-1))  # (B, L, H, 2)
    gate_a, gate_b = s[..., :1], s[..., 1:]
    scale = gate_a * (gate_b * grep_a[None, None, :, None] - 1.0) + 2.0
    return scale.transpose(0, 2, 1, 3) * bias


def test_gated_bias_matches_beats_formula():
    rng = np.random.default_rng(0)
    B, L, H = 2, 5, CFG.num_heads
    Dh = CFG.width // H
    q = rng.standard_normal((B, L, H, Dh)).astype(np.float32)
    bias = rng.standard_normal((1, H, L, L)).astype(np.float32)

    gate = GatedBias(CFG, jnp.float32)
    params = gate.init(jax.random.PRNGKey(0), jnp.asarray(q), jnp.asarray(bias))

    w = rng.standard_normal((8, Dh)).astype(np.float32)
    b = rng.standard_normal(8).astype(np.float32)
    grep_a = rng.standard_normal(H).astype(np.float32)
    params = {"params": {
        "grep_linear": {"kernel": jnp.asarray(w.T), "bias": jnp.asarray(b)},
        "grep_a": jnp.asarray(grep_a),
    }}
    out = np.asarray(gate.apply(params, jnp.asarray(q), jnp.asarray(bias)))
    np.testing.assert_allclose(out, _oracle_gate(q, w, b, grep_a, bias),
                               rtol=1e-5, atol=1e-5)


class _TrackedDict(dict):
    """Records which checkpoint keys the converter reads."""

    def __init__(self, *a, **k):
        super().__init__(*a, **k)
        self.accessed = set()

    def __getitem__(self, k):
        self.accessed.add(k)
        return super().__getitem__(k)

    def get(self, k, default=None):
        if k in self:
            self.accessed.add(k)
        return super().get(k, default)


def synthetic_beats_sd(cfg, rng=None):
    """Fabricated BEATs-iter3-format state dict (every key the real
    checkpoint's encoder carries, including per-layer grep gates)."""
    rng = rng or np.random.default_rng(1)
    d, w, p = cfg.conv_dim, cfg.width, cfg.patch_size
    f32 = lambda *shape: rng.standard_normal(shape).astype(np.float32)
    sd = {
        "patch_embedding.weight": f32(d, 1, p, p),
        "layer_norm.weight": f32(d),
        "layer_norm.bias": f32(d),
        "encoder.pos_conv.0.weight": f32(w, w // cfg.conv_pos_groups, cfg.conv_pos_kernel),
        "encoder.pos_conv.0.bias": f32(w),
        "encoder.layer_norm.weight": f32(w),
        "encoder.layer_norm.bias": f32(w),
        "encoder.layers.0.self_attn.relative_attention_bias.weight":
            f32(cfg.rel_pos_buckets, cfg.num_heads),
    }
    if d != w:
        sd["post_extract_proj.weight"] = f32(w, d)
        sd["post_extract_proj.bias"] = f32(w)
    for i in range(cfg.depth):
        pre = f"encoder.layers.{i}"
        for proj in ("q_proj", "v_proj", "out_proj"):
            sd[f"{pre}.self_attn.{proj}.weight"] = f32(w, w)
            sd[f"{pre}.self_attn.{proj}.bias"] = f32(w)
        sd[f"{pre}.self_attn.k_proj.weight"] = f32(w, w)  # no k bias in BEATs
        sd[f"{pre}.self_attn.grep_linear.weight"] = f32(8, w // cfg.num_heads)
        sd[f"{pre}.self_attn.grep_linear.bias"] = f32(8)
        sd[f"{pre}.self_attn.grep_a"] = f32(1, cfg.num_heads, 1, 1)
        sd[f"{pre}.self_attn_layer_norm.weight"] = f32(w)
        sd[f"{pre}.self_attn_layer_norm.bias"] = f32(w)
        sd[f"{pre}.fc1.weight"] = f32(cfg.mlp_dim, w)
        sd[f"{pre}.fc1.bias"] = f32(cfg.mlp_dim)
        sd[f"{pre}.fc2.weight"] = f32(w, cfg.mlp_dim)
        sd[f"{pre}.fc2.bias"] = f32(w)
        sd[f"{pre}.final_layer_norm.weight"] = f32(w)
        sd[f"{pre}.final_layer_norm.bias"] = f32(w)
    return sd


def _tree_spec(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_tree_spec(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = tuple(np.shape(v))
    return out


def test_beats_converter_structure_and_no_unused_keys():
    sd = _TrackedDict(synthetic_beats_sd(CFG))
    converted = convert_beats(sd, CFG)

    model = BeatsEncoder(CFG)
    t_mel = 8
    ref = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, t_mel, CFG.num_mel_bins), jnp.float32)
    )["params"]
    spec_c, spec_r = _tree_spec(converted), _tree_spec(ref)
    # patch_embed bias is synthesized (real ckpt conv has no bias)
    assert spec_c == spec_r, (
        f"missing: {set(spec_r) - set(spec_c)}; extra: {set(spec_c) - set(spec_r)}; "
        f"shape diffs: { {k: (spec_c.get(k), spec_r.get(k)) for k in spec_r if spec_c.get(k) != spec_r.get(k)} }"
    )
    unused = set(sd) - sd.accessed
    assert not unused, f"converter ignored checkpoint keys: {sorted(unused)}"

    # converted weights actually run
    out = model.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, converted)},
        jnp.zeros((2, t_mel, CFG.num_mel_bins), jnp.float32),
    )
    assert np.isfinite(np.asarray(out, np.float32)).all()
