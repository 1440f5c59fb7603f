"""Group-wise int4 weight quantization (LlamaConfig.quantization="int4").

Half of int8's weight bytes for the HBM-bound decode; symmetric absmax
per (input-dim group, output channel), AWQ/GPTQ grouping convention.
A capability beyond the reference (whose quantization surface is
bitsandbytes ``load_in_8bit``, ``models/xinstructblip.py:151``).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mraudio_tpu.config import tiny_model_config
from mraudio_tpu.models.convert_weights import quantize_llama_int4
from mraudio_tpu.models.layers import positions_from_mask
from mraudio_tpu.models.llama import LlamaModel


@pytest.fixture(scope="module")
def float_setup():
    cfg = tiny_model_config().llm
    model = LlamaModel(cfg, None)
    s, d = 8, cfg.hidden_size
    key = jax.random.PRNGKey(7)
    x = jax.random.normal(key, (2, s, d))
    mask01 = jnp.ones((2, s), jnp.int32)
    causal = jnp.tril(jnp.ones((s, s), bool))[None, None] & mask01[:, None, None, :].astype(bool)
    ids = jnp.zeros((2, s), jnp.int32)
    params = model.init(
        key, x, causal, positions_from_mask(mask01), ids,
        method=LlamaModel.init_all,
    )["params"]
    return cfg, model, params, x, mask01, causal


def test_quantize_roundtrip_error_bound(float_setup):
    cfg, _, params, *_ = float_setup
    g = 16  # tiny config widths are small
    q = quantize_llama_int4({"llm": params}, group_size=g)["llm"]
    flat_f = jax.tree_util.tree_flatten_with_path(params)[0]
    kernels = {
        "/".join(str(getattr(p, "key", p)) for p in path): leaf
        for path, leaf in flat_f
        if str(getattr(path[-1], "key", path[-1])) == "kernel"
    }
    flat_q = jax.tree_util.tree_flatten_with_path(q)[0]
    qtree = {
        "/".join(str(getattr(p, "key", p)) for p in path): leaf
        for path, leaf in flat_q
    }
    checked = 0
    for name, w in kernels.items():
        base = name.rsplit("/", 1)[0]
        if f"{base}/w_int4" not in qtree:
            continue
        packed = np.asarray(qtree[f"{base}/w_int4"]).astype(np.int32)
        lo = packed & 0xF
        hi = (packed >> 4) & 0xF
        # byte j holds group elements j (lo) and j+g/2 (hi)
        wq = np.concatenate(
            [np.where(lo > 7, lo - 16, lo), np.where(hi > 7, hi - 16, hi)],
            axis=1,
        ).astype(np.float32)
        sc = np.asarray(qtree[f"{base}/w_int4_scale"])
        deq = (wq * sc[:, None, :]).reshape(w.shape)
        err = np.abs(deq - np.asarray(w))
        # symmetric absmax: error <= scale/2 everywhere
        bound = np.repeat(sc, g, axis=0) / 2 + 1e-6
        assert (err <= bound).all()
        checked += 1
    assert checked > 0
    # lm_head stays float (int8 parity: HF get_keys_to_not_convert)
    assert "lm_head/kernel" in qtree
    assert "lm_head/w_int4" not in qtree


def test_quantized_tree_matches_int4_init(float_setup):
    cfg, _, params, *_ = float_setup
    cfg4 = cfg.replace(quantization="int4", int4_group_size=16)
    model4 = LlamaModel(cfg4, None)
    s, d = 8, cfg.hidden_size
    x = jnp.zeros((1, s, d))
    mask01 = jnp.ones((1, s), jnp.int32)
    causal = jnp.tril(jnp.ones((s, s), bool))[None, None] & mask01[:, None, None, :].astype(bool)
    init4 = model4.init(
        jax.random.PRNGKey(0), x, causal, positions_from_mask(mask01),
        jnp.zeros((1, s), jnp.int32), method=LlamaModel.init_all,
    )["params"]
    q = quantize_llama_int4(params, group_size=16)

    def shapes(tree):
        return {
            "/".join(str(getattr(p, "key", p)) for p in path): (leaf.shape, str(leaf.dtype))
            for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]
        }

    assert shapes(q) == shapes(init4)


def test_int4_forward_close_to_float(float_setup):
    cfg, model, params, x, mask01, causal = float_setup
    cfg4 = cfg.replace(quantization="int4", int4_group_size=16)
    model4 = LlamaModel(cfg4, None)
    q = quantize_llama_int4(params, group_size=16)
    pos = positions_from_mask(mask01)
    ref, _ = model.apply({"params": params}, x, causal, pos)
    got, _ = model4.apply({"params": q}, x, causal, pos)
    ref, got = np.asarray(ref, np.float32), np.asarray(got, np.float32)
    # 4-bit grouped weights: outputs correlate strongly with the float
    # model even though individual logits shift
    denom = np.linalg.norm(ref) + 1e-6
    assert np.linalg.norm(got - ref) / denom < 0.25
    corr = np.corrcoef(ref.ravel(), got.ravel())[0, 1]
    assert corr > 0.97


def test_int4_generate_runs_with_cache(float_setup):
    from mraudio_tpu.infer.generate import greedy_generate

    cfg, _, params, x, mask01, _ = float_setup
    cfg4 = cfg.replace(quantization="int4", int4_group_size=16)
    model4 = LlamaModel(cfg4, None)
    q = quantize_llama_int4(params, group_size=16)
    toks = np.asarray(
        greedy_generate(model4, {"params": q}, x, mask01, 6, eos_id=2)
    )
    assert toks.shape == (2, 6)


def test_int4_partition_rules():
    from jax.sharding import Mesh, PartitionSpec as P

    from mraudio_tpu.parallel.partition import LLM_RULES, _match

    assert _match("llm/layer_0/attn/q_proj/w_int4", LLM_RULES) == P(None, None, "model")
    assert _match("llm/layer_0/attn/q_proj/w_int4_scale", LLM_RULES) == P(None, "model")
    assert _match("llm/layer_0/attn/o_proj/w_int4", LLM_RULES) == P("model", None, None)
    assert _match("llm/layer_0/attn/o_proj/w_int4_scale", LLM_RULES) == P("model", None)
