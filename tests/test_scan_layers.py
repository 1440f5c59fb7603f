"""cfg.scan_layers: the nn.scan-over-the-layer-stack decoder is
numerically identical to the per-layer loop given stacked params."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mraudio_tpu.config import LlamaConfig, LoraConfig, tiny_model_config, tiny_data_config
from mraudio_tpu.models.convert_weights import stack_llm_layers
from mraudio_tpu.models.llama import LlamaModel, init_cache
from mraudio_tpu.models.layers import positions_from_mask


def _tiny_cfg(**kw):
    return LlamaConfig(
        vocab_size=64, hidden_size=32, num_layers=3, num_heads=4,
        num_kv_heads=4, intermediate_size=64, max_seq_len=64,
        dtype="float32", **kw
    )


def _init_loop_model(cfg, lora=None, b=2, s=6):
    model = LlamaModel(cfg, lora)
    x = jnp.zeros((b, s, cfg.hidden_size))
    mask = jnp.ones((b, 1, s, s), bool)
    pos = jnp.zeros((b, s), jnp.int32)
    ids = jnp.zeros((b, s), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x, mask, pos, ids,
                        method=LlamaModel.init_all)["params"]
    return model, params


@pytest.mark.parametrize("quant", ["none", "int8"])
def test_scan_layers_matches_loop(quant):
    cfg = _tiny_cfg(quantization=quant)
    lora = LoraConfig(rank=2, alpha=2)
    model, params = _init_loop_model(cfg, lora)
    b, s = 2, 6
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(b, s, cfg.hidden_size)) * 0.3, jnp.float32)
    mask01 = jnp.ones((b, s), jnp.int32)
    attend = (jnp.tril(jnp.ones((s, s), bool))[None, None]
              & mask01[:, None, None, :].astype(bool))
    pos = positions_from_mask(mask01)

    logits0, _ = model.apply({"params": params}, x, attend, pos,
                             kv_valid=mask01, causal=True)

    scfg = cfg.replace(scan_layers=True)
    smodel = LlamaModel(scfg, lora)
    sparams = stack_llm_layers(dict(params), cfg.num_layers)
    logits1, _ = smodel.apply({"params": sparams}, x, attend, pos,
                              kv_valid=mask01, causal=True)
    np.testing.assert_allclose(np.asarray(logits0), np.asarray(logits1),
                               rtol=2e-5, atol=2e-5)


def test_scan_layers_param_tree_matches_stacked_init():
    """Random init under scan_layers produces exactly the tree that
    stack_llm_layers derives from the per-layer layout."""
    cfg = _tiny_cfg()
    _, params_loop = _init_loop_model(cfg)
    smodel, params_scan = _init_loop_model(cfg.replace(scan_layers=True))
    stacked = stack_llm_layers(dict(params_loop), cfg.num_layers)

    flat_a = {tuple(map(str, k)): v.shape for k, v in
              jax.tree_util.tree_leaves_with_path(params_scan)
              } if False else None
    # structural comparison: same paths, same shapes
    la = jax.tree_util.tree_flatten_with_path(params_scan)[0]
    lb = jax.tree_util.tree_flatten_with_path(stacked)[0]
    pa = sorted((str(k), tuple(v.shape)) for k, v in la)
    pb = sorted((str(k), tuple(v.shape)) for k, v in lb)
    assert pa == pb


@pytest.mark.parametrize("kv_quant", ["none", "int8"])
def test_scan_layers_generate_matches_loop(kv_quant):
    from mraudio_tpu.infer.generate import greedy_generate

    cfg = _tiny_cfg(quantization="none", kv_quant=kv_quant)
    model, params = _init_loop_model(cfg)
    b, s = 2, 8
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(b, s, cfg.hidden_size)) * 0.3, jnp.float32)
    mask01 = jnp.ones((b, s), jnp.int32)

    toks0 = greedy_generate(model, {"params": params}, x, mask01, 6, eos_id=2)

    smodel = LlamaModel(cfg.replace(scan_layers=True), None)
    sparams = stack_llm_layers(dict(params), cfg.num_layers)
    toks1 = greedy_generate(smodel, {"params": sparams}, x, mask01, 6, eos_id=2)
    np.testing.assert_array_equal(np.asarray(toks0), np.asarray(toks1))


def test_scan_layers_cache_shapes():
    cfg = _tiny_cfg(scan_layers=True, kv_quant="int8")
    cache = init_cache(cfg, 2, 16)
    assert isinstance(cache, dict)
    assert cache["k"].shape == (3, 2, 16, 4, 8)
    # scales: (L, B, H, S) — sequence on the lane axis
    assert cache["k_scale"].shape == (3, 2, 4, 16)


def test_scan_layers_partition_specs_shift():
    from mraudio_tpu.parallel.partition import LLM_RULES, _match

    # simulated stacked path picks up a leading None via param_shardings
    import mraudio_tpu.parallel.partition as pt

    spec = _match("llm/layers/attn/q_proj/kernel", LLM_RULES)
    assert tuple(spec) == (None, "model")


def test_scan_layers_train_step_and_grads():
    """Gradients through the scanned stack match the loop (LoRA leaves)."""
    cfg = _tiny_cfg()
    lora = LoraConfig(rank=2, alpha=2)
    model, params = _init_loop_model(cfg, lora)
    smodel = LlamaModel(cfg.replace(scan_layers=True), lora)
    sparams = stack_llm_layers(dict(params), cfg.num_layers)

    b, s = 2, 6
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(b, s, cfg.hidden_size)) * 0.3, jnp.float32)
    mask01 = jnp.ones((b, s), jnp.int32)
    attend = (jnp.tril(jnp.ones((s, s), bool))[None, None]
              & mask01[:, None, None, :].astype(bool))
    pos = positions_from_mask(mask01)
    tgt = jnp.asarray(rng.integers(0, 64, (b, s)))

    def loss(m, p):
        logits, _ = m.apply({"params": p}, x, attend, pos,
                            kv_valid=mask01, causal=True)
        lp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.mean(jnp.take_along_axis(lp, tgt[..., None], -1))

    g0 = jax.grad(lambda p: loss(model, p))(params)
    g1 = jax.grad(lambda p: loss(smodel, p))(sparams)
    g0s = stack_llm_layers(dict(g0), cfg.num_layers)
    for (k0, a), (k1, b_) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(g0s), key=lambda kv: str(kv[0])),
        sorted(jax.tree_util.tree_leaves_with_path(g1), key=lambda kv: str(kv[0])),
    ):
        assert str(k0) == str(k1)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-5)


def test_scan_layers_full_assembly_generate():
    """XInstructBLIP end to end with a scanned decoder."""
    from bench import make_batch
    from mraudio_tpu.models.xinstructblip import XInstructBLIP

    mcfg = tiny_model_config()
    mcfg = mcfg.replace(llm=mcfg.llm.replace(scan_layers=True))
    dcfg = tiny_data_config(n_frms=4)
    model = XInstructBLIP(mcfg, audio_cfg=dcfg.audio)
    params = model.init_params(jax.random.PRNGKey(0))
    batch = make_batch(dcfg, model, 2)
    texts = model.generate(params, batch)
    assert len(texts) == 2
