"""Chunked prefill (LlamaConfig.prefill_chunk) parity.

Segmented prefill must be token-identical to the one-shot pass: same
cache values (quantize_kv scales are per position), same attention tile
sequence (static q_offset), masked unwritten columns exact no-ops in the
online softmax.  Covers greedy + grammar decoding, int8 KV, kv_keep
compaction, the continuous batcher, and an uneven final segment.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mraudio_tpu.config import tiny_model_config
from mraudio_tpu.infer.generate import greedy_generate
from mraudio_tpu.models.layers import positions_from_mask
from mraudio_tpu.models.llama import LlamaModel


S, MAX_NEW = 24, 6


@pytest.fixture(scope="module")
def base():
    cfg = tiny_model_config().llm
    model = LlamaModel(cfg, None)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, S, cfg.hidden_size))
    mask01 = jnp.ones((2, S), jnp.int32)
    # row 1 left-padded: padding must stay invisible in every segment
    mask01 = mask01.at[1, :3].set(0)
    causal = (
        jnp.tril(jnp.ones((S, S), bool))[None, None]
        & mask01[:, None, None, :].astype(bool)
    )
    ids = jnp.zeros((2, S), jnp.int32)
    params = {
        "params": model.init(
            key, x, causal, positions_from_mask(mask01), ids,
            method=LlamaModel.init_all,
        )["params"]
    }
    return cfg, params, np.asarray(x), np.asarray(mask01)


def _tokens(cfg, params, x, mask01):
    model = LlamaModel(cfg, None)
    return np.asarray(
        greedy_generate(
            model, params, jnp.asarray(x), jnp.asarray(mask01),
            MAX_NEW, eos_id=2,
        )
    )


@pytest.mark.parametrize("variant", ["plain", "int8kv", "kv_keep"])
def test_chunked_prefill_matches_one_shot(base, variant):
    cfg, params, x, mask01 = base
    if variant == "int8kv":
        cfg = cfg.replace(kv_quant="int8")
    elif variant == "kv_keep":
        cfg = cfg.replace(kv_quant="int8", kv_keep=12, kv_keep_obs=6,
                          kv_keep_sink=2)
    ref = _tokens(cfg, params, x, mask01)
    # 8 divides 24; 10 leaves an uneven 4-token final segment
    for chunk in (8, 10):
        got = _tokens(cfg.replace(prefill_chunk=chunk), params, x, mask01)
        np.testing.assert_array_equal(got, ref, err_msg=f"chunk={chunk}")


def test_chunked_obs_score_matches_one_shot(base):
    """The SnapKV compaction statistic (per-layer ``obs_score``) must be
    the same whether the prefill ran one-shot or chunked — including a
    final chunk of length 1 (regression: used to KeyError) and chunks
    shorter than the observation window (regression: the window used to
    shrink to the final chunk and read the wrong validity columns)."""
    from mraudio_tpu.infer.generate import prefill_cache

    cfg, params, x, mask01 = base
    cfg = cfg.replace(kv_quant="int8", kv_keep=12, kv_keep_obs=6,
                      kv_keep_sink=2)
    # interior padding INSIDE the observation window of row 0 — the
    # validity slice must come from the queries' absolute columns
    m = np.array(mask01)
    m[0, 19:21] = 0

    def obs(chunk):
        model = LlamaModel(cfg.replace(prefill_chunk=chunk), None)
        mask = jnp.asarray(m)
        positions = positions_from_mask(mask)
        alloc = S + MAX_NEW
        full_mask = (
            jnp.zeros((2, alloc), jnp.int32).at[:, :S].set(mask)
        )
        _, cache = prefill_cache(
            model, params, jnp.asarray(x), positions, full_mask, alloc
        )
        return np.stack([np.asarray(layer["obs_score"]) for layer in cache])

    ref = obs(0)
    assert np.abs(ref).max() > 0, "one-shot scores must be non-trivial"
    for chunk in (8, 10, 23):  # 23 -> final chunk of length 1
        np.testing.assert_allclose(
            obs(chunk), ref, rtol=2e-5, atol=2e-5, err_msg=f"chunk={chunk}"
        )


def test_chunked_prefill_kv_keep_interior_padding(base):
    """Token-level parity for kv_keep under chunked prefill with padding
    inside the observation window (the case whose compaction scores used
    to be silently wrong)."""
    cfg, params, x, mask01 = base
    cfg = cfg.replace(kv_quant="int8", kv_keep=12, kv_keep_obs=6,
                      kv_keep_sink=2)
    m = np.array(mask01)
    m[0, 19:21] = 0
    ref = _tokens(cfg, params, x, m)
    for chunk in (10, 23):
        got = _tokens(cfg.replace(prefill_chunk=chunk), params, x, m)
        np.testing.assert_array_equal(got, ref, err_msg=f"chunk={chunk}")


def test_chunked_prefill_grammar(base):
    from mraudio_tpu.infer.generate import grammar_generate
    from mraudio_tpu.text.grammar import compile_grammar
    from mraudio_tpu.text.tokenizer import ByteTokenizer

    cfg, params, x, mask01 = base
    tok = ByteTokenizer()
    tables = compile_grammar(tok)
    args = (
        jnp.asarray(x), jnp.asarray(mask01), 12, tok.eos_token_id,
        jnp.asarray(tables.allowed), jnp.asarray(tables.next_state),
        jnp.asarray(tables.forced), jnp.asarray(tables.dist_next),
    )
    ref = np.asarray(grammar_generate(LlamaModel(cfg, None), params, *args))
    got = np.asarray(
        grammar_generate(
            LlamaModel(cfg.replace(prefill_chunk=10), None), params, *args
        )
    )
    np.testing.assert_array_equal(got, ref)


def test_chunked_prefill_serving(base):
    from mraudio_tpu.infer.serving import ContinuousBatcher, Request

    cfg, params, x, mask01 = base

    def run(cfg):
        engine = ContinuousBatcher(
            LlamaModel(cfg, None), params, prefix_len=S,
            max_new_tokens=4, eos_id=2, max_slots=2,
        )
        reqs = [Request(i, x[i], mask01[i]) for i in range(2)]
        assert engine.submit_many(reqs) == 2
        return {c.request_id: c.token_ids for c in engine.run_to_completion()}

    assert run(cfg) == run(cfg.replace(prefill_chunk=10))
