"""Post-prefill KV compaction (LlamaConfig.kv_keep, models/llama.py
compact_cache, infer/generate.py, infer/serving.py).

SnapKV-style observation-window scoring with per-layer (layer-adaptive,
AccKV-style) top-k selection.  A capability beyond the reference, whose
decode always attends the full prefix (HF generate,
``models/xinstructblip.py:387-392``).  Mechanics are exactly testable:
keeping every valid column must reproduce the uncompacted decode
token-for-token; eviction must drop padding and unattended columns
first and never the protected sink/prompt regions.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mraudio_tpu.config import tiny_model_config
from mraudio_tpu.infer.generate import greedy_generate
from mraudio_tpu.models.llama import LlamaModel, compact_cache, init_cache
from mraudio_tpu.models.layers import positions_from_mask


S, NEW = 24, 6


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_model_config().llm
    model = LlamaModel(cfg, None)
    key = jax.random.PRNGKey(3)
    d = cfg.hidden_size
    x = jax.random.normal(key, (2, S, d))
    # ragged validity: row 0 full, row 1 has interior + trailing padding
    mask01 = np.ones((2, S), np.int32)
    mask01[1, 5] = 0
    mask01[1, -3:] = 0
    mask01 = jnp.asarray(mask01)
    causal = jnp.tril(jnp.ones((S, S), bool))[None, None] & mask01[:, None, None, :].astype(bool)
    params = model.init(
        key, x, causal, positions_from_mask(mask01),
        jnp.zeros((2, S), jnp.int32), method=LlamaModel.init_all,
    )["params"]
    return cfg, model, params, x, mask01


def _gen(cfg, params, x, mask01, **over):
    model = LlamaModel(cfg.replace(**over), None)
    return np.asarray(
        greedy_generate(model, {"params": params}, x, mask01, NEW, eos_id=2)
    )


def test_keep_all_matches_uncompacted(setup):
    """kv_keep == prefix length keeps every column (sorted indices ==
    identity for the full row), so decode must match token-for-token."""
    cfg, _, params, x, mask01 = setup
    base = _gen(cfg, params, x, mask01)
    kept = _gen(cfg, params, x, mask01,
                kv_keep=S, kv_keep_obs=8, kv_keep_sink=2)
    np.testing.assert_array_equal(base, kept)


def test_keep_all_matches_uncompacted_int8_kv(setup):
    cfg, _, params, x, mask01 = setup
    base = _gen(cfg, params, x, mask01, kv_quant="int8")
    kept = _gen(cfg, params, x, mask01, kv_quant="int8",
                kv_keep=S, kv_keep_obs=8, kv_keep_sink=2)
    np.testing.assert_array_equal(base, kept)


def test_keep_all_matches_uncompacted_int4_kv(setup):
    """int4 cache + compaction: exercises the packed branch of the
    prefill observation-window scorer (merged-layout head-chunk slices)
    and compact_cache's gather over 3D packed leaves."""
    cfg, _, params, x, mask01 = setup
    base = _gen(cfg, params, x, mask01, kv_quant="int4")
    kept = _gen(cfg, params, x, mask01, kv_quant="int4",
                kv_keep=S, kv_keep_obs=8, kv_keep_sink=2)
    np.testing.assert_array_equal(base, kept)


def test_compacted_generate_runs_and_differs_shapes(setup):
    cfg, _, params, x, mask01 = setup
    toks = _gen(cfg, params, x, mask01,
                kv_keep=12, kv_keep_obs=6, kv_keep_sink=2)
    assert toks.shape == (2, NEW)


def test_compact_cache_prefers_scored_columns(setup):
    """Unit-level: planted scores select the planted columns; padding
    loses to everything; sink + observation tail always survive."""
    cfg, model, params, x, mask01 = setup
    cfg2 = cfg.replace(kv_keep=10, kv_keep_obs=4, kv_keep_sink=2)
    cache = init_cache(cfg2, 2, S)
    # make k distinguishable by column index so gathers are checkable
    col_stamp = jnp.arange(S, dtype=jnp.float32)[None, :, None, None]
    layers = cache if isinstance(cache, list) else [cache]
    score = np.zeros((2, S), np.float32)
    planted = [7, 11, 13, 15]
    score[:, planted] = 5.0
    score[:, 3] = 1.0  # weaker, should lose to planted but beat zeros
    for layer in layers:
        layer["k"] = (layer["k"] + col_stamp).astype(layer["k"].dtype)
        layer["obs_score"] = jnp.asarray(score)
    valid = np.ones((2, S), np.int32)
    valid[1, planted[0]] = 0  # row 1: best-scored column is invalid
    out = compact_cache(cfg2, layers, jnp.asarray(valid), S, extra_cols=3)
    lay = out[0]
    assert lay["k"].shape[1] == 10 + 3
    cols0 = np.asarray(lay["k"][0, :10, 0, 0])
    # protected: sink 0,1 and obs tail 20..23; planted 7,11,13,15
    for c in [0, 1, 20, 21, 22, 23] + planted:
        assert c in cols0, (c, cols0)
    cols1 = np.asarray(lay["k"][1, :10, 0, 0])
    assert planted[0] not in cols1       # invalid never selected over valid
    assert 3 in cols1                    # runner-up takes its place
    # per-layer validity: kept columns valid, extra columns not yet
    assert np.asarray(lay["valid"][0, :10]).all()
    assert not np.asarray(lay["valid"][:, 10:]).any()


def test_prefill_emits_observation_scores(setup):
    """With kv_keep on, the prefill cache carries per-layer (B, KV)
    scores that sum to ~#valid-observation-queries per row."""
    cfg, _, params, x, mask01 = setup
    cfg2 = cfg.replace(kv_keep=12, kv_keep_obs=6, kv_keep_sink=2)
    model2 = LlamaModel(cfg2, None)
    cache = init_cache(cfg2, 2, S)
    causal = jnp.tril(jnp.ones((S, S), bool))[None, None] & mask01[:, None, None, :].astype(bool)
    _, cache = model2.apply(
        {"params": params}, x, causal, positions_from_mask(mask01),
        cache=cache, cache_index=0, kv_valid=mask01, causal=True,
        obs_start=S - 6,  # callers (prefill_cache) pass S_total - kv_keep_obs
    )
    layers = cache if isinstance(cache, list) else [cache]
    sc = np.asarray(layers[0]["obs_score"])
    assert sc.shape == (2, S)
    h = cfg.num_heads
    # row 0: all 6 obs queries valid; row 1: 3 of the last 6 are padding
    np.testing.assert_allclose(sc[0].sum(), 6 * h, rtol=1e-3)
    np.testing.assert_allclose(sc[1].sum(), 3 * h, rtol=1e-3)
    # padding columns get zero mass
    assert sc[1, 5] < 1e-6 and (sc[1, -3:] < 1e-6).all()


def test_serving_with_kv_keep(setup):
    """Continuous batcher under compaction: slot region shrinks to
    keep+budget and completions still stream out."""
    from mraudio_tpu.infer.serving import ContinuousBatcher, Request

    cfg, _, params, x, mask01 = setup
    cfg2 = cfg.replace(kv_keep=12, kv_keep_obs=6, kv_keep_sink=2)
    model2 = LlamaModel(cfg2, None)
    eng = ContinuousBatcher(
        model2, {"params": params}, prefix_len=S, max_new_tokens=NEW,
        eos_id=2, max_slots=2,
    )
    assert eng.max_len == 12 + NEW
    for rid in range(2):
        assert eng.submit(Request(
            rid, np.asarray(x[rid]), np.asarray(mask01[rid])
        ))
    done = eng.run_to_completion()
    assert sorted(c.request_id for c in done) == [0, 1]
    # matches the jitted batch generate under the same compaction
    batch_toks = _gen(cfg, params, x, mask01,
                      kv_keep=12, kv_keep_obs=6, kv_keep_sink=2)
    for c in done:
        want = list(batch_toks[c.request_id])
        got = c.token_ids + [2] * (NEW - len(c.token_ids))
        assert got == want[: len(got)] or got == want, (got, want)


def test_grammar_generate_with_kv_keep(setup):
    """Constrained decoding composes with compaction (spec-step writes
    land after the kept region; per-layer valid gates the draft)."""
    from mraudio_tpu.infer.generate import grammar_generate
    from mraudio_tpu.text.grammar import compile_grammar
    from mraudio_tpu.text.tokenizer import ByteTokenizer

    cfg, _, params, x, mask01 = setup
    tok = ByteTokenizer()
    g = compile_grammar(tok)
    cfg2 = cfg.replace(kv_keep=12, kv_keep_obs=6, kv_keep_sink=2)
    model2 = LlamaModel(cfg2, None)
    toks = np.asarray(grammar_generate(
        model2, {"params": params}, x, mask01, NEW + 8, tok.eos_token_id,
        jnp.asarray(g.allowed), jnp.asarray(g.next_state),
        jnp.asarray(g.forced), jnp.asarray(g.dist_next), spec_width=4,
    ))
    assert toks.shape == (2, NEW + 8)
    # output parses under the grammar: decode and check bracket shape
    text = tok.decode(list(toks[0]))
    assert text.lstrip().startswith("[["), text  # grammar admits leading spaces
