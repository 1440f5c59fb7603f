"""Self-speculative greedy decoding (infer/generate.py::lookup_generate).

Exactness contract: lookup speculation must be TOKEN-IDENTICAL to plain
greedy decoding for any draft quality — every committed token is either
the model's argmax at its position or a draft token verified equal to
it.  Counterpart of the reference's HF greedy ``generate`` hot loop
(``models/xinstructblip.py:387-392``).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mraudio_tpu.config import tiny_data_config, tiny_model_config
from mraudio_tpu.infer.generate import greedy_generate, lookup_generate
from mraudio_tpu.models.layers import positions_from_mask
from mraudio_tpu.models.llama import LlamaModel


@pytest.fixture(scope="module")
def llm_setup():
    cfg = tiny_model_config().llm.replace(vocab_size=64)
    model = LlamaModel(cfg, None)
    s, d = 12, cfg.hidden_size
    key = jax.random.PRNGKey(5)
    x = jax.random.normal(key, (3, s, d))
    mask01 = np.ones((3, s), np.int32)
    mask01[1, :3] = 0  # left padding on row 1
    mask01[2, :7] = 0  # heavy left padding on row 2
    mask01 = jnp.asarray(mask01)
    causal = (
        jnp.tril(jnp.ones((s, s), bool))[None, None]
        & mask01[:, None, None, :].astype(bool)
    )
    ids = jnp.zeros((3, s), jnp.int32)
    params = {
        "params": model.init(
            key, x, causal, positions_from_mask(mask01), ids,
            method=LlamaModel.init_all,
        )["params"]
    }
    return model, params, x, mask01


@pytest.mark.parametrize("w", [2, 3, 4, 8])
def test_lookup_matches_greedy(llm_setup, w):
    model, params, x, mask01 = llm_setup
    for max_new in (8, 24):
        base = np.asarray(
            greedy_generate(model, params, x, mask01, max_new, 2)
        )
        spec = np.asarray(
            lookup_generate(model, params, x, mask01, max_new, 2, spec_width=w)
        )
        np.testing.assert_array_equal(base, spec)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_lookup_matches_greedy_across_prefixes(llm_setup, seed):
    model, params, _, mask01 = llm_setup
    x = jax.random.normal(jax.random.PRNGKey(100 + seed), (3, 12, model.cfg.hidden_size))
    base = np.asarray(greedy_generate(model, params, x, mask01, 16, 2))
    spec = np.asarray(lookup_generate(model, params, x, mask01, 16, 2, spec_width=4))
    np.testing.assert_array_equal(base, spec)


def test_lookup_with_int8_kv_cache(llm_setup):
    model, params, x, mask01 = llm_setup
    model_q = LlamaModel(model.cfg.replace(kv_quant="int8"), None)
    base = np.asarray(greedy_generate(model_q, params, x, mask01, 16, 2))
    spec = np.asarray(lookup_generate(model_q, params, x, mask01, 16, 2, spec_width=4))
    np.testing.assert_array_equal(base, spec)


def test_lookup_accepts_on_repetitive_model(llm_setup):
    """A constant-logits model generates a repeating token; the bigram
    lookup should accept nearly every draft, finishing in ~max_new/W
    iterations.  We can't count iterations through jit, but we CAN pin
    the output (all one token) and exactness."""
    model, params, x, mask01 = llm_setup
    # All-zero lm_head: every position's logits tie at 0, argmax is
    # always token 0 -> perfectly repetitive output, every bigram draft
    # verifies.
    lm = jnp.zeros_like(params["params"]["lm_head"]["kernel"])
    p = {"params": {**params["params"],
                    "lm_head": {**params["params"]["lm_head"], "kernel": lm}}}
    out = np.asarray(lookup_generate(model, p, x, mask01, 24, 2, spec_width=8))
    assert (out == 0).all()
    base = np.asarray(greedy_generate(model, p, x, mask01, 24, 2))
    np.testing.assert_array_equal(base, out)


def test_model_level_lookup_spec_identical():
    """XInstructBLIP end-to-end: cfg.lookup_spec produces identical
    strings to the plain greedy path."""
    from bench import make_batch
    from mraudio_tpu.models.xinstructblip import XInstructBLIP

    data_cfg = tiny_data_config(n_frms=4)
    base_cfg = tiny_model_config()
    model = XInstructBLIP(base_cfg, audio_cfg=data_cfg.audio)
    params = model.init_params(jax.random.PRNGKey(0))
    batch = make_batch(data_cfg, model, 2)
    base = model.generate(params, batch)

    model_s = XInstructBLIP(base_cfg.replace(lookup_spec=4), audio_cfg=data_cfg.audio)
    spec = model_s.generate(params, batch)
    assert base == spec


def test_videollama_lookup_spec_identical():
    """VideoLLaMA backbone: lookup_spec produces identical strings."""
    from bench import make_batch
    from mraudio_tpu.config import tiny_data_config
    from mraudio_tpu.models.videollama import VideoLLaMA, tiny_videollama_config

    data_cfg = tiny_data_config(n_frms=4)
    cfg = tiny_videollama_config()
    model = VideoLLaMA(cfg, audio_cfg=data_cfg.audio)
    params = model.init_params(jax.random.PRNGKey(0))
    batch = make_batch(data_cfg, model, 2)
    base = model.generate(params, batch)
    model_s = VideoLLaMA(cfg.replace(lookup_spec=4), audio_cfg=data_cfg.audio)
    spec = model_s.generate(params, batch)
    assert base == spec


def test_lookup_draft_prefers_history_then_hints():
    """Draft-source precedence: generated history wins when it has any
    match; the prompt hint stream is the cold-start fallback; repeat-cur
    when neither matches.  Hint padding is respected."""
    from mraudio_tpu.infer.generate import lookup_draft

    W = 4
    L = 8
    # row 0: history [5, 6, 7] with cur=5 -> history continuation [6, 7]
    #        (hints also contain 5 but must lose to history)
    # row 1: no history, hints [.., 5, 9, 8, ..] with cur=5 -> [9, 8, ...]
    # row 2: no history, no hint match, cur=5 -> repeat [5, 5, 5]
    tokens = jnp.asarray(np.full((3, L), 2, np.int32))
    tokens = tokens.at[0, :3].set(jnp.asarray([5, 6, 7]))
    emitted = jnp.asarray([3, 0, 0], jnp.int32)
    cur = jnp.asarray([5, 5, 5], jnp.int32)
    hint_ids = jnp.asarray([
        [1, 5, 3, 3, 3, 3],
        [1, 1, 5, 9, 8, 7],
        [1, 1, 1, 1, 1, 1],
    ], jnp.int32)
    hint_mask = jnp.asarray([
        [1, 1, 1, 1, 1, 1],
        [1, 1, 1, 1, 1, 0],   # last hint column padded
        [1, 1, 1, 1, 1, 1],
    ], jnp.int32)
    g = np.asarray(lookup_draft(tokens, emitted, cur, W, hint_ids, hint_mask))
    # row 0: [6, 7] then stale -> repeat cur
    np.testing.assert_array_equal(g[0], [6, 7, 5])
    # row 1: [9, 8] then padded hint column -> repeat cur
    np.testing.assert_array_equal(g[1], [9, 8, 5])
    # row 2: no source -> repeat cur
    np.testing.assert_array_equal(g[2], [5, 5, 5])

    # masked-out hint occurrences of cur must not match at all
    hint_mask2 = hint_mask.at[1, 2].set(0)
    g2 = np.asarray(lookup_draft(tokens, emitted, cur, W, hint_ids, hint_mask2))
    np.testing.assert_array_equal(g2[1], [5, 5, 5])


@pytest.mark.parametrize("w", [2, 4, 8])
def test_lookup_with_hints_matches_greedy(llm_setup, w):
    """Hint streams change drafting only — tokens stay bit-identical to
    greedy whatever the hints contain (including adversarial ones that
    match often but continue wrongly)."""
    model, params, x, mask01 = llm_setup
    b = x.shape[0]
    rng = np.random.default_rng(42)
    # adversarial hints: drawn from the same small vocab, so they match
    # the generated tokens frequently and draft wrong continuations
    hint_ids = jnp.asarray(rng.integers(0, 64, (b, 20)).astype(np.int32))
    hint_mask = jnp.asarray((rng.random((b, 20)) > 0.2).astype(np.int32))
    base = np.asarray(greedy_generate(model, params, x, mask01, 16, 2))
    spec = np.asarray(lookup_generate(
        model, params, x, mask01, 16, 2, spec_width=w,
        hint_ids=hint_ids, hint_mask=hint_mask,
    ))
    np.testing.assert_array_equal(base, spec)


def test_lookup_hints_accept_on_echo_model():
    """Acceptance-path coverage for prompt-lookup: with an all-zero
    lm_head the model emits token 0 forever; hints ending in a 0-run
    give first-step drafts that verify (the cold-start case history
    can't serve)."""
    from mraudio_tpu.config import tiny_model_config as _tiny

    cfg = _tiny().llm.replace(vocab_size=64)
    model = LlamaModel(cfg, None)
    s, d, b = 12, cfg.hidden_size, 2
    key = jax.random.PRNGKey(9)
    x = jax.random.normal(key, (b, s, d))
    mask01 = jnp.ones((b, s), jnp.int32)
    from mraudio_tpu.models.layers import positions_from_mask as _pos
    causal = (jnp.tril(jnp.ones((s, s), bool))[None, None]
              & mask01[:, None, None, :].astype(bool))
    params = {"params": model.init(
        key, x, causal, _pos(mask01), jnp.zeros((b, s), jnp.int32),
        method=LlamaModel.init_all,
    )["params"]}
    lm = jnp.zeros_like(params["params"]["lm_head"]["kernel"])
    p = {"params": {**params["params"],
                    "lm_head": {**params["params"]["lm_head"], "kernel": lm}}}
    hint_ids = jnp.zeros((b, 10), jnp.int32)      # 0-run: perfect drafts
    hint_mask = jnp.ones((b, 10), jnp.int32)
    out = np.asarray(lookup_generate(
        model, p, x, mask01, 24, 2, spec_width=8,
        hint_ids=hint_ids, hint_mask=hint_mask,
    ))
    assert (out == 0).all()
    base = np.asarray(greedy_generate(model, p, x, mask01, 24, 2))
    np.testing.assert_array_equal(base, out)
