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
