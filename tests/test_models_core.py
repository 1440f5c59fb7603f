"""Shape/behavior tests for the core model modules (tiny configs, CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mraudio_tpu.config import tiny_model_config
from mraudio_tpu.models.beats import BeatsEncoder, t5_relative_buckets
from mraudio_tpu.models.eva_vit import EvaViT
from mraudio_tpu.models.layers import positions_from_mask
from mraudio_tpu.models.llama import LlamaModel, init_cache
from mraudio_tpu.models.qformer import QFormer
from mraudio_tpu.text.tokenizer import ByteTokenizer


CFG = tiny_model_config()


@pytest.fixture(scope="module")
def key():
    return jax.random.PRNGKey(0)


def test_eva_vit_shapes(key):
    model = EvaViT(CFG.vit)
    images = jnp.zeros((3, 28, 28, 3), jnp.bfloat16)
    params = model.init(key, images)
    out = model.apply(params, images)
    assert out.shape == (3, CFG.vit.seq_len, CFG.vit.width)
    assert out.shape[1] == (28 // 14) ** 2 + 1


def test_beats_shapes(key):
    model = BeatsEncoder(CFG.beats)
    fbank = jnp.zeros((2, 32, 16), jnp.float32)
    params = model.init(key, fbank)
    out = model.apply(params, fbank)
    assert out.shape == (2, (32 // 4) * (16 // 4), CFG.beats.width)


def test_t5_buckets_symmetric_structure():
    rel = np.arange(-10, 11)[None, :]
    b = t5_relative_buckets(rel, 16, 32)
    assert b.min() >= 0 and b.max() < 16
    # positive and negative offsets use disjoint bucket halves
    assert set(b[0, :10]) & set(b[0, 11:]) == set()


def test_qformer_shapes(key):
    cfg = CFG.qformer
    model = QFormer(cfg)
    n, q, l, s = 2, cfg.num_query_tokens, 6, 10
    query = jnp.zeros((n, q, cfg.hidden_size), jnp.float32)
    ids = jnp.zeros((n, l), jnp.int32)
    mask = jnp.ones((n, l), jnp.int32)
    enc = jnp.zeros((n, s, CFG.vit.width), jnp.float32)
    params = model.init(key, query, ids, mask, enc)
    out = model.apply(params, query, ids, mask, enc)
    assert out.shape == (n, q + l, cfg.hidden_size)


def test_qformer_text_mask_affects_queries(key):
    """Queries self-attend text, so masking text must change outputs."""
    cfg = CFG.qformer
    model = QFormer(cfg)
    n, l, s = 1, 6, 10
    rngs = jax.random.split(key, 3)
    query = jax.random.normal(rngs[0], (n, cfg.num_query_tokens, cfg.hidden_size))
    ids = jax.random.randint(rngs[1], (n, l), 0, cfg.vocab_size)
    enc = jax.random.normal(rngs[2], (n, s, CFG.vit.width))
    params = model.init(key, query, ids, jnp.ones((n, l), jnp.int32), enc)
    full = model.apply(params, query, ids, jnp.ones((n, l), jnp.int32), enc)
    masked = model.apply(params, query, ids, jnp.zeros((n, l), jnp.int32), enc)
    assert not np.allclose(np.asarray(full[:, : cfg.num_query_tokens], np.float32),
                           np.asarray(masked[:, : cfg.num_query_tokens], np.float32))


def test_positions_from_mask_left_padding():
    mask = jnp.array([[0, 0, 1, 1, 1], [1, 1, 1, 1, 1]])
    pos = positions_from_mask(mask)
    np.testing.assert_array_equal(pos, [[0, 0, 0, 1, 2], [0, 1, 2, 3, 4]])


def _causal_mask(attention_mask):
    n = attention_mask.shape[-1]
    causal = jnp.tril(jnp.ones((n, n), bool))
    return causal[None, None] & attention_mask[:, None, None, :].astype(bool)


def test_llama_forward_and_cache_consistency(key):
    cfg = CFG.llm
    model = LlamaModel(cfg, CFG.lora)
    b, s = 2, 10
    embeds = jax.random.normal(key, (b, s, cfg.hidden_size), jnp.float32)
    mask01 = jnp.ones((b, s), jnp.int32)
    positions = positions_from_mask(mask01)
    params = model.init(key, embeds, _causal_mask(mask01), positions)

    # Full forward.
    logits_full, _ = model.apply(params, embeds, _causal_mask(mask01), positions)
    assert logits_full.shape == (b, s, cfg.vocab_size)
    assert logits_full.dtype == jnp.float32

    # Prefill s-1 tokens, then one cached decode step == full forward last row.
    max_len = 16
    cache = init_cache(cfg, b, max_len)
    prefix_mask = jnp.zeros((b, max_len), jnp.int32).at[:, : s - 1].set(1)
    # Prefill attends causally over cache positions [0, s-1).
    q_idx = jnp.arange(s - 1)[:, None]
    k_idx = jnp.arange(max_len)[None, :]
    pre_attend = jnp.broadcast_to((k_idx <= q_idx)[None, None], (b, 1, s - 1, max_len))
    logits_pre, cache = model.apply(
        params, embeds[:, : s - 1], pre_attend, positions[:, : s - 1],
        cache=cache, cache_index=0,
    )
    step_mask = prefix_mask.at[:, s - 1].set(1)[:, None, None, :].astype(bool)
    logits_step, cache = model.apply(
        params, embeds[:, s - 1 :], step_mask, positions[:, s - 1 :],
        cache=cache, cache_index=s - 1,
    )
    np.testing.assert_allclose(
        np.asarray(logits_step[:, 0]), np.asarray(logits_full[:, -1]),
        rtol=2e-2, atol=2e-2,
    )


def test_llama_left_padding_equivalence(key):
    """Left-padded batch rows must produce the same last-token logits as
    the unpadded sequence — the property that makes static-shape
    tokenization equivalent to the reference's 'longest' padding."""
    cfg = CFG.llm
    model = LlamaModel(cfg, CFG.lora)
    s, pad = 6, 3
    x = jax.random.normal(key, (1, s, cfg.hidden_size), jnp.float32)
    mask_nopad = jnp.ones((1, s), jnp.int32)
    params = model.init(key, x, _causal_mask(mask_nopad), positions_from_mask(mask_nopad))
    logits_ref, _ = model.apply(params, x, _causal_mask(mask_nopad), positions_from_mask(mask_nopad))

    x_padded = jnp.concatenate([jnp.zeros((1, pad, cfg.hidden_size)), x], axis=1)
    mask_pad = jnp.concatenate([jnp.zeros((1, pad), jnp.int32), mask_nopad], axis=1)
    logits_pad, _ = model.apply(
        params, x_padded, _causal_mask(mask_pad), positions_from_mask(mask_pad)
    )
    np.testing.assert_allclose(
        np.asarray(logits_pad[0, -1]), np.asarray(logits_ref[0, -1]),
        rtol=2e-2, atol=2e-2,
    )


def test_llama_lora_params_exist_and_head_untouched(key):
    cfg = CFG.llm
    model = LlamaModel(cfg, CFG.lora)
    x = jnp.zeros((1, 4, cfg.hidden_size))
    m = jnp.ones((1, 4), jnp.int32)
    params = model.init(key, x, _causal_mask(m), positions_from_mask(m))
    flat = jax.tree_util.tree_leaves_with_path(params)
    paths = ["/".join(str(p) for p in path) for path, _ in flat]
    assert any("lora_a" in p and "q_proj" in p for p in paths)
    assert any("lora_a" in p and "down_proj" in p for p in paths)
    # reference excludes lm_head from LoRA (models/model_utils.py:21-22)
    assert not any("lora" in p and "lm_head" in p for p in paths)


def test_byte_tokenizer_roundtrip():
    tok = ByteTokenizer()
    s = "Query: hello\n[[1, 2]]"
    assert tok.decode(tok.encode(s)) == s
    enc = tok(["ab", "cdef"], max_length=6, padding_side="left")
    assert enc.input_ids.shape == (2, 6)
    np.testing.assert_array_equal(enc.attention_mask[0], [0, 0, 0, 0, 1, 1])
    # eos repair semantics: id 0 exists and differs from eos
    assert tok.eos_token_id == 2 and tok.pad_token_id == 259
