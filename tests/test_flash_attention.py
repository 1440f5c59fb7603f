"""Flash-attention kernel vs. the einsum reference (interpret mode, CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mraudio_tpu.ops.attention import flash_attention


def _reference(q, k, v, mask, causal=True):
    b, h, s, d = q.shape
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) / np.sqrt(d)
    m = mask[:, None, None, :].astype(bool)
    if causal:
        m = m & jnp.tril(jnp.ones((s, s), bool))[None, None]
    logits = jnp.where(m, logits, -1e30)
    probs = jax.nn.softmax(logits, axis=-1)
    # zero rows that attend nothing (all -inf): softmax gives uniform there
    any_valid = m.any(axis=-1, keepdims=True)
    probs = jnp.where(any_valid, probs, 0.0)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v.astype(jnp.float32))


@pytest.mark.parametrize("s,block", [(256, 128), (200, 128), (64, 32)])
def test_flash_matches_reference(s, block):
    rng = np.random.default_rng(0)
    b, h, d = 2, 3, 32
    q = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    mask = np.ones((b, s), np.int32)
    # interior padding (timestamp-slot style) + left padding
    mask[0, 10:20] = 0
    mask[1, :7] = 0
    mask = jnp.asarray(mask)

    out = flash_attention(q, k, v, mask, causal=True,
                          block_q=block, block_k=block, interpret=True)
    ref = _reference(q, k, v, mask, causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_flash_non_causal():
    rng = np.random.default_rng(1)
    b, h, s, d = 1, 2, 128, 32
    q = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    mask = jnp.ones((b, s), jnp.int32)
    out = flash_attention(q, k, v, mask, causal=False,
                          block_q=64, block_k=64, interpret=True)
    ref = _reference(q, k, v, mask, causal=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_flash_bf16_io():
    rng = np.random.default_rng(2)
    b, h, s, d = 1, 2, 128, 64
    q = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16)
    mask = jnp.ones((b, s), jnp.int32)
    out = flash_attention(q, k, v, mask, interpret=True)
    assert out.dtype == jnp.bfloat16
    ref = _reference(q.astype(jnp.float32), k.astype(jnp.float32),
                     v.astype(jnp.float32), mask)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), rtol=3e-2, atol=3e-2
    )


def test_fully_masked_query_rows_zero():
    rng = np.random.default_rng(3)
    b, h, s, d = 1, 1, 64, 32
    q = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    mask = np.ones((b, s), np.int32)
    mask[0, 0] = 0  # row 0 attends nothing under causal+invalid
    out = flash_attention(q, k, v, jnp.asarray(mask), causal=True,
                          block_q=32, block_k=32, interpret=True)
    np.testing.assert_allclose(np.asarray(out)[0, :, 0], 0.0, atol=1e-6)


@pytest.mark.parametrize("s,kv_extra", [(256, 0), (200, 56), (64, 64)])
def test_chunked_matches_reference(s, kv_extra):
    from mraudio_tpu.ops.attention import chunked_attention

    rng = np.random.default_rng(5)
    b, h, d = 2, 3, 32
    kv = s + kv_extra  # rectangular: prefill over a longer (padded) cache
    q = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, kv, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, kv, d)), jnp.float32)
    mask = np.ones((b, kv), np.int32)
    mask[0, 10:20] = 0
    mask[1, :7] = 0
    mask[:, s:] = 0  # cache tail not yet written
    mask = jnp.asarray(mask)

    out = chunked_attention(q, k, v, mask, causal=True, block_k=64)
    ref = _reference(q, k[:, :, :s], v[:, :, :s], mask[:, :s], causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("s,kv_extra", [(256, 0), (200, 56), (64, 64)])
def test_chunked_unroll_matches_reference(s, kv_extra):
    """The statically-unrolled q-tile path (generate prefill) is exact."""
    from mraudio_tpu.ops.attention import chunked_attention

    rng = np.random.default_rng(7)
    b, h, d = 2, 3, 32
    kv = s + kv_extra
    q = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, kv, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, kv, d)), jnp.float32)
    mask = np.ones((b, kv), np.int32)
    mask[0, 10:20] = 0
    mask[1, :7] = 0
    mask[:, s:] = 0
    mask = jnp.asarray(mask)

    out = chunked_attention(q, k, v, mask, causal=True, block_k=64,
                            unroll_q=True)
    scan = chunked_attention(q, k, v, mask, causal=True, block_k=64)
    ref = _reference(q, k[:, :, :s], v[:, :, :s], mask[:, :s], causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)
    # bit-identical to the scanned path (same tile math, same order)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(scan))


def test_chunked_unroll_non_causal_and_grads():
    from mraudio_tpu.ops.attention import chunked_attention

    rng = np.random.default_rng(8)
    b, h, s, d = 1, 2, 96, 32
    q = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    mask = jnp.ones((b, s), jnp.int32)

    out = chunked_attention(q, k, v, mask, causal=False, block_k=32,
                            block_q=32, unroll_q=True)
    ref = _reference(q, k, v, mask, causal=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)

    def loss(fn_kwargs):
        def f(args):
            q, k, v = args
            o = chunked_attention(q, k, v, mask, causal=True, block_k=32,
                                  block_q=32, **fn_kwargs)
            return jnp.sum(o * o)
        return jax.grad(f)((q, k, v))

    g_unroll = loss({"unroll_q": True})
    g_scan = loss({})
    for gu, gs in zip(g_unroll, g_scan):
        np.testing.assert_allclose(np.asarray(gu), np.asarray(gs),
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("unroll", [False, True])
def test_chunked_kv_bshd_layout(unroll):
    """Cache-native (B, KV, H, D) K/V layout gives the same output as
    the (B, H, KV, D) layout."""
    from mraudio_tpu.ops.attention import chunked_attention

    rng = np.random.default_rng(11)
    b, h, s, d = 2, 3, 200, 32
    kv = 256
    q = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, kv, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, kv, d)), jnp.float32)
    mask = np.ones((b, kv), np.int32)
    mask[0, 10:20] = 0
    mask[:, s:] = 0
    mask = jnp.asarray(mask)

    ref = chunked_attention(q, k, v, mask, causal=True, block_k=64,
                            unroll_q=unroll)
    out = chunked_attention(
        q, k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3), mask,
        causal=True, block_k=64, unroll_q=unroll, kv_bshd=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    # q/out natural layout too
    out2 = chunked_attention(
        q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3), mask,
        causal=True, block_k=64, unroll_q=unroll, kv_bshd=True, q_bshd=True,
    )
    np.testing.assert_allclose(
        np.asarray(out2.transpose(0, 2, 1, 3)), np.asarray(ref),
        rtol=2e-5, atol=2e-5,
    )


def test_chunked_int8_kv_scales_match_dequant():
    """Per-tile scale folding over an int8 K/V cache equals attention
    over the dequantized cache."""
    from mraudio_tpu.models.llama import quantize_kv
    from mraudio_tpu.ops.attention import chunked_attention

    rng = np.random.default_rng(9)
    b, h, s, d = 2, 2, 192, 32
    q = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    mask = np.ones((b, s), np.int32)
    mask[0, 30:40] = 0
    mask = jnp.asarray(mask)

    # quantize along the head-dim axis, as the KV cache does ((B,S,H,D)
    # layout there; here already (B,H,S,D) so axes line up directly)
    kq, ks = quantize_kv(k)
    vq, vs = quantize_kv(v)
    k_deq = kq.astype(jnp.float32) * ks[..., None]
    v_deq = vq.astype(jnp.float32) * vs[..., None]

    ref = chunked_attention(q, k_deq, v_deq, mask, causal=True, block_k=64)
    out = chunked_attention(q, kq, vq, mask, causal=True, block_k=64,
                            k_scale=ks, v_scale=vs, unroll_q=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_mlp_seq_chunk_matches_plain():
    """Sequence-chunked MLP (nn.scan over token tiles) returns the same
    values and creates the identical param tree as the plain pass."""
    from mraudio_tpu.config import LlamaConfig, LoraConfig
    from mraudio_tpu.models.llama import LlamaMlp

    cfg = LlamaConfig(hidden_size=32, intermediate_size=64, num_layers=1,
                      num_heads=4, num_kv_heads=4, vocab_size=64,
                      dtype="float32")
    lora = LoraConfig(rank=2, alpha=2)
    rng = np.random.default_rng(12)
    x = jnp.asarray(rng.standard_normal((2, 10, 32)), jnp.float32)

    plain = LlamaMlp(cfg, lora)
    chunked = LlamaMlp(cfg.replace(mlp_seq_chunk=4), lora)
    params = plain.init(jax.random.PRNGKey(0), x)
    params_c = chunked.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(params_c)

    y0 = plain.apply(params, x)
    y1 = chunked.apply(params, x)  # same params drive both paths
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               rtol=2e-5, atol=2e-5)

    # gradients through the scanned path match the plain path
    def loss(fn):
        return jax.grad(
            lambda p: jnp.sum(fn.apply(p, x) ** 2)
        )(params)

    g0, g1 = loss(plain), loss(chunked)
    for (k0, a), (k1, b) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(g0), key=lambda kv: str(kv[0])),
        sorted(jax.tree_util.tree_leaves_with_path(g1), key=lambda kv: str(kv[0])),
    ):
        assert str(k0) == str(k1)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_chunked_equals_pallas_interpret():
    from mraudio_tpu.ops.attention import chunked_attention

    rng = np.random.default_rng(6)
    b, h, s, d = 1, 2, 128, 32
    q = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    mask = jnp.ones((b, s), jnp.int32)
    a = chunked_attention(q, k, v, mask, causal=True, block_k=64)
    p = flash_attention(q, k, v, mask, causal=True, block_q=64, block_k=64,
                        interpret=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(p), rtol=2e-5, atol=2e-5)
