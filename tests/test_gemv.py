"""Order-preserving Pallas decode GEMV (ops/gemv.py).

Mosaic cannot compile through this build host's remote tunnel
(CLAUDE.md), so the kernel runs in interpret mode here; what IS
verified is (a) the math matches ``LlamaLinear`` per path, (b) the f32
accumulation order is the documented fixed ascending-k order (the
property split-K breaks), and (c) a tiny decode loop emits
token-identical streams with ``decode_gemv="pallas"`` vs the XLA path.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mraudio_tpu.config import LlamaConfig
from mraudio_tpu.ops.gemv import decode_gemv, supports


def test_supports_production_dims():
    assert supports(4096, 4096)          # q/k/v/o
    assert supports(4096, 11008)         # gate/up
    assert supports(11008, 4096)         # down
    assert not supports(4096, 32008)     # padded lm_head: 32008 = 8*4001
    assert supports(64, 192)             # tiny test dims: one tile


def test_float_path_matches_llamalinear_math():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, 1024)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((1024, 1536)), jnp.bfloat16)
    ref = jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(jnp.bfloat16)
    y = decode_gemv(x, w, interpret=True)
    # multi-k-tile f32 partial sums can differ from the one-shot dot at
    # the last bf16 ulp; bound it tightly
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(ref, np.float32),
        rtol=0, atol=2e-3,
    )


def test_int8_path_bit_exact():
    """Integer-valued products accumulate exactly in f32 regardless of
    order — the production (int8 deploy config) decode path is
    bit-identical to the XLA formulation."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((4, 1024)), jnp.bfloat16)
    wq = jnp.asarray(rng.integers(-127, 128, (1024, 1536)), jnp.int8)
    scale = jnp.asarray(rng.uniform(0.001, 0.02, 1536), jnp.float32)
    acc = jax.lax.dot_general(
        x, wq.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ref = (acc * scale).astype(jnp.bfloat16)
    y = decode_gemv(x, wq, scale, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(y, np.float32), np.asarray(ref, np.float32)
    )


def test_accumulation_order_is_fixed_ascending_k():
    """The kernel's f32 partial sums must reproduce an explicit
    ascending-k-tile reduction BIT-EXACTLY — the order-preservation
    property (split-K reorders this and lands elsewhere)."""
    rng = np.random.default_rng(2)
    K, N, bk = 1024, 512, 256
    x = jnp.asarray(rng.standard_normal((2, K)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((K, N)), jnp.bfloat16)

    acc = jnp.zeros((2, N), jnp.float32)
    for k0 in range(0, K, bk):
        acc = acc + jnp.dot(
            x[:, k0:k0 + bk], w[k0:k0 + bk],
            preferred_element_type=jnp.float32,
        )
    ref_ordered = acc.astype(jnp.bfloat16)

    y = decode_gemv(x, w, block_k=bk, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(y, np.float32), np.asarray(ref_ordered, np.float32)
    )
    # and the order is block-size-independent for integer weights
    wq = jnp.asarray(rng.integers(-8, 8, (K, N)), jnp.int8)
    s = jnp.ones((N,), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(decode_gemv(x, wq, s, block_k=128, interpret=True)),
        np.asarray(decode_gemv(x, wq, s, block_k=512, interpret=True)),
    )


def _decode_sim(cfg, steps=6):
    """Greedy decode loop over a tiny LlamaModel — the engine's per-step
    shape (B rows, q_len 1)."""
    from mraudio_tpu.infer.generate import greedy_generate
    from mraudio_tpu.models.layers import positions_from_mask
    from mraudio_tpu.models.llama import LlamaModel

    model = LlamaModel(cfg, None)
    s, d = 8, cfg.hidden_size
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, s, d))
    mask01 = jnp.ones((2, s), jnp.int32)
    causal = (jnp.tril(jnp.ones((s, s), bool))[None, None]
              & mask01[:, None, None, :].astype(bool))
    params = {
        "params": model.init(
            key, x, causal, positions_from_mask(mask01),
            jnp.zeros((2, s), jnp.int32), method=LlamaModel.init_all,
        )["params"]
    }
    toks = greedy_generate(
        model, params, x.astype(jnp.bfloat16), mask01, steps, eos_id=2
    )
    return np.asarray(toks)


def test_token_parity_pallas_vs_xla_decode():
    """Same params, same inputs: decode_gemv='pallas' (interpret) and
    the XLA path emit identical token streams.  hidden=256 → single
    k-tile per projection → the accumulation orders coincide exactly."""
    base = LlamaConfig(
        vocab_size=384, hidden_size=256, num_layers=2, num_heads=4,
        num_kv_heads=4, intermediate_size=512, max_seq_len=64,
    )
    t_xla = _decode_sim(base)
    t_pal = _decode_sim(base.replace(decode_gemv="pallas"))
    np.testing.assert_array_equal(t_xla, t_pal)


def test_prefill_rows_stay_on_xla():
    """> 32 rows (prefill/training shapes) must not route through the
    GEMV kernel — LlamaLinear's gate checks the flattened row count."""
    from mraudio_tpu.models.llama import LlamaLinear

    cfg = LlamaConfig(
        vocab_size=384, hidden_size=256, num_layers=1, num_heads=4,
        num_kv_heads=4, intermediate_size=512, decode_gemv="pallas",
    )
    lin = LlamaLinear(256, cfg)
    assert not lin._pallas_gemv_ok(jnp.zeros((2, 40, 256)), 256)
    assert lin._pallas_gemv_ok(jnp.zeros((2, 1, 256)), 256)
    assert lin._pallas_gemv_ok(jnp.zeros((4, 8, 256)), 256)  # spec verify
