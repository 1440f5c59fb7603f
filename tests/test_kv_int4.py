"""int4 KV cache (LlamaConfig.kv_quant="int4").

The reference has no KV quantization at all (HF fp16 cache); int8 is
this framework's serving default and int4 is the opt-in next notch
(nibble-packed pairs along head_dim, per-(row, position, head) absmax
scales).  These tests pin the pack/unpack bit layout, the quantizer's
reconstruction error, and that the full generate path runs end to end
on a packed cache with tokens close to the float-cache decode.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mraudio_tpu.config import tiny_model_config
from mraudio_tpu.models.layers import positions_from_mask
from mraudio_tpu.models.llama import (
    LlamaModel,
    init_cache,
    quantize_kv4,
)
from mraudio_tpu.ops.attention import pack_int4, unpack_int4


def test_pack_unpack_roundtrip_exact():
    rng = np.random.default_rng(0)
    q = rng.integers(-8, 8, (3, 5, 4, 16), dtype=np.int8)
    packed = pack_int4(jnp.asarray(q))
    assert packed.dtype == jnp.uint8
    assert packed.shape == (3, 5, 4, 8)
    out = np.asarray(unpack_int4(packed))
    np.testing.assert_array_equal(out, q)


def test_quantize_kv4_reconstruction():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 7, 4, 32)).astype(np.float32))
    packed, scale = quantize_kv4(x)
    assert packed.shape == (2, 7, 4, 16) and scale.shape == (2, 7, 4)
    recon = unpack_int4(packed).astype(np.float32) * np.asarray(scale)[..., None]
    # absmax/7 on a 32-wide head row: worst-case half-step error
    err = np.abs(recon - np.asarray(x))
    bound = np.asarray(scale)[..., None] * 0.5 + 1e-6
    assert (err <= bound).all()
    # zero rows stay representable (scale forced to 1, values 0)
    z, zs = quantize_kv4(jnp.zeros((1, 2, 1, 8)))
    assert np.asarray(unpack_int4(z)).sum() == 0 and float(zs.min()) == 1.0


def _tiny_llm(dtype="float32", **kw):
    cfg = tiny_model_config().llm.replace(dtype=dtype, **kw)
    model = LlamaModel(cfg, None)
    b, s = 2, 10
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (b, s, cfg.hidden_size)) * 0.3
    mask01 = jnp.ones((b, s), jnp.int32)
    attend = (
        jnp.tril(jnp.ones((s, s), bool))[None, None]
        & mask01[:, None, None, :].astype(bool)
    )
    params = {"params": model.init(
        jax.random.PRNGKey(1), x, attend, positions_from_mask(mask01),
        jnp.zeros((b, s), jnp.int32), method=LlamaModel.init_all,
    )["params"]}
    return cfg, model, params, x, mask01


def test_int4_kv_cache_decode_close_to_float():
    from mraudio_tpu.infer.generate import greedy_generate

    cfg, model, params, x, mask01 = _tiny_llm()
    toks_f = greedy_generate(model, params, x, mask01, 8, eos_id=2)
    model_q = LlamaModel(cfg.replace(kv_quant="int4"), None)
    toks_q = greedy_generate(model_q, params, x, mask01, 8, eos_id=2)
    # int4 is coarser than int8; greedy argmax should still mostly agree
    # on a tiny model with mild activations
    assert (np.asarray(toks_f) == np.asarray(toks_q)).mean() > 0.6

    cache = init_cache(cfg.replace(kv_quant="int4"), 2, 16)
    assert cache[0]["k"].dtype == jnp.uint8
    # packed leaves store trailing (H, D/2) merged (lane-aligned: a 4D
    # u8[..., H, D/2] leaf pads 2x on TPU when D/2 < 128)
    assert cache[0]["k"].shape == (
        2, 16, cfg.num_kv_heads * cfg.head_dim // 2
    )
    # scales store (B, H, S) — sequence on the lane axis (H=32 lanes of
    # a 128 tile would pad 4x)
    assert cache[0]["k_scale"].shape == (2, cfg.num_kv_heads, 16)


def test_int4_kv_attention_matches_manual_dequant():
    """One cached decode step over an int4 cache == dense attention over
    the dequantized cache (exact: same f32 logits path)."""
    cfg, model, params, x, mask01 = _tiny_llm(kv_quant="int4")
    b, s = x.shape[:2]
    attend = (
        jnp.tril(jnp.ones((s, s), bool))[None, None]
        & mask01[:, None, None, :].astype(bool)
    )
    pos = positions_from_mask(mask01)
    alloc = s + 4
    cache = init_cache(cfg, b, alloc)
    full_mask = jnp.zeros((b, alloc), jnp.int32).at[:, :s].set(mask01)
    k_idx = jnp.arange(alloc)[None, :]
    attend_pf = ((k_idx <= jnp.arange(alloc)[:, None])[None, None, :s]
                 & full_mask[:, None, None, :].astype(bool))
    logits_q, cache = model.apply(
        params, x, attend_pf, pos, cache=cache, cache_index=0,
        kv_valid=full_mask, causal=True,
    )
    # manual dequant of layer-0 K matches the bf16 K the write saw
    # (merged leaf: reshape back to heads before unpacking)
    kq = unpack_int4(
        cache[0]["k"][:, :s].reshape(
            b, s, cfg.num_kv_heads, cfg.head_dim // 2
        )
    )
    ks = np.asarray(cache[0]["k_scale"][:, :, :s]).transpose(0, 2, 1)
    recon = kq.astype(np.float32) * ks[..., None]
    assert np.isfinite(recon).all() and np.abs(recon).max() > 0

    # a decode step over the packed cache produces finite logits and
    # matches the same step over an int8 cache within int4's error
    step = jax.random.normal(jax.random.PRNGKey(3), (b, 1, cfg.hidden_size)) * 0.3
    mask_dec = full_mask.at[:, s].set(1)
    out4, _ = model.apply(
        params, step, mask_dec[:, None, None, :].astype(bool),
        pos[:, -1:] + 1, cache=cache, cache_index=s, kv_valid=mask_dec,
    )
    model8 = LlamaModel(cfg.replace(kv_quant="int8"), None)
    cache8 = init_cache(cfg.replace(kv_quant="int8"), b, alloc)
    _, cache8 = model8.apply(
        params, x, attend_pf, pos, cache=cache8, cache_index=0,
        kv_valid=full_mask, causal=True,
    )
    out8, _ = model8.apply(
        params, step, mask_dec[:, None, None, :].astype(bool),
        pos[:, -1:] + 1, cache=cache8, cache_index=s, kv_valid=mask_dec,
    )
    f4, f8 = np.asarray(out4, np.float32), np.asarray(out8, np.float32)
    assert np.isfinite(f4).all()
    # same direction of logits: int4 vs int8 top-1 mostly agrees
    assert (f4.argmax(-1) == f8.argmax(-1)).mean() > 0.5


def test_int4_gqa_repeat_order():
    """The merged-layout GQA repeat (un-merge -> repeat -> re-merge)
    must interleave heads exactly like the unpacked-cache repeat:
    head g of the packed cache expands to query heads [g*rep, (g+1)*rep).
    A scrambled order here would silently pair every query head with the
    wrong kv head."""
    rng = np.random.default_rng(2)
    b, s, kv_h, d, rep = 2, 6, 2, 16, 2
    h, half = kv_h * rep, d // 2
    kq = jnp.asarray(rng.integers(-8, 8, (b, s, kv_h, d), dtype=np.int8))
    packed = pack_int4(kq)  # (b, s, kv_h, d/2)
    merged = packed.reshape(b, s, -1)
    # the llama.py packed-GQA path
    out = jnp.repeat(
        merged.reshape(b, s, kv_h, half), rep, axis=2
    ).reshape(b, s, h * half)
    want = jnp.repeat(packed, rep, axis=2)  # plain 4D repeat (oracle)
    np.testing.assert_array_equal(
        np.asarray(unpack_int4(out.reshape(b, s, h, half))),
        np.asarray(unpack_int4(want)),
    )


def test_int4_gqa_decode_close_to_int8():
    """End-to-end decode on a GQA (kv_h < h) int4 cache: if the merged
    layout's head bookkeeping were wrong, logits would be noise and the
    int8 agreement below would collapse to ~1/vocab."""
    cfg, model, params, x, mask01 = _tiny_llm(num_kv_heads=2)
    from mraudio_tpu.infer.generate import greedy_generate

    toks8 = greedy_generate(
        LlamaModel(cfg.replace(kv_quant="int8"), None), params, x, mask01,
        8, eos_id=2,
    )
    toks4 = greedy_generate(
        LlamaModel(cfg.replace(kv_quant="int4"), None), params, x, mask01,
        8, eos_id=2,
    )
    assert (np.asarray(toks8) == np.asarray(toks4)).mean() > 0.6


@pytest.mark.parametrize("scan", [False, True])
def test_int4_generate_in_xinstructblip(scan):
    """Full assembly generate runs on the packed cache (both the
    per-layer loop and the nn.scan stack)."""
    from mraudio_tpu.config import tiny_data_config
    from mraudio_tpu.data.dataset import Batch
    from mraudio_tpu.models.xinstructblip import XInstructBLIP

    model_cfg = tiny_model_config()
    model_cfg = model_cfg.replace(
        llm=model_cfg.llm.replace(kv_quant="int4", scan_layers=scan)
    )
    data_cfg = tiny_data_config(n_frms=4)
    model = XInstructBLIP(model_cfg, audio_cfg=data_cfg.audio)
    params = model.init_params(jax.random.PRNGKey(0))

    n_frms, b = 4, 2
    rng = np.random.default_rng(0)
    hop, win = data_cfg.audio.hop_length, data_cfg.audio.win_length
    num_samples = hop * (n_frms * data_cfg.audio.mel_frames_per_chunk - 1) + win
    batch = Batch(
        video=rng.integers(0, 256, (b, n_frms, 28, 28, 3), dtype=np.uint8),
        audio=rng.uniform(-1, 1, (b, num_samples)).astype(np.float32),
        timestamps=np.tile(np.arange(n_frms, dtype=np.int32)[None] * 2, (b, 1)),
        duration=[150] * b, text_input=["Query: x\n"] * b,
        text_output=["[[1, 2]]"] * b, qid=list(range(b)),
        query=["x"] * b, vid=["v"] * b, valid=np.ones(b, bool),
    )
    out = model.generate(params, batch)
    assert len(out) == 2 and all(isinstance(t, str) for t in out)


def test_int4_kv_cache_in_serving_engine():
    """Continuous batcher on a PACKED cache: the slot scatter copies the
    merged uint8 leaves and the (slots, H, max_len) scale leaves, and the
    per-row decode write lands each token's nibbles and scales at its own
    column (models/llama.py write/write_scale under per_row_index)."""
    from mraudio_tpu.infer.serving import ContinuousBatcher, Request

    cfg = tiny_model_config().llm.replace(dtype="float32", kv_quant="int4")
    model = LlamaModel(cfg, None)
    s, d = 6, cfg.hidden_size
    x = jax.random.normal(jax.random.PRNGKey(0), (1, s, d)) * 0.3
    mask01 = jnp.ones((1, s), jnp.int32)
    attend = (
        jnp.tril(jnp.ones((s, s), bool))[None, None]
        & mask01[:, None, None, :].astype(bool)
    )
    params = {"params": model.init(
        jax.random.PRNGKey(1), x, attend, positions_from_mask(mask01),
        jnp.zeros((1, s), jnp.int32), method=LlamaModel.init_all,
    )["params"]}

    engine = ContinuousBatcher(model, params, prefix_len=s, max_new_tokens=4,
                               eos_id=2, max_slots=2)
    # packed slot cache: merged uint8 leaves, lane-aligned scale leaves
    lay0 = engine.cache[0] if isinstance(engine.cache, list) else engine.cache
    assert lay0["k"].dtype == jnp.uint8
    assert lay0["k"].shape[-1] == cfg.num_kv_heads * cfg.head_dim // 2
    assert lay0["k_scale"].shape[1] == cfg.num_kv_heads

    rng = np.random.default_rng(0)
    for rid in range(2):
        emb = rng.standard_normal((s, d)).astype(np.float32) * 0.3
        assert engine.submit(Request(rid, emb, np.ones(s, np.int32)))
    done = engine.run_to_completion()
    assert {c.request_id for c in done} == {0, 1}
    assert all(1 <= len(c.token_ids) <= 4 for c in done)
