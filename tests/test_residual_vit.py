"""Temporal-residual EVA-ViT (keyframe_interval > 1) — exactness limits,
shape contract, and end-to-end generate wiring."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mraudio_tpu.config import ViTConfig, tiny_model_config, tiny_data_config
from mraudio_tpu.models.eva_vit import EvaViT


def _tiny_vit(**kw) -> ViTConfig:
    return ViTConfig(
        image_size=28, patch_size=14, width=32, depth=2, num_heads=2,
        mlp_dim=64, dtype="float32", **kw
    )


def _frames(b, t, size, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.normal(size=(b, 1, size, size, 3)).astype(np.float32)
    drift = 0.05 * rng.normal(size=(b, t, size, size, 3)).astype(np.float32)
    return jnp.asarray((base + drift).reshape(b * t, size, size, 3))


def test_residual_all_tokens_matches_full():
    """R = num_patches recomputes every patch → equal to the plain path
    (token order inside attention is a permutation; outputs are
    scattered back to original positions)."""
    cfg = _tiny_vit()  # 2x2 grid -> 4 patches
    b, t = 2, 4
    x = _frames(b, t, cfg.image_size)

    plain = EvaViT(cfg)
    params = plain.init(jax.random.PRNGKey(0), x[:1])

    res_cfg = cfg.replace(keyframe_interval=2, residual_tokens=cfg.num_patches)
    out_res = EvaViT(res_cfg).apply(params, x, n_frms=t)
    out_full = plain.apply(params, x)
    np.testing.assert_allclose(
        np.asarray(out_res), np.asarray(out_full), rtol=2e-5, atol=2e-5
    )


def test_residual_keyframes_exact_others_approx():
    cfg = _tiny_vit(keyframe_interval=3, residual_tokens=1)
    b, t = 1, 6
    x = _frames(b, t, cfg.image_size, seed=1)

    model = EvaViT(cfg)
    params = model.init(jax.random.PRNGKey(0), x[:1])
    out = np.asarray(model.apply(params, x, n_frms=t)).reshape(
        b, t, cfg.seq_len, cfg.width
    )
    full = np.asarray(
        model.apply(params, x)  # n_frms omitted -> plain path
    ).reshape(b, t, cfg.seq_len, cfg.width)

    for i in (0, 3):  # keyframes exact
        np.testing.assert_allclose(out[:, i], full[:, i], rtol=2e-5, atol=2e-5)
    # non-key frames: approximate but not the keyframe's verbatim copy
    assert not np.allclose(out[:, 1], out[:, 0])
    # cls token is recomputed on every frame
    assert not np.allclose(out[:, 1, 0], out[:, 0, 0])


def test_residual_shape_and_jit():
    cfg = _tiny_vit(keyframe_interval=4, residual_tokens=2)
    b, t = 2, 5  # t not divisible by interval
    x = _frames(b, t, cfg.image_size, seed=2)
    model = EvaViT(cfg)
    params = model.init(jax.random.PRNGKey(0), x[:1])
    fn = jax.jit(lambda p, x: model.apply(p, x, n_frms=t))
    out = fn(params, x)
    assert out.shape == (b * t, cfg.seq_len, cfg.width)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_generate_with_residual_vit():
    """End to end: the assembly passes n_frms and generate still works."""
    from mraudio_tpu.models.xinstructblip import XInstructBLIP
    from bench import make_batch

    model_cfg = tiny_model_config()
    model_cfg = model_cfg.replace(
        vit=model_cfg.vit.replace(keyframe_interval=2, residual_tokens=2)
    )
    data_cfg = tiny_data_config(n_frms=4)
    model = XInstructBLIP(model_cfg, audio_cfg=data_cfg.audio)
    params = model.init_params(jax.random.PRNGKey(0))
    batch = make_batch(data_cfg, model, 2)
    texts = model.generate(params, batch)
    assert len(texts) == 2


def test_encode_clips_per_pass_equivalent():
    """Grouped (lax.map) encoding returns the same modal tokens as the
    single-fold pass."""
    from mraudio_tpu.models.xinstructblip import XInstructBLIP
    from bench import make_batch

    base_cfg = tiny_model_config()
    data_cfg = tiny_data_config(n_frms=4)
    m1 = XInstructBLIP(base_cfg.replace(encode_clips_per_pass=0),
                       audio_cfg=data_cfg.audio)
    m2 = XInstructBLIP(base_cfg.replace(encode_clips_per_pass=1),
                       audio_cfg=data_cfg.audio)
    params = m1.init_params(jax.random.PRNGKey(0))
    batch = make_batch(data_cfg, m1, 2)
    video = jnp.asarray(batch.video)
    audio = jnp.asarray(batch.audio)
    text = m1.prepare_text(batch.text_input, np.asarray(batch.timestamps),
                           batch.duration)
    kw = dict(
        qformer_ids=jnp.asarray(text.qformer_ids),
        qformer_mask=jnp.asarray(text.qformer_mask), n_frms=4,
    )
    t1 = m1._encode_modality_tokens(params, video, audio, **kw)
    t2 = m2._encode_modality_tokens(params, video, audio, **kw)
    for k in t1:
        # bf16 compute: different batch shapes reorder reductions, so
        # equality is to bf16 precision, not bitwise
        np.testing.assert_allclose(
            np.asarray(t1[k], np.float32), np.asarray(t2[k], np.float32),
            rtol=4e-2, atol=4e-2,
        )


def test_encode_frames_per_pass_equivalent():
    """Frame-level encoder chunking (B=1-effective) matches the plain
    single-fold pass."""
    from mraudio_tpu.models.xinstructblip import XInstructBLIP
    from bench import make_batch

    base_cfg = tiny_model_config()
    data_cfg = tiny_data_config(n_frms=4)
    m1 = XInstructBLIP(base_cfg.replace(encode_clips_per_pass=0),
                       audio_cfg=data_cfg.audio)
    m2 = XInstructBLIP(
        base_cfg.replace(encode_clips_per_pass=0, encode_frames_per_pass=2),
        audio_cfg=data_cfg.audio,
    )
    params = m1.init_params(jax.random.PRNGKey(0))
    batch = make_batch(data_cfg, m1, 1)
    video = jnp.asarray(batch.video)
    audio = jnp.asarray(batch.audio)
    text = m1.prepare_text(batch.text_input, np.asarray(batch.timestamps),
                           batch.duration)
    kw = dict(
        qformer_ids=jnp.asarray(text.qformer_ids),
        qformer_mask=jnp.asarray(text.qformer_mask), n_frms=4,
    )
    t1 = m1._encode_modality_tokens(params, video, audio, **kw)
    t2 = m2._encode_modality_tokens(params, video, audio, **kw)
    for k in t1:
        np.testing.assert_allclose(
            np.asarray(t1[k], np.float32), np.asarray(t2[k], np.float32),
            rtol=4e-2, atol=4e-2,
        )


def test_flops_accounting_reflects_residual():
    from mraudio_tpu.config import AudioFrontendConfig
    from mraudio_tpu.utils.flops import pipeline_flops

    cfg = tiny_model_config()
    audio = AudioFrontendConfig(num_mel_bins=16, mel_frames_per_chunk=32)
    full = pipeline_flops(cfg, audio, 8, 1, 256, 8)
    res = pipeline_flops(
        cfg.replace(vit=cfg.vit.replace(keyframe_interval=4, residual_tokens=1)),
        audio, 8, 1, 256, 8,
    )
    assert res["vit"] < full["vit"]
    assert res["prefill"] == full["prefill"]
