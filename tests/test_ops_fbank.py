"""Frontend op tests: kaldi-fbank semantics + BEATs chunking + image ops."""

import numpy as np
import pytest

import jax.numpy as jnp

from mraudio_tpu.config import AudioFrontendConfig
from mraudio_tpu.ops.fbank import (
    beats_frontend,
    kaldi_fbank,
    kaldi_mel_banks,
    povey_window,
)
from mraudio_tpu.ops.image import (
    augment_and_normalize,
    normalize_frames,
    sample_crop_params,
)


def _reference_fbank(wave, win=400, hop=160, n_mels=24, sr=16000, preemph=0.97):
    """Independent numpy implementation of kaldi fbank for cross-checking
    the jitted version (same spec, different code path)."""
    n_fft = 512
    m = 1 + (len(wave) - win) // hop
    out = np.zeros((m, n_mels))
    window = povey_window(win).astype(np.float64)
    banks = kaldi_mel_banks(n_mels, n_fft, sr).astype(np.float64)
    for i in range(m):
        frame = wave[i * hop : i * hop + win].astype(np.float64).copy()
        frame -= frame.mean()
        frame[1:] -= preemph * frame[:-1]
        frame[0] -= preemph * frame[0]
        frame *= window
        spec = np.abs(np.fft.rfft(frame, n_fft)) ** 2
        out[i] = np.log(np.maximum(spec @ banks, 1.1920928955078125e-07))
    return out


def test_kaldi_fbank_matches_independent_impl():
    rng = np.random.default_rng(0)
    wave = (rng.uniform(-1, 1, 16000) * 32768).astype(np.float32)
    ours = np.asarray(kaldi_fbank(wave[None], num_mel_bins=24))[0]
    ref = _reference_fbank(wave)
    assert ours.shape == ref.shape == (98, 24)
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_fbank_frame_count():
    wave = np.zeros((2, 3600), np.float32)
    out = kaldi_fbank(wave, num_mel_bins=8)
    assert out.shape == (2, 1 + (3600 - 400) // 160, 8)


def test_mel_banks_shape_and_coverage():
    banks = kaldi_mel_banks(128, 512, 16000)
    assert banks.shape == (257, 128)
    assert (banks >= 0).all()
    # At 128 bins over [20Hz, 8kHz] the lowest triangles are narrower than
    # the fft bin spacing, so a few may miss every fft-bin center — kaldi
    # behaves the same.  Require near-total coverage, and full coverage of
    # the interior fft bins.
    assert (banks.sum(0) > 0).sum() >= 126
    assert (banks.sum(1)[8:-1] > 0).all()


def test_beats_frontend_chunking():
    cfg = AudioFrontendConfig(num_mel_bins=16, mel_frames_per_chunk=32)
    n_frms = 4
    hop, win = cfg.hop_length, cfg.win_length
    num_samples = hop * (n_frms * 32 - 1) + win
    wave = np.random.default_rng(1).uniform(-1, 1, (2, num_samples)).astype(np.float32)
    out = beats_frontend(jnp.asarray(wave), cfg, n_frms)
    assert out.shape == (2, n_frms, 32, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_normalize_frames_range():
    frames = np.zeros((1, 2, 4, 4, 3), np.uint8)
    out = np.asarray(normalize_frames(jnp.asarray(frames)), dtype=np.float32)
    np.testing.assert_allclose(
        out[0, 0, 0, 0], (0 - np.array([0.48145466, 0.4578275, 0.40821073]))
        / np.array([0.26862954, 0.26130258, 0.27577711]),
        rtol=1e-2,
    )


def test_augment_and_normalize_shapes():
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, (2, 3, 32, 32, 3), dtype=np.uint8)
    params = sample_crop_params(rng, 2, 32, 32)
    out = augment_and_normalize(jnp.asarray(frames), jnp.asarray(params), 28)
    assert out.shape == (2, 3, 28, 28, 3)
    assert np.isfinite(np.asarray(out, dtype=np.float32)).all()


def test_crop_params_within_bounds():
    rng = np.random.default_rng(0)
    p = sample_crop_params(rng, 32, 224, 224, min_scale=0.9, max_scale=1.0)
    top, left, h, w, flip = p.T
    assert (top >= 0).all() and (left >= 0).all()
    assert ((top + h) <= 224).all() and ((left + w) <= 224).all()
    assert (h * w >= 0.85 * 224 * 224).all()
    assert set(np.unique(flip)) <= {0, 1}
