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


# ---------------------------------------------------------------------------
# Independent kaldi-fbank oracle — re-derived from the kaldi/torchaudio
# spec (torchaudio.compliance.kaldi.fbank with the BEATs settings:
# snip_edges=True, dither=0, remove_dc_offset=True, preemphasis 0.97,
# povey window, round-to-power-of-two FFT, use_power=True,
# use_log_fbank=True with float-eps floor, low 20 Hz / high Nyquist).
# Shares NO code with mraudio_tpu.ops.fbank.
# ---------------------------------------------------------------------------

_ORACLE_EPS = 1.1920928955078125e-07  # float32 machine epsilon


def _oracle_povey(win):
    n = np.arange(win, dtype=np.float64)
    return (0.5 - 0.5 * np.cos(2 * np.pi * n / (win - 1))) ** 0.85


def _oracle_mel(f):
    return 1127.0 * np.log(1.0 + np.asarray(f, np.float64) / 700.0)


def _oracle_banks(num_bins, n_fft, sr, low=20.0, high=0.0):
    if high <= 0:
        high = sr / 2.0 + high
    n_bins_fft = n_fft // 2 + 1
    ml, mh = _oracle_mel(low), _oracle_mel(high)
    d = (mh - ml) / (num_bins + 1)
    fft_mels = _oracle_mel(np.arange(n_bins_fft) * sr / n_fft)
    weights = np.zeros((n_bins_fft, num_bins))
    for j in range(num_bins):
        left, center, right = ml + j * d, ml + (j + 1) * d, ml + (j + 2) * d
        up = (fft_mels - left) / (center - left)
        down = (right - fft_mels) / (right - center)
        weights[:, j] = np.maximum(0.0, np.minimum(up, down))
    return weights


def _oracle_fbank(wave, win=400, hop=160, n_mels=24, sr=16000, preemph=0.97):
    n_fft = 1 << (win - 1).bit_length()          # round up to power of two
    m = 1 + (len(wave) - win) // hop             # snip_edges framing
    banks = _oracle_banks(n_mels, n_fft, sr)
    window = _oracle_povey(win)
    out = np.zeros((m, n_mels))
    for i in range(m):
        frame = wave[i * hop : i * hop + win].astype(np.float64).copy()
        frame -= frame.mean()                    # remove_dc_offset first
        frame[1:] -= preemph * frame[:-1]        # preemphasis with
        frame[0] -= preemph * frame[0]           #   x[-1] := x[0]
        frame *= window                          # window BEFORE zero-pad
        spec = np.abs(np.fft.rfft(frame, n_fft)) ** 2
        out[i] = np.log(np.maximum(spec @ banks, _ORACLE_EPS))
    return out


def _golden_wave():
    t = np.arange(16000) / 16000.0
    return (
        (0.6 * np.sin(2 * np.pi * 440 * t)
         + 0.3 * np.sin(2 * np.pi * 1337 * t + 0.5)
         + 0.1 * np.sin(2 * np.pi * 4000 * t)) * 20000.0
    ).astype(np.float32)


# Pinned outputs of the oracle on _golden_wave (regression guard for the
# oracle itself — derived once from the spec implementation above).
_GOLDEN = {
    (0, slice(0, 6)): [10.46977428, 12.82295875, 16.60246536, 24.26716579,
                       24.70145177, 18.61825171],
    (40, slice(10, 16)): [25.15494729, 14.49266294, 10.42549132, 8.18626884,
                          6.76504574, 6.84831699],
    (97, slice(18, 24)): [25.59975297, 15.01052102, 7.65608092, 4.99463832,
                          3.09802558, 1.30767139],
}


def test_oracle_matches_pinned_goldens():
    out = _oracle_fbank(_golden_wave())
    assert out.shape == (98, 24)
    for (row, cols), want in _GOLDEN.items():
        np.testing.assert_allclose(out[row, cols], want, rtol=1e-6)


def test_kaldi_fbank_matches_independent_oracle():
    rng = np.random.default_rng(0)
    wave = (rng.uniform(-1, 1, 16000) * 32768).astype(np.float32)
    ours = np.asarray(kaldi_fbank(wave[None], num_mel_bins=24))[0]
    ref = _oracle_fbank(wave)
    assert ours.shape == ref.shape == (98, 24)
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_kaldi_fbank_matches_oracle_on_golden_wave():
    # pure tones have deep spectral nulls where fp32 FFT cancellation
    # error is amplified by the log — hence the looser atol here (the
    # broadband random-wave test above is the tight 2e-4 check)
    ours = np.asarray(kaldi_fbank(_golden_wave()[None], num_mel_bins=24))[0]
    for (row, cols), want in _GOLDEN.items():
        np.testing.assert_allclose(ours[row, cols], want, rtol=1e-3, atol=1e-2)


@pytest.mark.parametrize("win,hop,n_mels", [(400, 160, 24), (512, 256, 16), (200, 80, 8)])
def test_kaldi_fbank_matches_oracle_other_geometries(win, hop, n_mels):
    """Covers the non-padded FFT case (win already a power of two) and a
    short window, so the round-to-pow2 and snip-edges choices are each
    exercised explicitly."""
    rng = np.random.default_rng(win)
    wave = (rng.uniform(-1, 1, 8000) * 32768).astype(np.float32)
    ours = np.asarray(
        kaldi_fbank(wave[None], win_length=win, hop_length=hop, num_mel_bins=n_mels)
    )[0]
    ref = _oracle_fbank(wave, win=win, hop=hop, n_mels=n_mels)
    assert ours.shape == ref.shape == (1 + (8000 - win) // hop, n_mels)
    np.testing.assert_allclose(ours, ref, rtol=3e-4, atol=3e-4)


def test_energy_floor_applied():
    """Silence hits the float-eps log floor exactly (kaldi convention
    with energy_floor=0: floor at float epsilon inside the log)."""
    wave = np.zeros((1, 4000), np.float32)
    out = np.asarray(kaldi_fbank(wave, num_mel_bins=8))
    np.testing.assert_allclose(out, np.log(_ORACLE_EPS), rtol=1e-6)


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
