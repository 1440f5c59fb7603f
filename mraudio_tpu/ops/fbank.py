"""On-device kaldi-compatible log-mel filterbank frontend.

The reference computes fbanks per-sample on the CPU through LAVIS
``BeatsAudioProcessor`` (torchaudio kaldi fbank; bound at
``evaluate.py:24``, ``utils/trainer.py:46``).  Here the whole frontend
— framing, windowing, FFT, mel projection, log, BEATs normalization,
chunking — is one jitted XLA computation over the batch: framing is a
gather, the mel projection is an MXU matmul, and XLA fuses the
elementwise stages, so audio preprocessing rides HBM bandwidth instead
of the single host core.

Kaldi semantics implemented (matching ``torchaudio.compliance.kaldi.fbank``
defaults used by BEATs): snip-edges framing, per-frame DC removal,
0.97 preemphasis with duplicated first sample, povey window, power
spectrum over a round-up-to-pow2 FFT, mel-domain triangular banks over
[20 Hz, Nyquist], natural-log with float-eps floor.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from mraudio_tpu.config import AudioFrontendConfig

# BEATs dataset normalization constants (applied after scaling the
# waveform to int16 range, as BEATs' preprocess does).
BEATS_FBANK_MEAN = 15.41663
BEATS_FBANK_STD = 6.55582

_FLT_EPS = 1.1920928955078125e-07  # float32 machine epsilon (kaldi's floor)


def _next_pow2(n: int) -> int:
    return 1 << (n - 1).bit_length()


def povey_window(win_length: int) -> np.ndarray:
    n = np.arange(win_length, dtype=np.float64)
    hann = 0.5 - 0.5 * np.cos(2 * np.pi * n / (win_length - 1))
    return (hann ** 0.85).astype(np.float32)


def mel_scale(freq):
    return 1127.0 * np.log(1.0 + np.asarray(freq, dtype=np.float64) / 700.0)


def kaldi_mel_banks(
    num_bins: int,
    n_fft: int,
    sample_rate: int,
    low_freq: float = 20.0,
    high_freq: float = 0.0,
) -> np.ndarray:
    """Triangular mel filterbank matrix (num_fft_bins, num_bins) with
    kaldi's mel-domain interpolation."""
    if high_freq <= 0.0:
        high_freq = sample_rate / 2.0 + high_freq
    num_fft_bins = n_fft // 2 + 1

    mel_low = mel_scale(low_freq)
    mel_high = mel_scale(high_freq)
    mel_delta = (mel_high - mel_low) / (num_bins + 1)

    fft_freqs = np.arange(num_fft_bins, dtype=np.float64) * sample_rate / n_fft
    mel_freqs = mel_scale(fft_freqs)  # (F,)

    left = mel_low + np.arange(num_bins)[:, None] * mel_delta       # (B,1)
    center = left + mel_delta
    right = center + mel_delta

    up = (mel_freqs[None, :] - left) / (center - left)
    down = (right - mel_freqs[None, :]) / (right - center)
    weights = np.maximum(0.0, np.minimum(up, down))
    return weights.T.astype(np.float32)  # (F, num_bins)


@functools.partial(
    jax.jit,
    static_argnames=("win_length", "hop_length", "num_mel_bins", "sample_rate",
                     "preemphasis", "remove_dc"),
)
def kaldi_fbank(
    waveform: jax.Array,
    *,
    win_length: int = 400,
    hop_length: int = 160,
    num_mel_bins: int = 128,
    sample_rate: int = 16000,
    preemphasis: float = 0.97,
    remove_dc: bool = True,
) -> jax.Array:
    """Log-mel fbank of a batch of waveforms.

    Args:
        waveform: (B, N) float32, already in the scale the caller wants
            (BEATs passes int16-range values).
    Returns:
        (B, M, num_mel_bins) float32 with M = 1 + (N - win) // hop.
    """
    b, n = waveform.shape
    num_frames = 1 + (n - win_length) // hop_length
    n_fft = _next_pow2(win_length)

    # Strided framing as a gather: (M, win) index grid.
    idx = (
        np.arange(num_frames)[:, None] * hop_length + np.arange(win_length)[None, :]
    )
    frames = waveform[:, idx]  # (B, M, win)

    if remove_dc:
        frames = frames - jnp.mean(frames, axis=-1, keepdims=True)

    # Kaldi preemphasis: x[t] - p * x[t-1], with x[-1] := x[0].
    prev = jnp.concatenate([frames[..., :1], frames[..., :-1]], axis=-1)
    frames = frames - preemphasis * prev

    frames = frames * jnp.asarray(povey_window(win_length))

    pad = n_fft - win_length
    if pad:
        frames = jnp.pad(frames, ((0, 0), (0, 0), (0, pad)))
    spectrum = jnp.fft.rfft(frames, axis=-1)
    power = jnp.square(spectrum.real) + jnp.square(spectrum.imag)  # (B, M, F)

    banks = jnp.asarray(kaldi_mel_banks(num_mel_bins, n_fft, sample_rate))
    mel = jnp.einsum(
        "bmf,fk->bmk", power, banks, preferred_element_type=jnp.float32
    )
    return jnp.log(jnp.maximum(mel, _FLT_EPS))


def beats_frontend(
    waveform: jax.Array, cfg: AudioFrontendConfig, n_frms: int
) -> jax.Array:
    """Full BEATs audio preprocessing: waveform → normalized fbank chunks.

    Output shape (B, n_frms, mel_frames_per_chunk, num_mel_bins) — the
    per-video-frame audio chunks the per-modality encoder loop of the
    reference consumes (``models/xinstructblip.py:268-275``), computed
    here in a single device pass.
    """
    if jnp.issubdtype(waveform.dtype, jnp.integer):
        scaled = waveform.astype(jnp.float32)  # already int16-range
    else:
        scaled = waveform * 32768.0  # int16 range, as BEATs preprocesses
    fbank = kaldi_fbank(
        scaled,
        win_length=cfg.win_length,
        hop_length=cfg.hop_length,
        num_mel_bins=cfg.num_mel_bins,
        sample_rate=cfg.sampling_rate,
        preemphasis=cfg.preemphasis,
    )
    fbank = (fbank - BEATS_FBANK_MEAN) / (2 * BEATS_FBANK_STD)

    b, m, k = fbank.shape
    total = n_frms * cfg.mel_frames_per_chunk
    if m < total:
        fbank = jnp.pad(fbank, ((0, 0), (0, total - m), (0, 0)))
    else:
        fbank = fbank[:, :total]
    return fbank.reshape(b, n_frms, cfg.mel_frames_per_chunk, k)
