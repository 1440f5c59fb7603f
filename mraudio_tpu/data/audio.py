"""Audio waveform sources.

The reference extracts audio through LAVIS ``BeatsAudioProcessor``
(ffmpeg demux → torchaudio kaldi fbank on the CPU; bound at
``evaluate.py:24``).  Here the host only produces a fixed-length mono
waveform; the mel-fbank frontend runs on the TPU as a fused XLA/Pallas
op (``mraudio_tpu.ops.fbank``) so preprocessing rides HBM bandwidth
instead of the (single!) host core.
"""

from __future__ import annotations

import hashlib

import numpy as np


class AudioSource:
    def load(self, path: str, num_samples: int, sample_rate: int) -> np.ndarray:
        """Return float32 mono waveform of exactly ``num_samples`` at
        ``sample_rate`` (truncate / zero-pad as needed)."""
        raise NotImplementedError


class SyntheticAudioSource(AudioSource):
    """Deterministic multi-tone waveform keyed on the path hash."""

    def load(self, path: str, num_samples: int, sample_rate: int) -> np.ndarray:
        seed = int.from_bytes(hashlib.sha1(path.encode()).digest()[:4], "little")
        t = np.arange(num_samples, dtype=np.float32) / sample_rate
        f0 = 110.0 * (1 + seed % 8)
        wave = (
            0.5 * np.sin(2 * np.pi * f0 * t)
            + 0.3 * np.sin(2 * np.pi * 2.7 * f0 * t + 0.1 * seed)
            + 0.1 * np.sin(2 * np.pi * 0.5 * t) * np.sin(2 * np.pi * 5.3 * f0 * t)
        )
        return wave.astype(np.float32)


class NativeAudioSource(AudioSource):
    """libav demux + swresample to mono 16 kHz (see ``native/``)."""

    def __init__(self):
        from mraudio_tpu.data import native_bindings

        self._lib = native_bindings.load()

    def load(self, path: str, num_samples: int, sample_rate: int) -> np.ndarray:
        from mraudio_tpu.data import native_bindings

        # Cap the decode at the samples actually consumed (the C loop
        # stops once `out` is full) — the model's audio window is ~60 s,
        # so a 150 s track costs 60 s of AAC decode, not 150.
        wave = native_bindings.decode_audio(
            self._lib, path, sample_rate,
            max_seconds=num_samples / sample_rate + 1.0,
        )
        if len(wave) >= num_samples:
            return wave[:num_samples]
        return np.pad(wave, (0, num_samples - len(wave)))


def make_audio_source(kind: str) -> AudioSource:
    if kind == "synthetic":
        return SyntheticAudioSource()
    if kind == "native":
        return NativeAudioSource()
    raise ValueError(f"unknown audio source kind {kind!r}")
