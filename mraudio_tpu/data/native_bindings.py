"""ctypes bindings for the native libav decode library (``native/``).

Builds ``libmraudio_native.so`` on first use (``make -C native``) and
exposes probe / frame-gather / audio-decode plus the test-media writers.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libmraudio_native.so")
_LOCK = threading.Lock()
_LIB = None


class NativeUnavailable(RuntimeError):
    pass


def build() -> str:
    result = subprocess.run(
        ["make", "-C", _NATIVE_DIR], capture_output=True, text=True
    )
    if result.returncode != 0:
        raise NativeUnavailable(
            f"native build failed:\n{result.stdout}\n{result.stderr}"
        )
    return _LIB_PATH


def load():
    global _LIB
    with _LOCK:
        if _LIB is not None:
            return _LIB
        if not os.path.exists(_LIB_PATH):
            build()
        lib = ctypes.CDLL(_LIB_PATH)
        lib.mr_last_error.restype = ctypes.c_char_p
        lib.mr_probe.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_longlong),
            ctypes.POINTER(ctypes.c_double),
        ]
        lib.mr_decode_frames.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_longlong),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_double, ctypes.c_double,
            ctypes.POINTER(ctypes.c_ubyte),
        ]
        lib.mr_decode_frames_i420.argtypes = lib.mr_decode_frames.argtypes
        lib.mr_decode_audio.restype = ctypes.c_longlong
        lib.mr_decode_audio.argtypes = [
            ctypes.c_char_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_longlong,
        ]
        lib.mr_transcode.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
        ]
        lib.mr_write_test_video.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_ubyte),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_double,
        ]
        lib.mr_write_test_video_vfr.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_ubyte),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_double,
            ctypes.POINTER(ctypes.c_longlong),
        ]
        lib.mr_write_test_audio.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
            ctypes.c_longlong, ctypes.c_int,
        ]
        lib.mr_write_media.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_ubyte),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_double,
            ctypes.POINTER(ctypes.c_float), ctypes.c_longlong,
            ctypes.c_int, ctypes.c_int,
        ]
        _LIB = lib
        return lib


def _err(lib) -> str:
    return lib.mr_last_error().decode(errors="replace")


def probe(lib, path: str) -> tuple[int, float]:
    n = ctypes.c_longlong()
    fps = ctypes.c_double()
    if lib.mr_probe(path.encode(), ctypes.byref(n), ctypes.byref(fps)) != 0:
        raise IOError(f"probe failed for {path}: {_err(lib)}")
    return int(n.value), float(fps.value)


def decode_frames(
    lib, path: str, indices: np.ndarray, height: int, width: int,
    start: float = -1.0, end: float = -1.0,
) -> np.ndarray:
    indices = np.ascontiguousarray(indices, dtype=np.int64)
    out = np.empty((len(indices), height, width, 3), dtype=np.uint8)
    rc = lib.mr_decode_frames(
        path.encode(),
        indices.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
        len(indices), height, width, start, end,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
    )
    if rc != 0:
        raise IOError(f"decode failed for {path}: {_err(lib)}")
    return out


def decode_frames_i420(
    lib, path: str, indices: np.ndarray, height: int, width: int,
    start: float = -1.0, end: float = -1.0,
) -> np.ndarray:
    """Like :func:`decode_frames` but emits the codec-native I420 planes
    packed as (T, H*3//2, W) uint8 — half the bytes and no host chroma
    upsample (the device reconstructs RGB, ops/image.py)."""
    indices = np.ascontiguousarray(indices, dtype=np.int64)
    out = np.empty((len(indices), height * 3 // 2, width), dtype=np.uint8)
    rc = lib.mr_decode_frames_i420(
        path.encode(),
        indices.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
        len(indices), height, width, start, end,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
    )
    if rc != 0:
        raise IOError(f"decode failed for {path}: {_err(lib)}")
    return out


def decode_audio(lib, path: str, sample_rate: int, max_seconds: float = 600.0) -> np.ndarray:
    max_samples = int(sample_rate * max_seconds)
    out = np.zeros(max_samples, dtype=np.float32)
    n = lib.mr_decode_audio(
        path.encode(), sample_rate,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), max_samples,
    )
    if n < 0:
        raise IOError(f"audio decode failed for {path}: {_err(lib)}")
    return out[: int(n)]


def transcode(lib, src: str, dst: str, width: int, height: int) -> None:
    """AVI→MP4 (or any→mp4) transcode with downscale — the notebook's
    ffmpeg step (data_preprocess.ipynb cells 18-19) as a native call."""
    if lib.mr_transcode(src.encode(), dst.encode(), width, height) != 0:
        raise IOError(f"transcode failed for {src}: {_err(lib)}")


def write_test_video(lib, path: str, frames: np.ndarray, fps: float) -> None:
    frames = np.ascontiguousarray(frames, dtype=np.uint8)
    n, h, w, _ = frames.shape
    rc = lib.mr_write_test_video(
        path.encode(),
        frames.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        n, h, w, fps,
    )
    if rc != 0:
        raise IOError(f"write_test_video failed: {_err(lib)}")


def write_test_video_vfr(lib, path: str, frames: np.ndarray, fps: float,
                         pts: np.ndarray) -> None:
    """Variable-frame-rate test media: per-frame presentation timestamps
    in 1/``fps`` ticks.  Fabricates the consumer-VBR regime where
    avg_frame_rate and r_frame_rate disagree — the decoder's post-seek
    pts→frame-number math must hold (zero egress: no real VBR corpus)."""
    frames = np.ascontiguousarray(frames, dtype=np.uint8)
    pts = np.ascontiguousarray(pts, dtype=np.int64)
    n, h, w, _ = frames.shape
    assert pts.shape == (n,)
    rc = lib.mr_write_test_video_vfr(
        path.encode(),
        frames.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        n, h, w, fps,
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
    )
    if rc != 0:
        raise IOError(f"write_test_video_vfr failed: {_err(lib)}")


def write_media(
    lib, path: str, frames: np.ndarray, fps: float,
    samples: np.ndarray, sample_rate: int, gop: int = 60,
) -> None:
    """Write an mp4 with muxed H.264 video + AAC audio — media shaped
    like the real QVH/Charades files (the test writers emit video-only
    mp4 / separate wav)."""
    frames = np.ascontiguousarray(frames, dtype=np.uint8)
    samples = np.ascontiguousarray(samples, dtype=np.float32)
    n, h, w, _ = frames.shape
    rc = lib.mr_write_media(
        path.encode(),
        frames.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        n, h, w, fps,
        samples.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(samples), sample_rate, gop,
    )
    if rc != 0:
        raise IOError(f"write_media failed: {_err(lib)}")


def write_test_audio(lib, path: str, samples: np.ndarray, sample_rate: int) -> None:
    samples = np.ascontiguousarray(samples, dtype=np.float32)
    rc = lib.mr_write_test_audio(
        path.encode(),
        samples.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(samples), sample_rate,
    )
    if rc != 0:
        raise IOError(f"write_test_audio failed: {_err(lib)}")
