"""Native libav decode-layer tests: write real media, read it back."""

import numpy as np
import pytest

from mraudio_tpu.data import native_bindings as nb


@pytest.fixture(scope="module")
def lib():
    try:
        return nb.load()
    except nb.NativeUnavailable as exc:
        pytest.skip(f"native library unavailable: {exc}")


def _make_frames(n=48, h=64, w=64):
    """Frames with a distinctive per-frame brightness ramp so decoded
    frames can be matched back to their index despite lossy encoding."""
    frames = np.zeros((n, h, w, 3), np.uint8)
    for i in range(n):
        frames[i] = int(255 * i / (n - 1))
    return frames


def test_probe_and_decode_roundtrip(lib, tmp_path):
    path = str(tmp_path / "test.mp4")
    frames = _make_frames()
    nb.write_test_video(lib, path, frames, fps=12.0)

    vlen, fps = nb.probe(lib, path)
    assert vlen == 48
    # container avg_frame_rate counts n frames over n-1 intervals
    # (48/(47/12) ≈ 12.26) — decord reports the same for such files
    assert fps == pytest.approx(12.0, rel=0.03)

    idx = np.array([0, 10, 20, 47])
    out = nb.decode_frames(lib, path, idx, 32, 32)
    assert out.shape == (4, 32, 32, 3)
    means = out.reshape(4, -1).mean(axis=1)
    expected = frames[idx].reshape(4, -1).mean(axis=1)
    np.testing.assert_allclose(means, expected, atol=12)


def test_decode_unsorted_indices(lib, tmp_path):
    path = str(tmp_path / "test2.mp4")
    nb.write_test_video(lib, path, _make_frames(), fps=12.0)
    out_sorted = nb.decode_frames(lib, path, np.array([5, 25, 40]), 16, 16)
    out_shuffled = nb.decode_frames(lib, path, np.array([40, 5, 25]), 16, 16)
    np.testing.assert_array_equal(out_sorted[0], out_shuffled[1])
    np.testing.assert_array_equal(out_sorted[2], out_shuffled[0])


def test_subclip_window(lib, tmp_path):
    """start/end seconds shift the frame origin — the temporal-clipping
    capability the reference's ffmpeg 'crop' misuse never delivered."""
    path = str(tmp_path / "test3.mp4")
    frames = _make_frames(n=48)
    nb.write_test_video(lib, path, frames, fps=12.0)
    # sub-clip [1s, 3s) at 12fps → frames 12..36; index 0 → abs frame 12
    out = nb.decode_frames(lib, path, np.array([0, 6]), 16, 16, start=1.0, end=3.0)
    expected = frames[[12, 18]].reshape(2, -1).mean(axis=1)
    got = out.reshape(2, -1).mean(axis=1)
    np.testing.assert_allclose(got, expected, atol=12)


def test_audio_roundtrip(lib, tmp_path):
    sr = 16000
    t = np.arange(sr * 2, dtype=np.float32) / sr
    wave = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    path = str(tmp_path / "test.wav")
    nb.write_test_audio(lib, path, wave, sr)

    out = nb.decode_audio(lib, path, sr)
    assert abs(len(out) - len(wave)) < sr // 10
    n = min(len(out), len(wave))
    corr = np.corrcoef(out[:n], wave[:n])[0, 1]
    assert corr > 0.99


def test_audio_resample(lib, tmp_path):
    sr_in, sr_out = 16000, 8000
    t = np.arange(sr_in, dtype=np.float32) / sr_in
    wave = (0.5 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    path = str(tmp_path / "rs.wav")
    nb.write_test_audio(lib, path, wave, sr_in)
    out = nb.decode_audio(lib, path, sr_out)
    assert abs(len(out) - sr_out) < sr_out // 10


def test_video_without_audio_returns_empty(lib, tmp_path):
    path = str(tmp_path / "mute.mp4")
    nb.write_test_video(lib, path, _make_frames(n=8), fps=8.0)
    out = nb.decode_audio(lib, path, 16000)
    assert len(out) == 0


def test_native_video_source_integration(lib, tmp_path):
    from mraudio_tpu.data.video import NativeVideoSource

    path = str(tmp_path / "src.mp4")
    nb.write_test_video(lib, path, _make_frames(), fps=12.0)
    src = NativeVideoSource()
    vlen, fps = src.probe(path)
    assert vlen == 48
    frames = src.get_batch(path, np.array([0, 24]), 32, 32)
    assert frames.shape == (2, 32, 32, 3)


def test_missing_file_raises(lib):
    with pytest.raises(IOError):
        nb.probe(lib, "/nonexistent/file.mp4")


def test_transcode_avi_to_mp4(lib, tmp_path):
    src = str(tmp_path / "clip.avi")
    nb.write_test_video(lib, src, _make_frames(n=24, h=96, w=128), fps=12.0)
    dst = str(tmp_path / "clip.mp4")
    nb.transcode(lib, src, dst, 64, 64)
    vlen, fps = nb.probe(lib, dst)
    assert vlen == 24
    frames = nb.decode_frames(lib, dst, np.array([0, 23]), 64, 64)
    assert frames.shape == (2, 64, 64, 3)
    # brightness ramp preserved through the transcode
    assert frames[1].mean() > frames[0].mean() + 100


def test_vfr_probe_and_sequential_gather(lib, tmp_path):
    """Variable-frame-rate file (pts drift ~12.5% slow vs the nominal
    time base — the consumer-VBR shape): probing still reports a sane
    frame count, and a from-the-start gather (sequential decode, no
    seek) returns exactly the requested frames."""
    path = str(tmp_path / "vfr.mp4")
    n = 96
    frames = _make_frames(n=n)
    # every 8th tick skipped: pts = 0,1,2,...,8 -> 9,... (drifting late)
    pts = np.array([i + i // 8 for i in range(n)], np.int64)
    nb.write_test_video_vfr(lib, path, frames, fps=12.0, pts=pts)

    vlen, fps = nb.probe(lib, path)
    assert vlen == n  # frame COUNT, not a rate artifact
    # container rate sits below the nominal 12 (duration stretched ~12.5%)
    assert 9.0 < fps < 12.5

    idx = np.array([0, 3, 7, 11])
    out = nb.decode_frames(lib, path, idx, 32, 32)
    means = out.reshape(len(idx), -1).mean(axis=1)
    expected = frames[idx].reshape(len(idx), -1).mean(axis=1)
    np.testing.assert_allclose(means, expected, atol=12)


def test_vfr_sparse_gather_after_seeks(lib, tmp_path):
    """Sparse gather deep into the VFR file (gap-seek path): the
    post-seek pts→frame-number conversion uses r_frame_rate
    (index_rate), so a drifting stream may land the derived index a few
    frames off — the delivered frame must stay within the accumulated
    drift bound (here 12.5%), never garbage or out of order."""
    path = str(tmp_path / "vfr_long.mp4")
    n = 240
    frames = _make_frames(n=n)
    pts = np.array([i + i // 8 for i in range(n)], np.int64)
    nb.write_test_video_vfr(lib, path, frames, fps=12.0, pts=pts)

    idx = np.array([5, 80, 160, 230])
    out = nb.decode_frames(lib, path, idx, 32, 32)
    means = out.reshape(len(idx), -1).mean(axis=1)
    # brightness ramp: mean -> index.  step = 255/(n-1)
    got_idx = means / (255.0 / (n - 1))
    drift_bound = idx // 8 + 3  # accumulated pts drift + codec slack
    err = np.abs(got_idx - idx)
    assert np.all(err <= drift_bound), (got_idx.tolist(), idx.tolist())
    # monotone: a sorted request never returns out-of-order content
    assert np.all(np.diff(got_idx) > 0)


def test_vfr_subclip_window(lib, tmp_path):
    """start/end sub-clip seeks on a VFR file stay inside the window's
    drift bound (the reference's broken ffmpeg crop-filter path never
    worked at all, utils/mr_dataset.py:27-36)."""
    path = str(tmp_path / "vfr_clip.mp4")
    n = 120
    frames = _make_frames(n=n)
    pts = np.array([i + i // 8 for i in range(n)], np.int64)
    nb.write_test_video_vfr(lib, path, frames, fps=12.0, pts=pts)

    # window [4s, 8s) at ~10.7 real fps ≈ frames [43..85]
    idx = np.array([0, 10, 20])
    out = nb.decode_frames(lib, path, idx, 32, 32, start=4.0, end=8.0)
    means = out.reshape(len(idx), -1).mean(axis=1)
    got_idx = means / (255.0 / (n - 1))
    # all inside a generous window around [start*fps, end*fps)
    assert np.all(got_idx >= 35) and np.all(got_idx <= 105)
    assert np.all(np.diff(got_idx) > 0)
