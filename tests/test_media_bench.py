"""Fabricated-media pipeline: muxed H.264+AAC writer, gap-seek decode
exactness, and the real-file dataset path the media benchmark runs.

The reference's decode work happens in decord/ffmpeg inside DataLoader
workers (``processors/alpro_processors.py:14-38``; audio demux via LAVIS
``BeatsAudioProcessor``) — these tests pin the native equivalents on
real encoded files produced by ``data/media.py``.
"""

import json
import os

import numpy as np
import pytest

from mraudio_tpu.config import DataConfig
from mraudio_tpu.data import native_bindings as nb
from mraudio_tpu.data.dataset import BatchLoader, MRDataset
from mraudio_tpu.data.media import fabricate_media_set


@pytest.fixture(scope="module")
def media_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("media"))
    ann = fabricate_media_set(
        root, n_videos=2, duration=4.0, fps=8.0, height=96, width=128,
        queries_per_video=2, gop=8, seed=7,
    )
    return root, ann


def test_write_media_probe_and_audio(media_root):
    root, _ = media_root
    lib = nb.load()
    path = os.path.join(root, "media000.mp4")
    n, fps = nb.probe(lib, path)
    assert n == 32
    assert abs(fps - 8.0) < 0.35  # container fps estimate tolerance
    wave = nb.decode_audio(lib, path, 16000, max_seconds=5.0)
    assert len(wave) > 16000 * 3.5
    assert float(np.sqrt((wave ** 2).mean())) > 0.05  # real signal, not silence


def test_manifest_caches(media_root):
    root, ann = media_root
    mtime = os.path.getmtime(os.path.join(root, "media000.mp4"))
    ann2 = fabricate_media_set(
        root, n_videos=2, duration=4.0, fps=8.0, height=96, width=128,
        queries_per_video=2, gop=8, seed=7,
    )
    assert ann2 == ann
    assert os.path.getmtime(os.path.join(root, "media000.mp4")) == mtime


def test_gap_seek_matches_sequential(media_root):
    """Sparse gathers (which trigger intra-file seeks) must return
    bit-identical frames to the dense sequential decode."""
    root, _ = media_root
    lib = nb.load()
    path = os.path.join(root, "media001.mp4")
    n, _ = nb.probe(lib, path)
    dense = np.arange(n, dtype=np.int64)
    all_frames = nb.decode_frames(lib, path, dense, 64, 64)
    for stride in (5, 9, 15):
        idx = dense[::stride]
        sparse = nb.decode_frames(lib, path, idx, 64, 64)
        assert np.array_equal(sparse, all_frames[::stride]), stride


def test_gap_seek_matches_sequential_i420(media_root):
    root, _ = media_root
    lib = nb.load()
    path = os.path.join(root, "media001.mp4")
    n, _ = nb.probe(lib, path)
    dense = np.arange(n, dtype=np.int64)
    all_frames = nb.decode_frames_i420(lib, path, dense, 64, 64)
    sparse = nb.decode_frames_i420(lib, path, dense[::9], 64, 64)
    assert np.array_equal(sparse, all_frames[::9])


def test_dataset_native_path_on_fabricated_media(media_root):
    """MRDataset over the fabricated set: real decoded pixels and a real
    audio waveform, static shapes, sane timestamps."""
    root, ann = media_root
    cfg = DataConfig(
        video_folder=root, annotation_file=ann, n_frms=6, image_size=64,
        video_source="native",
    )
    ds = MRDataset(cfg, annotation_path=ann)
    assert len(ds) == 4
    s = ds.get(0, strict=True)
    assert s.video.shape == (6, 64, 64, 3)
    assert s.video.std() > 5.0          # textured content, not blank
    assert s.audio.dtype == np.int16
    assert np.abs(s.audio.astype(np.int32)).mean() > 100  # not silence
    assert s.timestamps.shape == (6,)
    assert s.timestamps[-1] <= 4
    loader = BatchLoader(ds, batch_size=3, num_threads=2)
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0].video.shape == (3, 6, 64, 64, 3)
    assert batches[1].valid.tolist() == [True, False, False]


def test_annotation_schema(media_root):
    _, ann = media_root
    with open(ann) as f:
        rows = [json.loads(l) for l in f]
    assert len(rows) == 4
    for r in rows:
        assert set(r) == {"vid", "qid", "query", "duration", "relevant_windows"}
        (w,) = r["relevant_windows"]
        assert 0 <= w[0] < w[1] <= r["duration"]
