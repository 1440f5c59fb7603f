import json

import numpy as np
import pytest

from mraudio_tpu.config import tiny_data_config
from mraudio_tpu.data import (
    MRDataset,
    chunk_annotations,
    load_annotations,
    sample_frame_indices,
)
from mraudio_tpu.data.dataset import BatchLoader, collate
from mraudio_tpu.data.sampling import frame_timestamps
from mraudio_tpu.data.video import SyntheticVideoSource


def _write_annotations(tmp_path, n=10):
    path = str(tmp_path / "ann.jsonl")
    with open(path, "w") as f:
        for i in range(n):
            f.write(
                json.dumps(
                    {
                        "vid": f"vid{i}",
                        "qid": i,
                        "query": f"query number {i}",
                        "duration": 150,
                        "relevant_windows": [[10 * i % 140, 10 * i % 140 + 10]],
                    }
                )
                + "\n"
            )
    return path


def test_uniform_sampling_matches_reference_semantics():
    # reference: np.linspace(0, vlen, num=n_frms, endpoint=False).astype(int)
    for vlen, n_frms in [(100, 60), (300, 60), (59, 60), (20, 20), (7, 20)]:
        ours = sample_frame_indices(vlen, n_frms, "uniform")
        num = min(n_frms, vlen)
        ref = np.linspace(0, vlen, num=num, endpoint=False).astype(int)
        np.testing.assert_array_equal(ours[:num], ref)
        assert len(ours) == n_frms
        # padding repeats the final index
        assert (ours[num:] == ref[-1]).all()
        assert (ours < vlen).all()


def test_random_sampling_within_intervals():
    rng = np.random.default_rng(0)
    vlen, n_frms = 240, 60
    idx = sample_frame_indices(vlen, n_frms, "random", rng=rng)
    edges = np.linspace(0, vlen, num=n_frms + 1).astype(int)
    assert len(idx) == n_frms
    for i, (lo, hi) in enumerate(zip(edges[:-1], edges[1:])):
        assert lo <= idx[i] <= max(lo, hi - 1)


def test_frame_timestamps_rounding():
    assert frame_timestamps(np.array([0, 15, 45]), 30.0) == [0, 0, 2]
    # banker's rounding like the reference's round()
    assert frame_timestamps(np.array([15]), 30.0) == [0]
    assert frame_timestamps(np.array([45]), 30.0) == [2]


def test_chunking_covers_everything():
    anns = list(range(23))
    chunks = [chunk_annotations(anns, 4, i) for i in range(4)]
    assert sum(chunks, []) == anns
    assert max(len(c) for c in chunks) - min(len(c) for c in chunks) <= 1
    with pytest.raises(ValueError):
        chunk_annotations(anns, 4, 4)


def test_dataset_shapes(tmp_path):
    cfg = tiny_data_config(n_frms=4)
    path = _write_annotations(tmp_path)
    ds = MRDataset(cfg, annotation_path=path)
    s = ds.get(0)
    assert s.video.shape == (4, 28, 28, 3) and s.video.dtype == np.uint8
    assert s.audio.shape == (ds.audio_num_samples,)
    assert s.timestamps.shape == (4,)
    assert s.text_input.startswith("Query: query number 0\n")
    assert s.text_output.startswith("[[")


def test_collate_pads_and_masks(tmp_path):
    cfg = tiny_data_config(n_frms=4)
    ds = MRDataset(cfg, annotation_path=_write_annotations(tmp_path, n=3))
    samples = [ds.get(i) for i in range(3)]
    batch = collate(samples, 8)
    assert batch.video.shape[0] == 8
    assert batch.valid.sum() == 3
    assert batch.qid[:3] == [0, 1, 2]


def test_batch_loader_order_and_prefetch(tmp_path):
    cfg = tiny_data_config(n_frms=4)
    ds = MRDataset(cfg, annotation_path=_write_annotations(tmp_path, n=10))
    loader = BatchLoader(ds, batch_size=4, shuffle=False)
    batches = list(loader)
    assert len(batches) == 3
    qids = [q for b in batches for q, v in zip(b.qid, b.valid) if v]
    assert qids == list(range(10))

    # shuffled ordering is a permutation and epoch-dependent
    loader = BatchLoader(ds, batch_size=4, shuffle=True, seed=1)
    loader.set_epoch(0)
    first = [q for b in loader for q, v in zip(b.qid, b.valid) if v]
    loader.set_epoch(1)
    second = [q for b in loader for q, v in zip(b.qid, b.valid) if v]
    assert sorted(first) == list(range(10))
    assert first != second


def test_batch_loader_sharding(tmp_path):
    cfg = tiny_data_config(n_frms=4)
    ds = MRDataset(cfg, annotation_path=_write_annotations(tmp_path, n=10))
    seen = []
    for rank in range(2):
        loader = BatchLoader(ds, batch_size=4, shard_index=rank, shard_count=2)
        seen += [q for b in loader for q, v in zip(b.qid, b.valid) if v]
    assert sorted(seen) == list(range(10))


def test_batch_loader_iter_from(tmp_path):
    """Mid-epoch resume path: iter_from(k) yields exactly the batches a
    full iteration yields from k on, WITHOUT building the skipped ones
    (resume after preemption must not pay decode/collate for batches it
    throws away)."""
    cfg = tiny_data_config(n_frms=4)
    ds = MRDataset(cfg, annotation_path=_write_annotations(tmp_path, n=10))
    loader = BatchLoader(ds, batch_size=2, shuffle=True, seed=3)
    loader.set_epoch(1)

    full = [tuple(b.qid) for b in loader]
    calls = []
    orig_get = ds.get
    ds.get = lambda i: (calls.append(i), orig_get(i))[1]
    tail = [tuple(b.qid) for b in loader.iter_from(3)]
    ds.get = orig_get
    assert tail == full[3:]
    assert len(calls) == 2 * len(tail)   # skipped batches never built

    assert [tuple(b.qid) for b in loader.iter_from(0)] == full
    assert list(loader.iter_from(len(full))) == []


def test_synthetic_video_deterministic():
    src = SyntheticVideoSource()
    vlen, fps = src.probe("a.mp4")
    f1 = src.get_batch("a.mp4", np.array([0, 5]), 16, 16)
    f2 = src.get_batch("a.mp4", np.array([0, 5]), 16, 16)
    np.testing.assert_array_equal(f1, f2)
    f3 = src.get_batch("b.mp4", np.array([0, 5]), 16, 16)
    assert not np.array_equal(f1, f3)


def test_decode_failure_falls_back_to_blank(tmp_path):
    from mraudio_tpu.data.video import VideoSource

    class FailingSource(VideoSource):
        def probe(self, path):
            raise IOError("corrupt file")

    cfg = tiny_data_config(n_frms=4)
    path = _write_annotations(tmp_path, n=1)
    ds = MRDataset(cfg, annotation_path=path, video_source=FailingSource())
    s = ds.get(0)  # non-strict: blank fallback
    assert s.video.sum() == 0 and s.audio.sum() == 0
    with pytest.raises(IOError):
        ds.get(0, strict=True)
