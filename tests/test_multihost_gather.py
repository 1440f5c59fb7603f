"""Multi-host eval-result gathering (round-1 VERDICT missing #6).

``_allgather_results`` had only ever executed with process_count()==1.
Here the multihost collective is simulated for >1 processes: a fake
``process_allgather`` returns exactly what JAX would — each process's
array stacked in process order — so the ragged length/pad/trim
arithmetic runs for real on uneven, unicode-bearing payloads.
"""

import json

import numpy as np
import pytest

import mraudio_tpu.train.trainer as trainer_mod
from mraudio_tpu.train.trainer import _allgather_results


class _FakeMultihost:
    """Simulates process_allgather for a fixed set of per-process
    inputs.  The process under test supplies its own array; the fake
    substitutes the precomputed arrays of every process."""

    def __init__(self, per_process_results, my_index):
        self.per_process = []
        for results in per_process_results:
            payload = json.dumps(results).encode()
            self.per_process.append(payload)
        self.my_index = my_index

    def process_allgather(self, arr):
        arr = np.asarray(arr)
        if arr.dtype == np.int64:  # the lengths round
            assert int(arr[0]) == len(self.per_process[self.my_index])
            return np.stack(
                [np.array([len(p)], np.int64) for p in self.per_process]
            )
        # the padded-payload round
        max_len = max(len(p) for p in self.per_process)
        assert arr.shape == (max_len,), "buffer must be padded to the max"
        rows = []
        for i, p in enumerate(self.per_process):
            row = np.zeros(max_len, np.uint8)
            row[: len(p)] = np.frombuffer(p, np.uint8)
            rows.append(row)
        got = np.asarray(rows[self.my_index])
        np.testing.assert_array_equal(arr, got)
        return np.stack(rows)


@pytest.mark.parametrize("my_index", [0, 1, 2])
def test_ragged_allgather_across_three_hosts(monkeypatch, my_index):
    per_process = [
        [{"qid": 0, "pred_relevant_windows": [[0, 5]], "query": "émoji ✓"}],
        [{"qid": 1, "pred_relevant_windows": [[-1, -1]]},
         {"qid": 2, "pred_relevant_windows": [[3, 9], [12, 20]]}],
        [],  # a host whose shard produced nothing
    ]
    fake = _FakeMultihost(per_process, my_index)

    import jax
    from jax.experimental import multihost_utils

    monkeypatch.setattr(jax, "process_count", lambda: 3)
    monkeypatch.setattr(
        multihost_utils, "process_allgather", fake.process_allgather
    )

    out = _allgather_results(per_process[my_index])
    expected = [r for results in per_process for r in results]
    assert out == expected


def test_single_process_passthrough():
    rows = [{"qid": 7}]
    assert _allgather_results(rows) is rows
