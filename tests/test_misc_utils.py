"""Run logger, profiling, and prepare_data converter tests."""

import json

import numpy as np

from mraudio_tpu.cli.prepare_data import (
    charades_val_split,
    convert_activitynet,
    convert_tacos,
)
from mraudio_tpu.utils.logging import MetricLogger, SmoothedValue
from mraudio_tpu.utils.profiling import StageTimes
from mraudio_tpu.utils.runlog import RunLogger


def test_runlogger_events_and_samples(tmp_path):
    log = RunLogger(str(tmp_path), "test")
    log.log("train_step", loss=1.5, lr=3e-4)
    log.log_samples([1], ["q"], ["[[1 2]]"], ["[[1, 2]]"], ["[[1, 2]]"], [150])
    log.close()
    lines = [json.loads(l) for l in open(log.path)]
    assert lines[0]["event"] == "train_step" and lines[0]["loss"] == 1.5
    assert lines[1]["event"] == "sample" and lines[1]["raw_prediction"] == "[[1 2]]"


def test_stage_times_throughput():
    t = StageTimes()
    with t.stage("decode", items=10):
        pass
    s = t.summary()
    assert s["decode"]["items"] == 10
    assert s["decode"]["items_per_sec"] >= 0


def test_metric_logger_smoothing():
    ml = MetricLogger()
    ml.add_meter("loss", SmoothedValue(window_size=2))
    for v in [1.0, 2.0, 3.0]:
        ml.update(loss=v)
    assert ml.meters["loss"].global_avg == 2.0
    assert ml.meters["loss"].avg == 2.5  # window of 2
    assert "loss" in str(ml)


def test_convert_tacos_rounding(tmp_path):
    path = tmp_path / "tacos.jsonl"
    path.write_text(json.dumps({
        "vid": "s13-d21", "qid": 5, "query": "cuts a cucumber",
        "duration": 123.456, "relevant_windows": [[10.4, 50.6]],
    }) + "\n")
    out = convert_tacos(str(path))
    assert out[0]["qid"] == "TACoS_5"
    assert out[0]["duration"] == 123.46
    assert out[0]["relevant_windows"] == [[10, 51]]
    out_rel = convert_tacos(str(path), relative_time=True)
    w = out_rel[0]["relevant_windows"][0]
    assert 0 <= w[0] <= w[1] <= 100


def test_convert_activitynet(tmp_path):
    path = tmp_path / "anet.json"
    path.write_text(json.dumps({
        "v_abc": {"duration": 100.0, "timestamps": [[0, 30], [40, 90.7]],
                   "sentences": ["first thing", "second thing"]},
    }))
    out = convert_activitynet(str(path))
    assert len(out) == 2
    assert out[0]["qid"] == "ActivityNet_v_abc_0"
    assert out[1]["relevant_windows"] == [[40, 91]]


def test_charades_val_split_deterministic(tmp_path):
    path = tmp_path / "train.txt"
    lines = [f"VID{i:03d} 0.0 5.0##does something {i}" for i in range(1000)]
    path.write_text("\n".join(lines))
    val1, train1 = charades_val_split(str(path), n_val=100)
    val2, train2 = charades_val_split(str(path), n_val=100)
    assert val1 == val2 and len(val1) == 100
    assert not (val1 & train1)


def test_merge_chunks(tmp_path):
    from mraudio_tpu.cli.merge_chunks import merge

    a = tmp_path / "a.jsonl"
    b = tmp_path / "b.jsonl"
    a.write_text(json.dumps({"qid": 1, "pred_relevant_windows": [[0, 1]]}) + "\n"
                 + json.dumps({"qid": 2, "pred_relevant_windows": [[2, 3]]}) + "\n")
    b.write_text(json.dumps({"qid": 3, "pred_relevant_windows": [[4, 5]]}) + "\n"
                 + json.dumps({"qid": 2, "pred_relevant_windows": [[9, 9]]}) + "\n")
    merged = merge([str(a), str(b)])
    assert [r["qid"] for r in merged] == [1, 2, 3]
    assert merged[1]["pred_relevant_windows"] == [[9, 9]]  # last occurrence wins


def test_convert_activitynet_tal(tmp_path):
    from mraudio_tpu.cli.prepare_data import convert_activitynet_tal

    path = tmp_path / "tal.json"
    path.write_text(json.dumps({
        "database": {
            "abc123": {
                "duration": 120.0, "subset": "training",
                "annotations": [
                    {"segment": [5.2, 30.9], "label": "Archery"},
                    {"segment": [60.0, 90.5], "label": "Archery"},
                ],
            },
            "def456": {
                "duration": 60.0, "subset": "validation",
                "annotations": [{"segment": [0.0, 10.0], "label": "Drinking coffee"}],
            },
        }
    }))
    train, val, test, classes = convert_activitynet_tal(str(path))
    assert len(train) == 1 and len(val) == 1 and len(test) == 0
    assert train[0]["vid"] == "v_abc123"
    assert train[0]["relevant_windows"] == [[5, 31, "Archery"], [60, 90, "Archery"]]
    assert classes == ["Archery", "Drinking coffee"]
