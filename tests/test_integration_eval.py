"""End-to-end integration: inference driver → submission → scorer.

The metric-driven integration pattern of SURVEY §4.5: tiny synthetic
annotations, random-weight model, full driver loop, then score the
produced JSONL with the (reference-parity) scorer and assert the exact
degenerate-metric invariants.
"""

import json

import numpy as np
import pytest

import jax

from mraudio_tpu.config import RunConfig, tiny_data_config, tiny_model_config
from mraudio_tpu.eval.mr_eval import eval_submission
from mraudio_tpu.eval.span_utils import load_jsonl
from mraudio_tpu.infer.evaluate import run_inference
from mraudio_tpu.models.xinstructblip import XInstructBLIP


def _annotations(n):
    return [
        {
            "vid": f"v{i}", "qid": i, "query": f"does thing {i}",
            "duration": 150, "relevant_windows": [[10 * i % 120, 10 * i % 120 + 20]],
        }
        for i in range(n)
    ]


def test_driver_to_scorer_roundtrip(tmp_path):
    cfg = RunConfig(model=tiny_model_config(), data=tiny_data_config(n_frms=4))
    model = XInstructBLIP(cfg.model, audio_cfg=cfg.data.audio)
    params = model.init_params(jax.random.PRNGKey(0))
    anns = _annotations(5)

    out_file = str(tmp_path / "preds.jsonl")
    result = run_inference(
        cfg, model=model, params=params, annotations=anns,
        output_file=out_file, batch_size=2,
    )
    assert len(result["records"]) == 5
    assert result["clips_per_sec"] > 0

    submission = load_jsonl(out_file)
    assert {r["qid"] for r in submission} == set(range(5))
    for record in submission:
        assert isinstance(record["pred_relevant_windows"], list)
        assert "raw_out" in record

    # a random-init byte-level model cannot emit valid windows: every
    # prediction repairs to [[-1, -1]] and the scorer returns exact zeros
    metrics = eval_submission(submission, anns, verbose=False)
    brief = metrics["brief"]
    assert brief["MR-full-invalid_pred_num"] == 5
    assert brief["MR-full-R1@0.5"] == 0.0
    assert brief["MR-full-mAP"] == 0.0


def test_profile_dir_captures_trace(tmp_path):
    """--profile-dir wraps the loop in jax.profiler trace capture."""
    cfg = RunConfig(model=tiny_model_config(), data=tiny_data_config(n_frms=4))
    model = XInstructBLIP(cfg.model, audio_cfg=cfg.data.audio)
    params = model.init_params(jax.random.PRNGKey(0))
    trace_dir = tmp_path / "trace"
    result = run_inference(
        cfg, model=model, params=params, annotations=_annotations(2),
        batch_size=2, profile_dir=str(trace_dir),
    )
    assert len(result["records"]) == 2
    captured = list(trace_dir.rglob("*.xplane.pb")) + list(
        trace_dir.rglob("*.trace.json.gz")
    )
    assert captured, f"no trace artifacts under {trace_dir}"


def test_driver_chunked_union_equals_full(tmp_path):
    cfg = RunConfig(model=tiny_model_config(), data=tiny_data_config(n_frms=4))
    model = XInstructBLIP(cfg.model, audio_cfg=cfg.data.audio)
    params = model.init_params(jax.random.PRNGKey(0))
    anns = _annotations(5)

    chunk_records = []
    for idx in range(2):
        c = cfg.replace(data=cfg.data.replace(num_chunks=2, chunk_idx=idx))
        result = run_inference(
            c, model=model, params=params, annotations=anns, batch_size=2
        )
        chunk_records += result["records"]
    assert sorted(r["qid"] for r in chunk_records) == list(range(5))


def test_fetch_utils(tmp_path):
    from mraudio_tpu.utils.fetch import cached_path, is_url

    assert is_url("https://example.com/x.pth")
    assert not is_url("/tmp/x.pth")
    p = tmp_path / "w.pth"
    p.write_bytes(b"abc")
    assert cached_path(str(p)) == str(p)
    with pytest.raises(FileNotFoundError):
        cached_path(str(tmp_path / "missing.pth"))


def test_saliency_head_lights_up_hl_metrics(tmp_path):
    """With the saliency head enabled, the driver emits
    pred_saliency_scores on the QVH 2s-clip grid and the scorer produces
    the HL-Hit1/HL-mAP section."""
    rng = np.random.default_rng(0)
    cfg = RunConfig(
        model=tiny_model_config().replace(saliency_head=True),
        data=tiny_data_config(n_frms=4),
    )
    model = XInstructBLIP(cfg.model, audio_cfg=cfg.data.audio)
    params = model.init_params(jax.random.PRNGKey(0))
    assert "saliency_head" in params

    anns = []
    for i in range(4):
        n_clips = 150 // 2
        rel = sorted(rng.choice(n_clips, size=5, replace=False).tolist())
        anns.append({
            "vid": f"v{i}", "qid": i, "query": f"act {i}", "duration": 150,
            "relevant_windows": [[10, 30]],
            "relevant_clip_ids": rel,
            "saliency_scores": rng.integers(0, 5, size=(5, 3)).tolist(),
        })

    result = run_inference(cfg, model=model, params=params, annotations=anns,
                           batch_size=2)
    for record in result["records"]:
        assert len(record["pred_saliency_scores"]) == 75

    metrics = eval_submission(result["records"], anns, verbose=False)
    assert "HL-min-VeryGood-mAP" in metrics["brief"]
    assert "HL-min-Fair-Hit1" in metrics["brief"]
