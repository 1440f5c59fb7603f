"""Parity tests for the moment-retrieval metric stack vs. the reference."""

import numpy as np
import pytest

from mraudio_tpu.eval import (
    compute_average_precision_detection,
    compute_mr_ap,
    compute_mr_r1,
    compute_temporal_iou_batch_cross,
    compute_temporal_iou_batch_paired,
    eval_submission,
    get_ap,
    interpolated_precision_recall,
)


def _random_windows(rng, n, max_t=150):
    starts = rng.uniform(0, max_t - 1, size=n)
    lengths = rng.uniform(0.5, max_t / 2, size=n)
    return np.stack([starts, np.minimum(starts + lengths, max_t)], axis=1)


def test_paired_iou_matches_reference(reference, rng):
    pred = _random_windows(rng, 64)
    gt = _random_windows(rng, 64)
    np.testing.assert_array_equal(
        compute_temporal_iou_batch_paired(pred, gt),
        reference.mr_utils.compute_temporal_iou_batch_paired(pred, gt),
    )


def test_paired_iou_zero_union():
    pred = np.array([[3.0, 3.0]])
    gt = np.array([[3.0, 3.0]])
    assert compute_temporal_iou_batch_paired(pred, gt)[0] == 0.0


def test_cross_iou_matches_reference(reference, rng):
    s1 = _random_windows(rng, 16)
    s2 = _random_windows(rng, 24)
    iou_a, union_a = compute_temporal_iou_batch_cross(s1, s2)
    iou_b, union_b = reference.mr_utils.compute_temporal_iou_batch_cross(s1, s2)
    np.testing.assert_array_equal(iou_a, iou_b)
    np.testing.assert_array_equal(union_a, union_b)


def test_interpolated_pr_matches_reference(reference, rng):
    for _ in range(20):
        n = int(rng.integers(1, 30))
        precision = rng.uniform(0, 1, size=n)
        recall = np.sort(rng.uniform(0, 1, size=n))
        assert interpolated_precision_recall(precision, recall) == pytest.approx(
            reference.mr_utils.interpolated_precision_recall(precision, recall),
            abs=0,
        )


def _detection_instances(rng, n, vids):
    out = []
    for _ in range(n):
        vid = str(rng.choice(vids))
        st = float(rng.uniform(0, 100))
        out.append({"video-id": vid, "t-start": st, "t-end": st + float(rng.uniform(1, 50))})
    return out


def test_ap_detection_matches_reference(reference, rng):
    vids = [f"v{i}" for i in range(5)]
    for _ in range(10):
        gt = _detection_instances(rng, int(rng.integers(1, 10)), vids)
        pred = _detection_instances(rng, int(rng.integers(0, 15)), vids)
        import copy

        ours = compute_average_precision_detection(copy.deepcopy(gt), copy.deepcopy(pred))
        theirs = reference.mr_utils.compute_average_precision_detection(
            copy.deepcopy(gt), copy.deepcopy(pred)
        )
        np.testing.assert_array_equal(ours, theirs)


def test_get_ap_matches_reference(reference, rng):
    for _ in range(30):
        n = int(rng.integers(3, 40))
        y_true = rng.integers(0, 2, size=n)
        y_pred = rng.uniform(0, 1, size=n)
        ours = get_ap(y_true, y_pred)
        theirs = reference.mr_utils.get_ap(y_true, y_pred)
        assert ours == pytest.approx(theirs, abs=1e-12)


def test_get_ap_degenerate(reference):
    assert get_ap([0, 0, 0], [0.1, 0.2, 0.3]) == 0
    assert get_ap([1, 1], [0.5, 0.2]) == 1


def _make_submission(rng, n_queries, with_saliency=False):
    submission, ground_truth = [], []
    for qid in range(n_queries):
        duration = 150
        n_gt = int(rng.integers(1, 4))
        n_pred = int(rng.integers(1, 4))
        gt_windows = [
            sorted([int(rng.integers(0, 140)), int(rng.integers(10, 150))])
            for _ in range(n_gt)
        ]
        gt_windows = [[a, max(b, a + 2)] for a, b in gt_windows]
        pred_windows = [
            sorted([int(rng.integers(0, 140)), int(rng.integers(10, 150))])
            for _ in range(n_pred)
        ]
        if rng.random() < 0.1:
            pred_windows[0] = [-1, -1]
        sub = {
            "qid": qid,
            "query": f"query {qid}",
            "vid": f"vid{qid}",
            "pred_relevant_windows": pred_windows,
        }
        gt = {
            "qid": qid,
            "query": f"query {qid}",
            "vid": f"vid{qid}",
            "duration": duration,
            "relevant_windows": gt_windows,
        }
        if with_saliency:
            n_clips = duration // 2
            rel_ids = sorted(rng.choice(n_clips, size=5, replace=False).tolist())
            sub["pred_saliency_scores"] = rng.uniform(0, 1, size=n_clips).tolist()
            gt["relevant_clip_ids"] = rel_ids
            gt["saliency_scores"] = rng.integers(0, 5, size=(5, 3)).tolist()
        submission.append(sub)
        ground_truth.append(gt)
    return submission, ground_truth


def test_compute_mr_ap_matches_reference(reference, rng):
    submission, ground_truth = _make_submission(rng, 25)
    ours = compute_mr_ap(submission, ground_truth)
    theirs = reference.mr_eval.compute_mr_ap(
        submission, ground_truth, num_workers=1
    )
    assert ours == theirs


def test_compute_mr_r1_matches_reference(reference, rng):
    submission, ground_truth = _make_submission(rng, 25)
    r1_a, avg_a, miou_a, inv_a = compute_mr_r1(submission, ground_truth)
    r1_b, avg_b, miou_b, inv_b = reference.mr_eval.compute_mr_r1(
        submission, ground_truth
    )
    assert r1_a == r1_b
    assert avg_a == pytest.approx(avg_b, abs=0)
    assert miou_a == pytest.approx(miou_b, abs=0)
    assert inv_a == inv_b


def _patch_reference_pool(monkeypatch, reference):
    """Run the reference scorer without multiprocessing (1-core CI box)."""
    orig = reference.mr_eval.compute_mr_ap

    def no_pool(*args, **kwargs):
        kwargs["num_workers"] = 1
        return orig(*args, **kwargs)

    monkeypatch.setattr(reference.mr_eval, "compute_mr_ap", no_pool)


def test_eval_submission_matches_reference(reference, rng, monkeypatch):
    _patch_reference_pool(monkeypatch, reference)
    submission, ground_truth = _make_submission(rng, 30)
    ours = eval_submission(submission, ground_truth, verbose=False)
    theirs = reference.mr_eval.eval_submission(submission, ground_truth, verbose=False)
    import json

    assert json.dumps(ours) == json.dumps(theirs)


def test_eval_submission_with_saliency_matches_reference(reference, rng, monkeypatch):
    _patch_reference_pool(monkeypatch, reference)
    orig_hl = reference.mr_eval.compute_hl_ap
    monkeypatch.setattr(
        reference.mr_eval,
        "compute_hl_ap",
        lambda p, g, **kw: orig_hl(p, g, num_workers=1),
    )
    submission, ground_truth = _make_submission(rng, 10, with_saliency=True)
    ours = eval_submission(submission, ground_truth, verbose=False)
    theirs = reference.mr_eval.eval_submission(submission, ground_truth, verbose=False)
    import json

    assert json.dumps(ours) == json.dumps(theirs)


def test_eval_submission_self_eval_is_perfect(rng):
    """`eval_submission(results, results)` with preds==GT must score 100
    everywhere — the sanity invariant the reference trainer relies on
    (utils/trainer.py:181)."""
    submission, ground_truth = _make_submission(rng, 8)
    for s, g in zip(submission, ground_truth):
        s["pred_relevant_windows"] = [list(w) for w in g["relevant_windows"]]
        s["relevant_windows"] = g["relevant_windows"]
    merged = [dict(s) for s in submission]
    res = eval_submission(merged, merged, verbose=False)
    assert res["brief"]["MR-full-R1@0.5"] == 100.0
    assert res["brief"]["MR-full-mIoU"] == pytest.approx(1.0)


def test_eval_submission_match_number_false(rng):
    submission, ground_truth = _make_submission(rng, 10)
    res = eval_submission(submission[:5], ground_truth, verbose=False, match_number=False)
    assert "MR-full-R1-avg" in res["brief"]


def test_ap_qid_without_gt_matches_reference(reference):
    """A qid with predictions but no GT entry: the reference's defaultdict
    yields an empty GT list → AP 0 for that qid; parity required."""
    submission = [
        {"qid": 1, "pred_relevant_windows": [[0, 10]]},
        {"qid": 2, "pred_relevant_windows": [[5, 20]]},
    ]
    ground_truth = [
        {"qid": 1, "relevant_windows": [[0, 10]]},
        {"qid": 2, "relevant_windows": [[5, 20]]},
    ]
    # drop qid 2's GT windows only from the AP path via max_gt_windows=0
    ours = compute_mr_ap(submission, ground_truth, max_gt_windows=0)
    theirs = reference.mr_eval.compute_mr_ap(
        submission, ground_truth, max_gt_windows=0, num_workers=1
    )
    assert set(ours) == set(theirs)
    for k in ours:
        # empty GT drives recall through 0/0 → nan in BOTH implementations
        assert (np.isnan(ours[k]) and np.isnan(theirs[k])) or ours[k] == theirs[k]


def test_r1_single_gt_window_tie(reference):
    submission = [{"qid": 0, "pred_relevant_windows": [[10, 20]]}]
    ground_truth = [{"qid": 0, "relevant_windows": [[10, 20], [10, 20]]}]
    ours = compute_mr_r1(submission, ground_truth)
    theirs = reference.mr_eval.compute_mr_r1(submission, ground_truth)
    assert ours[0] == theirs[0] and ours[3] == theirs[3]
