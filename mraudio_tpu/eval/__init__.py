from mraudio_tpu.eval.mr_eval import (
    compute_mr_ap,
    compute_mr_r1,
    eval_highlight,
    eval_moment_retrieval,
    eval_submission,
)
from mraudio_tpu.eval.span_utils import (
    compute_average_precision_detection,
    compute_temporal_iou_batch_cross,
    compute_temporal_iou_batch_paired,
    get_ap,
    interpolated_precision_recall,
    load_jsonl,
)

__all__ = [
    "eval_submission",
    "eval_moment_retrieval",
    "eval_highlight",
    "compute_mr_ap",
    "compute_mr_r1",
    "compute_temporal_iou_batch_paired",
    "compute_temporal_iou_batch_cross",
    "compute_average_precision_detection",
    "interpolated_precision_recall",
    "get_ap",
    "load_jsonl",
]
