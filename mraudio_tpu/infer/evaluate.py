"""Batched inference driver: dataset → generate → span parse → JSONL.

Re-provides ``evaluate.py`` (reference ``run_inference``,
``evaluate.py:13-60``): stream predictions for an annotation file into a
QVH-submission JSONL with records ``{qid, query, vid,
pred_relevant_windows, raw_out}``.  Differences by design:

* ``--num-chunks/--chunk-idx`` actually shard the annotation list
  (the reference parses and ignores them, ``evaluate.py:72-73``);
* batches are static-shape with a validity mask (padded rows skipped at
  write time);
* per-stage throughput (clips/sec) is first-class output — the
  benchmark metric of this framework.
"""

from __future__ import annotations

import json
import logging
import os
import time

import numpy as np

from mraudio_tpu.config import RunConfig
from mraudio_tpu.data.annotations import chunk_annotations, load_annotations
from mraudio_tpu.data.dataset import BatchLoader, MRDataset
from mraudio_tpu.text.postprocess import moment_str_to_list, post_process

logger = logging.getLogger("mraudio_tpu")


def saliency_to_clip_grid(frame_times, scores, duration) -> list:
    """Resample per-frame saliency onto the QVH 2s-clip grid (one score
    per clip, ``eval/mr_eval.py:279-288``)."""
    num_clips = max(int(duration / 2), 1)
    clip_centers = 2.0 * np.arange(num_clips) + 1.0
    return np.interp(
        clip_centers, np.asarray(frame_times, np.float64), np.asarray(scores)
    ).tolist()


def run_inference(
    cfg: RunConfig,
    model=None,
    params=None,
    annotations: list[dict] | None = None,
    output_file: str | None = None,
    batch_size: int = 2,
    num_workers: int = 2,
    profile_dir: str | None = None,
    batch_fallback: bool = True,
) -> dict:
    """Returns {'records': [...], 'clips_per_sec': float, 'batch_size': int}.

    ``batch_fallback``: on a device ``RESOURCE_EXHAUSTED`` the driver
    halves the batch size and restarts (static shapes mean an OOM can
    only strike the first execution of a program, so nothing meaningful
    is lost) — the dominant failure mode of near-capacity 16 GB
    configs becomes a logged slowdown instead of a dead run."""
    if model is None:
        from mraudio_tpu.models.factory import build_model

        model = build_model(cfg)
    if params is None:
        import jax

        params = model.init_params(jax.random.PRNGKey(cfg.train.seed))
    from mraudio_tpu.models.casting import cast_params_for_inference

    params = cast_params_for_inference(params)
    if getattr(cfg, "quant_encoders", False):
        from mraudio_tpu.models.quant_tree import quantize_subtrees

        params = quantize_subtrees(
            params, getattr(model, "ENCODER_PARAM_KEYS", ())
        )

    mesh_ctx = None
    if cfg.mesh.num_devices > 1:
        import jax

        from mraudio_tpu.parallel import make_mesh, shard_params

        mesh = make_mesh(cfg.mesh)
        mesh_ctx = jax.set_mesh(mesh)
        mesh_ctx.__enter__()
        params = shard_params(params, mesh)

    if annotations is None:
        annotations = load_annotations(cfg.data.annotation_file)
    annotations = chunk_annotations(
        annotations, cfg.data.num_chunks, cfg.data.chunk_idx
    )

    # Preflight: prove the static timestamp/duration token budgets hold
    # for this dataset's value range (silent truncation would corrupt
    # the interleave; the reference pads-to-longest and cannot truncate).
    if hasattr(model, "prepare_text") and annotations:
        from mraudio_tpu.text.tokenizer import validate_time_budgets

        max_dur = int(max(a["duration"] for a in annotations)) + 1
        validate_time_budgets(model.llm_tokenizer, model.cfg, max_dur)

    dataset = MRDataset(cfg.data, annotations=annotations, split="eval")

    import contextlib

    from mraudio_tpu.utils.profiling import StageTimes, profile_to

    # --profile-dir: capture an xprof/TensorBoard device trace of the
    # whole inference loop (stage names from StageTimes annotate it).
    trace_ctx = profile_to(profile_dir) if profile_dir else contextlib.nullcontext()
    want_saliency = cfg.model.saliency_head and hasattr(model, "saliency_scores")

    def emit(batch, outputs, saliency, records, counter):
        for row, (qid, query, vid, raw_out, dur, valid) in enumerate(zip(
            batch.qid, batch.query, batch.vid, outputs, batch.duration,
            batch.valid,
        )):
            if not valid:
                continue
            windows = moment_str_to_list(post_process(raw_out))
            # Relative time-format experiments emit 0-100 / 0-1 values;
            # scale back to seconds before scoring
            # (utils/utils.py:306-361 counterpart, window-level).
            fmt = cfg.model.time_format
            if fmt in ("relative_integers", "relative_floats"):
                div = 100.0 if fmt == "relative_integers" else 1.0
                windows = [
                    [round(w[0] / div * dur, 2), round(w[1] / div * dur, 2)]
                    if len(w) == 2 and -1 not in w
                    else w
                    for w in windows
                ]
            record = {
                "qid": qid,
                "query": query,
                "vid": vid,
                "pred_relevant_windows": windows,
                "raw_out": raw_out,
            }
            if saliency is not None:
                # single fused jit: decode + saliency share the encoder pass
                record["pred_saliency_scores"] = saliency_to_clip_grid(
                    batch.timestamps[row], saliency[row], dur
                )
            records.append(record)
            counter[0] += 1

    # Two-deep pipeline: batch i+1's host->device transfer AND batch
    # i+1's dispatch are both issued before batch i's tokens are read
    # back, so the device queue never drains across the readback +
    # span-parse gap (dispatch is async; the readback is the only sync
    # point).  Models without generate_submit fall back to a one-shot
    # generate inside `finalize`.
    if hasattr(model, "generate_submit"):
        def submit(batch, dev_in):
            return model.generate_submit(params, batch, device_inputs=dev_in)

        def finalize(pending):
            if want_saliency:
                return model.generate_finalize(pending, return_saliency=True)
            return model.generate_finalize(pending), None
    else:
        def submit(batch, dev_in):
            return (batch, dev_in)

        def finalize(pending):
            b, d = pending
            if want_saliency:
                return model.generate(params, b, device_inputs=d,
                                      return_saliency=True)
            return model.generate(params, b, device_inputs=d), None

    def attempt(bs):
        """One full pass at batch size ``bs``; returns
        (records, n_clips, elapsed, times)."""
        loader = BatchLoader(
            dataset, bs, shuffle=False, num_threads=max(num_workers, 1)
        )
        times = StageTimes()
        records: list[dict] = []
        counter = [0]
        start = time.time()
        it = iter(loader)
        current = next(it, None)
        dev = model.device_inputs(current) if current is not None else None
        inflight = None  # (batch, pending-dispatch)
        while current is not None or inflight is not None:
            if current is not None:
                batch, batch_dev = current, dev
                current = next(it, None)
                dev = model.device_inputs(current) if current is not None else None
                submitted = (batch, submit(batch, batch_dev))
            else:
                submitted = None
            if inflight is not None:
                pbatch, pending = inflight
                with times.stage("generate", items=int(pbatch.valid.sum())):
                    outputs, saliency = finalize(pending)
                with times.stage("parse_write"):
                    emit(pbatch, outputs, saliency, records, counter)
            inflight = submitted
        return records, counter[0], time.time() - start, times

    trace_ctx.__enter__()
    bs = batch_size
    while True:
        try:
            records, n_clips, elapsed, times = attempt(bs)
            break
        except Exception as e:
            if not (batch_fallback and bs > 1 and _is_oom(e)):
                trace_ctx.__exit__(None, None, None)
                raise
            bs = max(bs // 2, 1)
            logger.warning(
                "device RESOURCE_EXHAUSTED at batch_size=%d; retrying the "
                "run at batch_size=%d (static shapes: the failed program "
                "never produced results, nothing is lost)", bs * 2, bs,
            )
    trace_ctx.__exit__(None, None, None)
    clips_per_sec = n_clips / elapsed if elapsed > 0 else 0.0
    logger.info(
        "inference: %d clips in %.2fs (%.3f clips/sec); stages: %s",
        n_clips, elapsed, clips_per_sec, times.summary(),
    )

    if mesh_ctx is not None:
        mesh_ctx.__exit__(None, None, None)

    if output_file:
        os.makedirs(os.path.dirname(os.path.abspath(output_file)), exist_ok=True)
        with open(output_file, "w") as f:
            for record in records:
                f.write(json.dumps(record) + "\n")
    return {"records": records, "clips_per_sec": clips_per_sec,
            "batch_size": bs}


def _is_oom(e: Exception) -> bool:
    """True for a device out-of-memory error.  XLA surfaces these as
    ``jax.errors.JaxRuntimeError`` (an ``XlaRuntimeError`` alias) whose
    message leads with the gRPC status name."""
    return "RESOURCE_EXHAUSTED" in str(e)
