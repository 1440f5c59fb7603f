"""Serving driver: continuous-batched moment retrieval over a request
stream.

Wires ``infer/serving.py::ContinuousBatcher`` to the real model surface
(the round-1 review flagged the engine as an island).  Requests come
from an annotation JSONL; each is encoded (encoders + interleave, the
same single-jit prefix the batch driver uses), prefilled into a free
decode slot, and decoded continuously — a finished slot frees
immediately instead of waiting on the batch.  Reports per-request
latency percentiles and requests/sec; ``--sweep-slots`` measures the
slot-count → throughput curve.

No reference counterpart: the reference serves nothing (its
``evaluate.py`` is batch-only).  This is a capability addition.
"""

from __future__ import annotations

import argparse
import json
import logging
import time

import numpy as np

logger = logging.getLogger("mraudio_tpu")


def encode_request_stream(model, params, dataset, limit=None,
                          device_embeds=True, encode_batch=1,
                          host_ahead=1, upload_ahead=False):
    """Per-annotation prefix embeds via the model's fused encoder pass,
    yielded one at a time so the serve loop can interleave encodes with
    in-flight decode dispatches (``--encode-mode inline``).

    ``encode_batch`` > 1 runs the encoder pass over groups of requests in
    ONE fused dispatch — the encoder is MXU-bound, so a B-wide pass costs
    far less than B B=1 passes plus their per-dispatch host round trips.
    Measured at QVH full size the B=1 encode is the serving pipeline's
    dominant cost (~13 s/request inline vs ~1.7 s/clip amortized in the
    B=3 offline driver).  Short tail groups are padded by repeating the
    last sample (one compiled shape); padded outputs are discarded.

    ``host_ahead``: encode groups whose HOST stage (sample synthesis/
    decode, collate, tokenize — GIL-bound CPU work) a worker thread
    prepares ahead, so it overlaps the serve loop's device-blocked waits.
    The DEVICE stage (upload + encoder dispatch) stays in the consumer:
    prefetching whole encoded requests would buffer extra ~44 MB
    device-resident prefixes, and the full-size deployable config sits
    close enough to the 16 GB line that even ONE extra prefix OOMs the
    decode dispatch (measured) — host batches are plain numpy and queue
    safely in host RAM.  0 = fully synchronous.  Record-identical either
    way (single worker, FIFO)."""
    import jax
    import jax.numpy as jnp

    from mraudio_tpu.data.dataset import collate
    from mraudio_tpu.infer.serving import Request

    n = len(dataset) if limit is None else min(limit, len(dataset))
    eb = max(1, encode_batch)

    def host_batches():
        for g0 in range(0, n, eb):
            idx = list(range(g0, min(g0 + eb, n)))
            padded = idx + [idx[-1]] * (eb - len(idx))
            batch = collate([dataset.get(i) for i in padded], len(padded))
            text = model.prepare_text(
                batch.text_input, np.asarray(batch.timestamps),
                batch.duration,
            )
            # upload_ahead: issue the BULK input uploads here (async
            # device_put) — when this generator runs in the prefetch
            # worker, the ~9 MB of uint8 frames + int16 waveform per
            # request ride the wire while the serve loop's device work
            # (decode dispatches, admission chunks) is in flight, instead
            # of serializing in front of the encoder dispatch.  OPT-IN
            # and off by default: the full-size deployable config runs
            # within tens of MB of the 16 GB line during decode, and
            # even the ~18 MB/group of early-resident input buffers was
            # measured to RESOURCE_EXHAUSTED a run — and a worker-thread
            # OOM bypasses the loop's drain-and-retry recovery, so on
            # failure we fall back to lazy upload (device_stage), which
            # that recovery does cover.
            dev = None
            if upload_ahead:
                staged = []
                try:
                    for a in (batch.video, batch.audio):
                        staged.append(jax.device_put(a))
                    dev = tuple(staged)
                except Exception as e:
                    # free any buffer that DID land before falling back or
                    # re-raising — a leaked partial stage makes the lazy
                    # retry (or the caller's recovery) likelier to OOM
                    for d in staged:
                        d.delete()
                    if "RESOURCE_EXHAUSTED" not in str(e):
                        raise
                    logger.warning(
                        "upload-ahead device_put RESOURCE_EXHAUSTED; "
                        "falling back to lazy upload for this group"
                    )
            yield idx, batch, text, dev

    groups = (_PrefetchedStream(host_batches(), host_ahead)
              if host_ahead > 0 else host_batches())

    def device_stage(idx, batch, text, dev):
        if dev is None:
            dev = (jnp.asarray(batch.video), jnp.asarray(batch.audio))
        dev_video, dev_audio = dev
        embeds, mask = model._prefix_and_prompt(
            params,
            dev_video, dev_audio,
            jnp.asarray(text.qformer_ids), jnp.asarray(text.qformer_mask),
            jnp.asarray(text.ts_ids), jnp.asarray(text.ts_mask),
            jnp.asarray(text.dur_ids), jnp.asarray(text.dur_mask),
            jnp.asarray(text.prompt_ids), jnp.asarray(text.prompt_mask),
            n_frms=batch.timestamps.shape[1],
        )
        # host-derived mask (identical to the device `mask` — tested):
        # reading the device mask back would SYNC on the encode dispatch
        # and everything queued before it, serializing every encode
        # group against in-flight decode; host-side the encode dispatch
        # stays fully async and rides the device queue
        mask_h = model.prefix_mask_host(text, batch.timestamps.shape[1])
        for k, i in enumerate(idx):
            # device_embeds=True: embeds stay DEVICE-resident (the engine
            # stacks them on device at admission) — reading the (S, 4096)
            # bf16 prefix back to host and re-uploading it at prefill
            # costs ~8 s/request through a remote tunnel, more than the
            # encoder pass itself.  The cost is HBM: each buffered request
            # holds its ~44 MB (QVH full size) prefix on the chip, so this
            # is the INLINE-mode default (at most one admission batch is
            # ever buffered).
            # device_embeds=False: pull the prefix to host — upfront mode
            # buffers EVERY request before serving starts, and N device-
            # resident prefixes next to the prefill temps OOM a 16 GB
            # chip at full size (measured at N=10); host-resident is the
            # memory-safe upfront default, one extra upload per admission.
            emb = embeds[k] if device_embeds else np.asarray(embeds[k])
            # prompt-lookup hint stream for speculative drafting: the
            # valid timestamp/duration/query token ids of this request
            # (host-side lists — tiny next to the embeds)
            hints = np.concatenate([
                np.asarray(text.ts_ids)[k].reshape(-1)[
                    np.asarray(text.ts_mask)[k].reshape(-1) > 0],
                np.asarray(text.dur_ids)[k][np.asarray(text.dur_mask)[k] > 0],
                np.asarray(text.prompt_ids)[k][
                    np.asarray(text.prompt_mask)[k] > 0],
            ])
            logger.info("encoded request %d/%d", i + 1, n)
            yield (Request(i, emb, mask_h[k], hint_ids=hints),
                   dataset.annotation[i])

    return _EncodeStream(
        groups, device_stage,
        groups if isinstance(groups, _PrefetchedStream) else None,
        host_ahead if host_ahead > 0 else 0,
    )


class _EncodeStream:
    """Iterator of ``(Request, ann)`` over encode groups.

    Carries the host-prefetch accounting (``host_ahead`` groups ahead;
    ``host_busy_s`` = worker wall time) so ``serve`` can report the
    overlap in its stats, and owns the encode-OOM backpressure: the
    full-size deployable config sits near the 16 GB line, and the
    allocator's run-to-run variance through a remote runtime can
    RESOURCE_EXHAUSTED an encode dispatch that usually fits next to the
    in-flight decode state (observed).  When ``serve`` installs
    ``oom_recover`` (drain every in-flight decode so slot scratch frees),
    a failed group encode recovers and retries ONCE — turning an
    allocator hiccup into a logged latency blip, exactly like the
    offline driver's batch-halving restart.  Static shapes mean the
    failed dispatch produced nothing, so the retry is output-identical.
    """

    def __init__(self, groups, device_stage, prefetch, host_ahead: int):
        from collections import deque

        self._groups = groups
        self._device_stage = device_stage
        self._prefetch = prefetch
        self.host_ahead = host_ahead
        self.oom_recover = None
        self._buf = deque()

    @property
    def host_busy_s(self) -> float:
        return self._prefetch.busy_s if self._prefetch is not None else 0.0

    def __iter__(self):
        return self

    def __next__(self):
        while not self._buf:
            group = next(self._groups)       # StopIteration ends the stream
            try:
                items = list(self._device_stage(*group))
            except Exception as e:
                if ("RESOURCE_EXHAUSTED" not in str(e)
                        or self.oom_recover is None):
                    raise
                logger.warning(
                    "encode dispatch RESOURCE_EXHAUSTED next to in-flight "
                    "decode state; draining the engine and retrying once"
                )
                self.oom_recover()
                items = list(self._device_stage(*group))
            self._buf.extend(items)
        return self._buf.popleft()


def encode_requests(model, params, dataset, limit=None, device_embeds=False,
                    encode_batch=1, host_ahead=1, upload_ahead=False):
    """Upfront (fully pre-encoded) request list — host-resident embeds by
    default (see ``encode_request_stream`` on the HBM trade).  The host-
    stage prefetch helps here too: group k+1's synthesis/tokenize runs
    while group k's encoder dispatch blocks."""
    return list(encode_request_stream(
        model, params, dataset, limit=limit, device_embeds=device_embeds,
        encode_batch=encode_batch, host_ahead=host_ahead,
        upload_ahead=upload_ahead,
    ))


class _PrefetchedStream:
    """Bounded single-worker prefetch over an iterator (FIFO, order-
    preserving; exceptions surface on the consumer side).

    Used for the encode HOST stage: that work (sample synthesis/decode,
    tokenization) is GIL-bound CPU time that otherwise runs serially
    inside the serve loop, while the loop spends most of its time BLOCKED
    on device round trips (prefill dispatches, decode token readbacks) —
    the worker lets the two overlap on this 1-core host.  Deliberately
    NOT used for whole encoded requests: those carry device-resident
    prefix embeds (~44 MB each at QVH full size), and the full-size
    deployable config is close enough to the 16 GB line that buffering
    even one extra prefix OOMs the decode dispatch (measured at
    ahead=1).  Host batches are plain numpy and queue safely in RAM.

    ``busy_s`` accumulates the worker's wall time per item — the host-
    stage cost actually paid, vs the loop's blocking wait which ``serve``
    reports as ``encode_s`` (their difference is the overlap won).
    """

    _DONE = object()

    def __init__(self, stream, ahead: int):
        import queue
        import threading

        self._q = queue.Queue(maxsize=max(1, ahead))
        self.busy_s = 0.0
        self._err = None

        def work():
            try:
                while True:
                    t0 = time.time()
                    item = next(stream, self._DONE)
                    self.busy_s += time.time() - t0
                    self._q.put(item)
                    if item is self._DONE:
                        return
            except BaseException as e:  # surfaced on the consumer side
                self._err = e
                self._q.put(self._DONE)

        self._thread = threading.Thread(target=work, daemon=True)
        self._thread.start()

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._DONE:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item


def poisson_arrivals(n: int, rate: float, seed: int = 0) -> list:
    """Open-loop Poisson arrival offsets (seconds): ``n`` points with
    exponential inter-arrival gaps at ``rate`` req/s.  Seeded and
    reproducible — the bench quotes latency-vs-λ curves on the same
    draw across runs."""
    rng = np.random.default_rng(seed)
    gaps = rng.exponential(1.0 / rate, size=n)
    gaps[0] = 0.0  # first request arrives at t=0 (work starts immediately)
    return np.cumsum(gaps).tolist()


def serve(model, params, requests, max_slots: int, max_new_tokens: int,
          max_prefill_batch: int = 0, steps_per_dispatch: int = 1,
          spec_width: int = 1, pipeline_depth: int = 2,
          encode_s: float = 0.0, request_stream=None, encode_batch: int = 1,
          engine_cache: dict | None = None, arrivals=None,
          request_timeout_s: float = 0.0):
    """Run the stream through the engine; returns (records, stats).

    ``requests`` is a pre-encoded list (upfront mode: encoder time is
    reported separately as ``encode_s``).  Alternatively pass
    ``request_stream``, an iterator of ``(Request, ann)`` — inline mode:
    requests are encoded INSIDE the serve loop, at most one admission
    batch ahead, so encoder dispatches interleave with in-flight decode
    dispatches and the quoted requests/sec includes everything a
    production deployment pays.  Device-resident prefix embeds make the
    encode-ahead buffer cheap (~44 MB bf16/request at QVH full size, no
    host round trip).  Build the stream with
    ``encode_request_stream(..., host_ahead=N)`` to overlap its host
    stage with this loop's device-blocked waits (stats report the
    stream's ``host_ahead``/``host_busy_s``).

    ``arrivals``: per-request arrival-time offsets (seconds, aligned
    with ``requests``) — LOAD mode: each request becomes visible to the
    admission logic only once its offset elapses, latency is measured
    from ARRIVAL (queueing included), and admissions take whatever has
    arrived instead of waiting to fill a batch.  Use
    ``poisson_arrivals`` for an open-loop Poisson process.

    ``request_timeout_s``: per-request deadline (0 = none).  A request
    older than this — queued, mid-admission, or mid-decode — is
    CANCELLED (``ContinuousBatcher.cancel`` frees its slot mid-decode;
    other slots' tokens are unaffected) and reported in
    ``stats["timeouts"]`` instead of the completion records."""
    from mraudio_tpu.infer.serving import ContinuousBatcher
    from mraudio_tpu.text.postprocess import moment_str_to_list, post_process

    scheduled: list = []
    if arrivals is not None:
        assert requests and len(arrivals) == len(requests), \
            "arrivals must align with a pre-encoded requests list"
        assert request_stream is None, "load mode is upfront-encoded"
        order = sorted(range(len(requests)), key=lambda i: arrivals[i])
        scheduled = [(float(arrivals[i]), requests[i]) for i in order]
        pending = []
        ann_by_id = {req.request_id: ann for req, ann in requests}
    else:
        pending = list(requests) if requests else []
        ann_by_id = {req.request_id: ann for req, ann in pending}
    inline = request_stream is not None
    stream_obj = request_stream
    prime_s = 0.0
    if inline:
        # prime one request so the engine can size itself; this encode
        # can overlap nothing, so it counts toward elapsed below
        t0 = time.time()
        item = next(request_stream, None)
        prime_s = time.time() - t0
        if item is None:
            request_stream = None
        else:
            pending.append(item)
            ann_by_id[item[0].request_id] = item[1]
    if not pending and not scheduled:
        # empty annotation file / exhausted stream: a well-formed empty
        # result beats the IndexError a user-facing CLI would otherwise
        # surface from pending[0]
        return [], {
            "requests": 0, "slots": max_slots, "elapsed_s": 0.0,
            "requests_per_sec": 0.0,
            "encode_mode": "inline" if inline else "upfront",
        }
    first_req = (pending[0] if pending else scheduled[0][1])[0]
    prefix_len = first_req.prefix_embeds.shape[0]
    # engine_cache: a caller-owned dict that keeps ONE engine alive
    # across serve() calls (a production process serves forever with one
    # engine; measurement drivers that rebuilt it per run re-paid the
    # per-instance jit re-trace + compile-cache deserialization, ~20 s
    # of a 45 s run).  Reused only when every engine-shaping knob
    # matches; otherwise the old engine is closed and rebuilt.
    # params identity is part of the key: a cached engine pins the
    # weights captured at construction, and reusing it after a
    # checkpoint swap would silently decode with stale weights
    engine_key = (prefix_len, max_new_tokens, max_slots, max_prefill_batch,
                  steps_per_dispatch, spec_width, pipeline_depth,
                  id(model.llm), id(params["llm"]))
    engine = None
    if (engine_cache is not None and engine_cache.get("key") == engine_key
            and engine_cache.get("engine") is not None):
        # the .get("engine") guard covers a cache left with a stale key but
        # no engine (eviction mid-rebuild, or the exception path below)
        engine = engine_cache["engine"]
        engine.reset()
    if engine is None:
        if engine_cache is not None:
            old = engine_cache.pop("engine", None)
            engine_cache.pop("key", None)
            if old is not None:
                old.close()
        engine = ContinuousBatcher(
            model.llm, {"params": params["llm"]}, prefix_len,
            max_new_tokens, model.llm_tokenizer.eos_token_id,
            max_slots=max_slots,
            max_prefill_batch=max_prefill_batch,
            steps_per_dispatch=steps_per_dispatch,
            spec_width=spec_width,
            pipeline_depth=pipeline_depth,
        )
        if engine_cache is not None:
            engine_cache["key"] = engine_key
            engine_cache["engine"] = engine

    try:
        submit_time, records = {}, []
        done = set()  # completed or timed-out request ids
        t_start = time.time() - prime_s  # the priming encode is serving time

        def handle(completion):
            done.add(completion.request_id)
            tokens = np.asarray(completion.token_ids)
            tokens[tokens == 0] = model.llm_tokenizer.eos_token_id
            raw = model.llm_tokenizer.decode(tokens, skip_special_tokens=True).strip()
            ann = ann_by_id[completion.request_id]
            records.append({
                "qid": ann["qid"],
                "query": ann["query"],
                "vid": ann["vid"],
                "pred_relevant_windows": moment_str_to_list(post_process(raw)),
                "raw_out": raw,
                "latency_s": round(time.time() - submit_time[completion.request_id], 4),
            })

        if inline and hasattr(stream_obj, "oom_recover"):
            # Encode-OOM backpressure (see _EncodeStream): drain every
            # in-flight decode so its scratch frees, then the stream retries
            # the failed encode dispatch once.  Completions surfaced during
            # the drain are handled normally.
            def _drain_for_encode():
                import gc

                while engine.admission_pending():
                    engine.admission_step()
                while engine.active.any() or engine._inflight:
                    for completion in engine.step():
                        handle(completion)
                gc.collect()  # drop just-freed device buffers before retrying

            stream_obj.oom_recover = _drain_for_encode

        # Stage attribution: a decode "step" is one engine dispatch (1 token,
        # K window tokens, or a W-wide verify pass) INCLUDING its token
        # readback — on remote-attached devices the host round trip is part
        # of the real per-step cost, which is exactly what this breakdown is
        # for (sec_per_decode_step vs the device-only HBM floor).
        prefill_s = decode_s = inline_encode_s = 0.0
        prefill_calls = decode_steps = 0
        timeouts: list = []

        def enforce_timeouts(now):
            """Cancel every request older than its deadline — queued
            (never admitted) or in the engine (slot freed mid-decode)."""
            if not request_timeout_s:
                return
            overdue = [
                rid for rid, t in submit_time.items()
                if now - t > request_timeout_s and rid not in done
            ]
            for rid in overdue:
                done.add(rid)
                # cancel in the engine (active or mid-admission) and/or
                # drop from the not-yet-admitted queue
                engine.cancel(rid)
                for k, (req, _) in enumerate(pending):
                    if req.request_id == rid:
                        del pending[k]
                        break
                ann = ann_by_id[rid]
                timeouts.append({
                    "_rid": rid, "qid": ann["qid"], "vid": ann["vid"],
                    "timeout_s": round(now - submit_time[rid], 3),
                })

        while (pending or scheduled or request_stream is not None
               or engine.active.any() or engine.admission_pending()
               or engine._inflight):
            now = time.time()
            if scheduled:
                # release arrived requests; latency clock starts at
                # ARRIVAL (queue wait is part of the served latency)
                while scheduled and t_start + scheduled[0][0] <= now:
                    off, item = scheduled.pop(0)
                    pending.append(item)
                    submit_time[item[0].request_id] = t_start + off
                if (not pending and not engine.active.any()
                        and not engine.admission_pending()
                        and not engine._inflight):
                    # open-loop idle gap: sleep to the next arrival
                    time.sleep(
                        min(max(t_start + scheduled[0][0] - now, 0.0), 0.05)
                        if scheduled else 0.0
                    )
                    continue
            enforce_timeouts(now)
            if (request_stream is not None
                    and len(pending) < engine.max_prefill_batch
                    and not engine.admission_pending()):
                # encode ahead (at most one admission batch): the encoder
                # dispatch interleaves with the in-flight decode dispatches
                # on the device queue, so its host round trips overlap decode.
                # NEVER while an admission is in flight: the encoder's
                # activation temps next to the admission's full-prefix batch
                # cache (~1.4 GB/row at QVH full size) exceed a 16 GB chip —
                # measured as a hard OOM on every run, not allocator variance.
                t0 = time.time()
                item = next(request_stream, None)
                inline_encode_s += time.time() - t0
                if item is None:
                    request_stream = None
                else:
                    pending.append(item)
                    ann_by_id[item[0].request_id] = item[1]
            if engine.admission_pending():
                # one prefill-chunk dispatch per loop iteration: the decode
                # dispatch below lands BETWEEN chunks on the device queue, so
                # active slots keep emitting during admission instead of
                # stalling behind the whole multi-second prefill (r3's 50 s
                # p95 was that stall — every decode's cache input data-
                # depended on the one-shot admission scatter)
                t0 = time.time()
                engine.admission_step()
                prefill_s += time.time() - t0
            else:
                # in inline mode wait for a full admission batch while the
                # stream is live — width-1 admissions would forfeit the
                # shared prefill
                batch_ready = request_stream is None or len(pending) >= min(
                    engine.max_prefill_batch, max(engine.free_slots(), 1)
                )
                if pending and engine.free_slots() and batch_ready:
                    # simultaneous arrivals share one batched chunked prefill
                    now = time.time()
                    admitted = engine.begin_admission(
                        [req for req, _ in pending]
                    )
                    prefill_s += time.time() - now
                    if admitted:
                        prefill_calls += 1
                        for req, _ in pending[:admitted]:
                            # load mode: the clock already started at
                            # arrival — don't restart it at admission
                            submit_time.setdefault(req.request_id, now)
                        del pending[:admitted]
            if engine.active.any() or engine._inflight:
                t0 = time.time()
                completions = engine.step()
                decode_s += time.time() - t0
                decode_steps += 1
                for completion in completions:
                    handle(completion)
        elapsed = time.time() - t_start

        lat = np.array([r["latency_s"] for r in records] or [0.0])
        stats = {
            "requests": len(records),
            "slots": max_slots,
            "max_prefill_batch": engine.max_prefill_batch,
            "kv_keep": engine.kv_keep,
            "steps_per_dispatch": engine.steps_per_dispatch,
            "spec_width": engine.spec_width,
            "pipeline_depth": engine.pipeline_depth,
            "elapsed_s": round(elapsed, 2),
            "requests_per_sec": round(len(records) / elapsed, 4),
            "latency_p50_s": round(float(np.percentile(lat, 50)), 3),
            "latency_p95_s": round(float(np.percentile(lat, 95)), 3),
            "prefill_s": round(prefill_s, 2),
            "prefill_calls": prefill_calls,
            # upfront mode: requests_per_sec covers the engine (prefill +
            # decode), matching how LLM serving is usually quoted, and the
            # encode-included rate adds the separately-run encoder pass.
            # inline mode: encodes happen inside the loop (overlapped with
            # decode), so elapsed already includes them and both rates match.
            "encode_mode": "inline" if inline else "upfront",
            "encode_batch": encode_batch,
            "encode_ahead": getattr(stream_obj, "host_ahead", 0) if inline else 0,
            # inline: time the serve loop BLOCKED on encodes (with host-stage
            # prefetch this is what's left after overlap; the worker's full
            # cost is encode_busy_s).  upfront: the separate encoder pass.
            "encode_s": round(
                (inline_encode_s + prime_s) if inline else encode_s, 2
            ),
            **({"encode_busy_s": round(stream_obj.host_busy_s, 2)}
               if inline and getattr(stream_obj, "host_ahead", 0) else {}),
            "requests_per_sec_incl_encode": (
                round(len(records)
                      / (elapsed + (0.0 if inline else encode_s)), 4)
                if (elapsed + encode_s) > 0 else 0.0
            ),
            "decode_s": round(decode_s, 2),
            "decode_steps": decode_steps,
            "sec_per_decode_step": (
                round(decode_s / decode_steps, 4) if decode_steps else 0.0
            ),
        }
        if arrivals is not None:
            span = max(arrivals) - min(arrivals) if len(arrivals) > 1 else 0.0
            stats["load"] = {
                # offered rate over the arrival span (open-loop)
                "offered_rps": round(
                    (len(arrivals) - 1) / span, 4) if span else 0.0,
                "latency_from": "arrival",
            }
        if request_timeout_s:
            stats["request_timeout_s"] = request_timeout_s
            stats["timeouts"] = len(timeouts)
            stats["timed_out"] = [
                {k: v for k, v in t.items() if k != "_rid"} for t in timeouts
            ]
    except BaseException:
        # A failed dispatch may have consumed donated buffers, leaving the
        # engine poisoned (later use crashes with 'Array has been deleted'
        # far from the root cause) — evict it from the cache and close it
        # HERE rather than relying on every caller to replicate bench.py's
        # eviction handler.
        if engine_cache is not None:
            if engine_cache.get("engine") is engine:
                engine_cache.pop("engine", None)
                engine_cache.pop("key", None)
        engine.close()
        raise
    # Success path: free the engine's device state unless the caller keeps
    # it alive via engine_cache — the jit closures form a reference cycle,
    # and a driver that rebuilt an engine next to this one's ghost slot
    # cache would OOM (see ContinuousBatcher.close).
    if engine_cache is None:
        engine.close()
    return records, stats


def main(argv=None):
    from mraudio_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    parser = argparse.ArgumentParser(description="mraudio_tpu serving driver")
    parser.add_argument("--model", default="X-InstructBLIP")
    parser.add_argument("--model-path", default="")
    parser.add_argument("--checkpoint", default="",
                        help="trained orbax checkpoint dir to overlay")
    parser.add_argument("--params-store", default="",
                        help="prebuilt param store from mraudio_tpu.cli.convert")
    parser.add_argument("--audio-encoder", default="")
    parser.add_argument("--video-folder", default="")
    parser.add_argument("--annotation-file", required=True)
    parser.add_argument("--output-file", default="")
    parser.add_argument("--config", default="")
    parser.add_argument("--video-source", default="", choices=["", "native", "synthetic", "npy"])
    parser.add_argument("--model-size", default="full", choices=["full", "tiny"])
    parser.add_argument("--n-frms", type=int, default=0)
    parser.add_argument("--slots", type=int, default=4)
    parser.add_argument("--max-prefill-batch", type=int, default=0,
                        help="cap the batched-admission prefill width "
                        "(0 = up to --slots); at QVH full size a 16 GB "
                        "chip runs 4 decode slots but only a 2-wide "
                        "prefill next to them")
    parser.add_argument("--max-requests", type=int, default=0)
    parser.add_argument("--kv-keep", type=int, default=0,
                        help="SnapKV slot-cache compaction to the top-N "
                        "prefix columns (an approximation; ~3.5x smaller "
                        "slot KV at QVH full size — lets more decode "
                        "slots fit one chip)")
    parser.add_argument("--steps-per-dispatch", type=int, default=1,
                        help="decode micro-steps per jitted dispatch; >1 "
                        "amortizes the host round-trip per token (token-"
                        "identical up to EOS; finished rows hold their "
                        "slot until the window ends)")
    parser.add_argument("--spec-width", type=int, default=1,
                        help="self-speculative decode width: each engine "
                        "dispatch verifies W-1 bigram-lookup draft tokens "
                        "per slot in one pass and commits the agreed "
                        "prefix (token-identical; accepted guesses remove "
                        "whole dispatches from the HBM-bound decode)")
    parser.add_argument("--pipeline-depth", type=int, default=2,
                        help="decode dispatches kept in flight (greedy/"
                        "window path): 2 chains each dispatch off device-"
                        "resident state and reads tokens back one dispatch "
                        "late, hiding the host round trip per token; 1 = "
                        "synchronous readback every dispatch")
    parser.add_argument("--encode-mode", default="upfront",
                        choices=["upfront", "inline"],
                        help="upfront: pre-encode every request, report "
                        "encoder time separately (engine-rate sweeps); "
                        "inline: encode requests inside the serve loop, "
                        "one admission batch ahead, overlapping encoder "
                        "dispatches with decode — the quoted requests/sec "
                        "then includes the whole per-request pipeline")
    parser.add_argument("--encode-batch", type=int, default=0,
                        help="requests per fused encoder dispatch (0 = "
                        "match --max-prefill-batch).  The encoder is MXU-"
                        "bound: a B-wide pass costs far less than B B=1 "
                        "passes + their dispatch round trips — at QVH "
                        "full size the B=1 encode dominates the inline "
                        "pipeline (~13 s/request)")
    parser.add_argument("--encode-ahead", type=int, default=1,
                        help="encode HOST-stage groups (sample decode, "
                        "tokenize) prepared ahead by a worker thread so "
                        "that CPU work overlaps the loop's device-blocked "
                        "waits; the device stage (upload + encoder "
                        "dispatch) stays in the loop, so no extra device-"
                        "resident prefixes are buffered (one extra "
                        "prefix OOMs the full-size deployable config — "
                        "measured).  0 = fully synchronous")
    parser.add_argument("--upload-ahead", type=int, default=0,
                        help="1 = the prefetch worker also issues the "
                        "async device_put of each group's video/audio "
                        "input buffers (~18 MB/group), overlapping the "
                        "wire transfer with in-flight device work.  Off "
                        "by default: the full-size deployable config "
                        "runs within tens of MB of the 16 GB line and "
                        "the extra resident buffers were measured to "
                        "OOM a run (worker falls back to lazy upload "
                        "when the device_put itself fails)")
    parser.add_argument("--embeds", default="auto",
                        choices=["auto", "host", "device"],
                        help="where encoded prefix embeds live between "
                        "encode and admission.  device: no host round "
                        "trip (~8 s/request saved over a remote tunnel) "
                        "but each buffered request holds ~44 MB HBM at "
                        "QVH full size — safe inline (one admission batch "
                        "buffered), OOMs upfront at full size.  auto = "
                        "device when --encode-mode inline, host upfront")
    parser.add_argument("--sweep-slots", default="",
                        help="comma-separated slot counts to benchmark, e.g. 1,2,4,8")
    parser.add_argument("--arrival-rate", type=float, default=0.0,
                        help="LOAD mode: open-loop Poisson arrivals at "
                             "this rate (req/s); requests are pre-encoded "
                             "and latency is measured from arrival "
                             "(queueing included).  0 = burst (all at "
                             "t=0, the default)")
    parser.add_argument("--arrival-seed", type=int, default=0)
    parser.add_argument("--request-timeout", type=float, default=0.0,
                        help="per-request deadline in seconds; overdue "
                             "requests are cancelled mid-decode (slot "
                             "freed) and reported in stats.timeouts. "
                             "0 = none")
    parser.add_argument("--quant-encoders", action="store_true",
                        help="int8-store the frozen encoder subtrees "
                             "(~1.35 GB HBM freed for slots/batch; "
                             "approximation, docs/DIVERGENCES.md)")
    args = parser.parse_args(argv)

    logging.basicConfig(level=logging.INFO)

    from mraudio_tpu.cli.convert import resolve_params
    from mraudio_tpu.cli.evaluate import build_config
    from mraudio_tpu.data.dataset import MRDataset
    from mraudio_tpu.models.casting import cast_params_for_inference
    from mraudio_tpu.models.factory import build_model

    args.num_chunks, args.chunk_idx, args.dataset = 1, 0, "QVH"
    cfg = build_config(args)
    if args.kv_keep:
        cfg = cfg.replace(
            model=cfg.model.replace(llm=cfg.model.llm.replace(kv_keep=args.kv_keep))
        )
    model = build_model(cfg)
    params = resolve_params(model, cfg, args.params_store)
    if args.checkpoint:
        from mraudio_tpu.train.checkpoint import apply_trainable, load_checkpoint

        params = apply_trainable(params, load_checkpoint(args.checkpoint)["model"])
    params = cast_params_for_inference(params)
    if args.quant_encoders:
        from mraudio_tpu.models.quant_tree import quantize_subtrees

        params = quantize_subtrees(
            params, getattr(model, "ENCODER_PARAM_KEYS", ())
        )

    dataset = MRDataset(
        cfg.data, annotation_path=cfg.data.annotation_file, split="eval"
    )
    limit = args.max_requests or None
    inline = args.encode_mode == "inline"
    if args.arrival_rate and inline:
        raise SystemExit("--arrival-rate is upfront-encoded load mode; "
                         "use --encode-mode upfront")
    device_embeds = (args.embeds == "device"
                     or (args.embeds == "auto" and inline))
    encode_batch = args.encode_batch or args.max_prefill_batch or args.slots
    requests, encode_s = None, 0.0
    if not inline:
        t_enc = time.time()
        requests = encode_requests(model, params, dataset, limit=limit,
                                   device_embeds=device_embeds,
                                   encode_batch=encode_batch,
                                   host_ahead=args.encode_ahead,
                                   upload_ahead=bool(args.upload_ahead))
        encode_s = time.time() - t_enc

    def run(slots):
        stream = (encode_request_stream(model, params, dataset, limit=limit,
                                        device_embeds=device_embeds,
                                        encode_batch=encode_batch,
                                        host_ahead=args.encode_ahead,
                                        upload_ahead=bool(args.upload_ahead))
                  if inline else None)
        arrivals = (poisson_arrivals(len(requests), args.arrival_rate,
                                     args.arrival_seed)
                    if args.arrival_rate and requests else None)
        return serve(model, params, requests, slots,
                     model.cfg.max_new_tokens,
                     max_prefill_batch=args.max_prefill_batch,
                     steps_per_dispatch=args.steps_per_dispatch,
                     spec_width=args.spec_width,
                     pipeline_depth=args.pipeline_depth,
                     encode_s=encode_s, request_stream=stream,
                     encode_batch=encode_batch, arrivals=arrivals,
                     request_timeout_s=args.request_timeout)

    if args.sweep_slots:
        sweep = []
        for slots in (int(s) for s in args.sweep_slots.split(",")):
            _, stats = run(slots)
            print(json.dumps(stats))
            sweep.append(stats)
        return sweep

    records, stats = run(args.slots)
    if args.output_file:
        with open(args.output_file, "w") as f:
            for r in records:
                f.write(json.dumps(r) + "\n")
    print(json.dumps(stats))
    return stats


if __name__ == "__main__":
    main()
