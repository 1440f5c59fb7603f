"""Continuous-batching engine vs. the batched greedy reference path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mraudio_tpu.config import tiny_model_config
from mraudio_tpu.infer.generate import greedy_generate
from mraudio_tpu.infer.serving import ContinuousBatcher, Request
from mraudio_tpu.models.layers import positions_from_mask
from mraudio_tpu.models.llama import LlamaModel


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_model_config().llm
    model = LlamaModel(cfg, None)
    s, d = 12, cfg.hidden_size
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, s, d))
    mask01 = jnp.ones((1, s), jnp.int32)
    causal = jnp.tril(jnp.ones((s, s), bool))[None, None] & mask01[:, None, None, :].astype(bool)
    ids = jnp.zeros((1, s), jnp.int32)
    params = {
        "params": model.init(
            key, x, causal, positions_from_mask(mask01), ids,
            method=LlamaModel.init_all,
        )["params"]
    }
    return model, params, s, d


def _make_prefixes(n, s, d, seed=1):
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n):
        emb = rng.standard_normal((s, d)).astype(np.float32)
        mask = np.ones(s, np.int32)
        mask[: i % 3] = 0  # varying left padding
        out.append((emb, mask))
    return out


def test_serving_matches_batched_greedy(setup):
    model, params, s, d = setup
    max_new = 6
    prefixes = _make_prefixes(3, s, d)

    # reference: batched greedy over all prefixes at once
    embeds = jnp.asarray(np.stack([e for e, _ in prefixes]))
    masks = jnp.asarray(np.stack([m for _, m in prefixes]))
    ref_tokens = np.asarray(
        greedy_generate(model, params, embeds, masks, max_new, eos_id=2)
    )

    engine = ContinuousBatcher(
        model, params, prefix_len=s, max_new_tokens=max_new, eos_id=2, max_slots=2
    )
    # submit 2, then feed the third when a slot frees — true continuous
    # admission
    pending = [Request(i, e, m) for i, (e, m) in enumerate(prefixes)]
    results = {}
    assert engine.submit(pending.pop(0))
    assert engine.submit(pending.pop(0))
    while engine.active.any() or pending:
        if pending and engine.free_slots() > 0:
            engine.submit(pending.pop(0))
        for comp in engine.step():
            results[comp.request_id] = comp.token_ids

    assert set(results) == {0, 1, 2}
    for rid, tokens in results.items():
        ref = ref_tokens[rid].tolist()
        # engine stops at eos; reference latches eos afterwards
        trimmed = ref[: len(tokens)]
        assert tokens == trimmed, f"request {rid}: {tokens} != {trimmed}"
        if len(tokens) < len(ref):
            assert tokens[-1] == 2  # ended because of eos


def test_interleaved_admission_matches_drained(setup):
    """Incremental admission (``begin_admission`` + one ``admission_step``
    chunk dispatch per loop iteration, decode dispatches interleaved
    between chunks — the serve loop's production shape) must be token-
    identical to the synchronous ``submit_many`` drain: an in-flight
    admission's chunks write a private batch cache and only touch the
    shared slot cache at the final scatter."""
    model, params, s, d = setup
    chunked = LlamaModel(model.cfg.replace(prefill_chunk=5), None)
    max_new = 6
    prefixes = _make_prefixes(4, s, d, seed=7)
    reqs = [Request(i, e, m) for i, (e, m) in enumerate(prefixes)]
    kw = dict(prefix_len=s, max_new_tokens=max_new, eos_id=2,
              max_slots=2, max_prefill_batch=2)

    def run_drained():
        engine = ContinuousBatcher(chunked, params, **kw)
        assert len(engine._chunk_starts) == 3  # 5 + 5 + 2
        pending, results = list(reqs), {}
        while engine.active.any() or pending:
            if pending and engine.free_slots():
                n = engine.submit_many(pending)
                del pending[:n]
            for c in engine.step():
                results[c.request_id] = c.token_ids
        return results

    def run_interleaved():
        engine = ContinuousBatcher(chunked, params, **kw)
        pending, results = list(reqs), {}
        while (pending or engine.active.any() or engine.admission_pending()
               or engine._inflight):
            if engine.admission_pending():
                engine.admission_step()
            elif pending and engine.free_slots():
                n = engine.begin_admission(pending)
                del pending[:n]
            if engine.active.any() or engine._inflight:
                for c in engine.step():
                    results[c.request_id] = c.token_ids
        return results

    drained = run_drained()
    assert set(drained) == {0, 1, 2, 3}
    assert run_interleaved() == drained


def test_reset_reuse_token_identical(setup):
    """``reset()`` returns a used engine to service with the SAME jit
    wrappers (a production process keeps one engine for its lifetime;
    rebuilding per run re-pays jit re-trace).  A reused engine must
    produce bit-identical tokens to a fresh one — including when the
    first service left garbage in the slot caches and row state."""
    model, params, s, d = setup
    max_new = 6
    prefixes = _make_prefixes(4, s, d, seed=11)
    reqs = [Request(i, e, m) for i, (e, m) in enumerate(prefixes)]

    def run(engine, take):
        pending, results = list(take), {}
        while engine.active.any() or pending or engine._inflight:
            if pending and engine.free_slots():
                n = engine.submit_many(pending)
                del pending[:n]
            for c in engine.step():
                results[c.request_id] = c.token_ids
        return results

    engine = ContinuousBatcher(
        model, params, prefix_len=s, max_new_tokens=max_new, eos_id=2,
        max_slots=2, max_prefill_batch=2,
    )
    first = run(engine, reqs)          # leaves used caches + row state
    engine.reset()
    again = run(engine, reqs)
    assert again == first
    fresh = ContinuousBatcher(
        model, params, prefix_len=s, max_new_tokens=max_new, eos_id=2,
        max_slots=2, max_prefill_batch=2,
    )
    assert run(fresh, reqs) == first
    # reset with a DIFFERENT request set: nothing of the old run leaks
    other = [Request(10 + i, e, m)
             for i, (e, m) in enumerate(_make_prefixes(3, s, d, seed=23))]
    engine.reset()
    got = run(engine, other)
    fresh.reset()
    assert run(fresh, other) == got


def test_submit_many_matches_sequential(setup):
    """Batched admission (one prefill dispatch, padded bucket, slot
    scatter) must be token-identical to one-at-a-time submits."""
    model, params, s, d = setup
    max_new = 5
    prefixes = _make_prefixes(3, s, d, seed=3)
    reqs = [Request(i, e, m) for i, (e, m) in enumerate(prefixes)]

    def run(engine, batched):
        pending = list(reqs)
        results = {}
        while engine.active.any() or pending:
            if pending and engine.free_slots():
                if batched:
                    admitted = engine.submit_many(pending)
                    del pending[:admitted]
                elif engine.submit(pending[0]):
                    pending.pop(0)
            for comp in engine.step():
                results[comp.request_id] = comp.token_ids
        return results

    kw = dict(prefix_len=s, max_new_tokens=max_new, eos_id=2)
    seq = run(ContinuousBatcher(model, params, max_slots=4, **kw), False)
    # max_slots=4 with 3 requests exercises the padded power-of-two
    # bucket (n=3 -> bucket=4) and the partial scatter
    bat = run(ContinuousBatcher(model, params, max_slots=4, **kw), True)
    assert seq == bat and set(bat) == {0, 1, 2}

    # max_prefill_batch caps admission width (the prefill graph's O(B·S)
    # temps are independent of slot count) without changing tokens
    capped_engine = ContinuousBatcher(
        model, params, max_slots=4, max_prefill_batch=2, **kw
    )
    assert capped_engine.submit_many(reqs) == 2  # capped below free slots
    cap = run(
        ContinuousBatcher(model, params, max_slots=4, max_prefill_batch=2, **kw),
        True,
    )
    assert cap == seq


def test_device_resident_request_embeds(setup):
    """Requests whose prefix embeds are jax device arrays (the serve
    CLI's no-readback path) are token-identical to np-array requests —
    admission stacks them on device instead of round-tripping the
    (S, D) prefix through the host."""
    model, params, s, d = setup
    max_new = 5
    prefixes = _make_prefixes(3, s, d, seed=7)

    def run(device_arrays):
        if device_arrays:
            reqs = [Request(i, jnp.asarray(e), m)
                    for i, (e, m) in enumerate(prefixes)]
        else:
            reqs = [Request(i, e, m) for i, (e, m) in enumerate(prefixes)]
        engine = ContinuousBatcher(
            model, params, prefix_len=s, max_new_tokens=max_new, eos_id=2,
            max_slots=2,
        )
        pending, results = list(reqs), {}
        while engine.active.any() or pending:
            if pending and engine.free_slots():
                admitted = engine.submit_many(pending)
                del pending[:admitted]
            for comp in engine.step():
                results[comp.request_id] = comp.token_ids
        return results

    host = run(False)
    dev = run(True)
    assert host == dev and set(dev) == {0, 1, 2}


def test_submit_many_with_kv_keep(setup):
    """Batched admission through the compacted-cache path (per-layer
    `valid` leaves ride the scatter)."""
    model, params, s, d = setup
    cfg = model.cfg.replace(kv_keep=8, kv_keep_obs=4, kv_keep_sink=2)
    cmodel = LlamaModel(cfg, None)
    prefixes = _make_prefixes(2, s, d, seed=11)
    reqs = [Request(i, e, m) for i, (e, m) in enumerate(prefixes)]

    def run(batched):
        engine = ContinuousBatcher(
            cmodel, params, prefix_len=s, max_new_tokens=4, eos_id=2,
            max_slots=2,
        )
        if batched:
            assert engine.submit_many(list(reqs)) == 2
        else:
            for r in reqs:
                assert engine.submit(r)
        return {c.request_id: c.token_ids for c in engine.run_to_completion()}

    assert run(False) == run(True)


def test_spec_engine_with_kv_keep(setup):
    """spec_width>1 together with kv_keep (the deployable config +
    --spec-width) must admit and decode token-identically to spec=1: the
    compacted per-request prefill cache has to cover the slot's FULL
    decode region incl. the W-1 draft-slack columns (a shape mismatch
    here crashed admission — the prefill compaction sized extra_cols to
    the token budget only)."""
    model, params, s, d = setup
    cfg = model.cfg.replace(kv_keep=8, kv_keep_obs=4, kv_keep_sink=2)
    cmodel = LlamaModel(cfg, None)
    prefixes = _make_prefixes(3, s, d, seed=17)
    reqs = [Request(i, e, m) for i, (e, m) in enumerate(prefixes)]

    def run(spec):
        engine = ContinuousBatcher(
            cmodel, params, prefix_len=s, max_new_tokens=4, eos_id=2,
            max_slots=2, spec_width=spec,
        )
        pending, done = list(reqs), {}
        while pending or engine.active.any():
            while pending and engine.free_slots():
                n = engine.submit_many(pending[: engine.free_slots()])
                pending = pending[n:]
            for c in engine.step():
                done[c.request_id] = list(c.token_ids)
        return done

    assert run(4) == run(1)


def test_spec_rejects_steps_per_dispatch(setup):
    """The spec path is host-in-the-loop: asking for micro-step windows
    on top of it is contradictory and must fail loudly (it used to run
    K=1 silently while the stats reported K).  pipeline_depth is forced
    to what actually runs (1)."""
    model, params, s, d = setup
    with pytest.raises(ValueError, match="mutually exclusive"):
        ContinuousBatcher(
            model, params, prefix_len=s, max_new_tokens=4, eos_id=2,
            max_slots=2, spec_width=4, steps_per_dispatch=4,
        )
    engine = ContinuousBatcher(
        model, params, prefix_len=s, max_new_tokens=4, eos_id=2,
        max_slots=2, spec_width=4, pipeline_depth=2,
    )
    assert engine.pipeline_depth == 1


def test_serve_empty_request_stream(setup):
    """An empty annotation set yields a well-formed empty result, not an
    IndexError from pending[0]."""
    import types

    from mraudio_tpu.cli.serve import serve

    model, params, s, d = setup
    wrapper = types.SimpleNamespace(
        llm=model, llm_tokenizer=types.SimpleNamespace(eos_token_id=2),
        cfg=types.SimpleNamespace(max_new_tokens=4),
    )
    records, stats = serve(wrapper, {"llm": params["params"]}, [], 2, 4)
    assert records == [] and stats["requests"] == 0
    records, stats = serve(wrapper, {"llm": params["params"]}, None, 2, 4,
                           request_stream=iter([]))
    assert records == [] and stats["requests"] == 0
    assert stats["encode_mode"] == "inline"


def test_serving_on_tp_mesh(setup):
    """The continuous batcher runs with Megatron-sharded LLM params on
    the virtual (data=2, model=4) mesh and matches single-device tokens
    — multi-chip coverage for the serving path."""
    from mraudio_tpu.config import MeshConfig
    from mraudio_tpu.parallel import make_mesh, shard_params

    model, params, s, d = setup
    prefixes = _make_prefixes(2, s, d, seed=5)
    reqs = [Request(i, e, m) for i, (e, m) in enumerate(prefixes)]

    def run():
        engine = ContinuousBatcher(
            model, params_run, prefix_len=s, max_new_tokens=4, eos_id=2,
            max_slots=2,
        )
        assert engine.submit_many(list(reqs)) == 2
        return {c.request_id: c.token_ids for c in engine.run_to_completion()}

    params_run = params
    single = run()

    mesh = make_mesh(MeshConfig(data=2, model=4))
    with jax.set_mesh(mesh):
        # partition rules match paths rooted at the assembly key ("llm/...")
        params_run = {
            "params": shard_params({"llm": params["params"]}, mesh)["llm"]
        }
        sharded = run()
    assert single == sharded


def test_slot_reuse_after_completion(setup):
    model, params, s, d = setup
    engine = ContinuousBatcher(
        model, params, prefix_len=s, max_new_tokens=3, eos_id=2, max_slots=1
    )
    prefixes = _make_prefixes(2, s, d, seed=7)
    assert engine.submit(Request(10, *prefixes[0]))
    assert not engine.submit(Request(11, *prefixes[1]))  # full
    out1 = engine.run_to_completion()
    assert out1 and out1[0].request_id == 10
    assert engine.submit(Request(11, *prefixes[1]))
    out2 = engine.run_to_completion()
    assert out2[0].request_id == 11
    assert len(out2[0].token_ids) <= 3


def test_serve_cli_end_to_end(tmp_path):
    """The serving CLI (round-1 review: 'engine is an island') drives the
    engine from annotations to parsed span records with latency stats."""
    import json as _json

    from mraudio_tpu.cli.serve import main

    ann = str(tmp_path / "ann.jsonl")
    with open(ann, "w") as f:
        for i in range(5):
            f.write(_json.dumps({
                "vid": f"v{i}", "qid": i, "query": "a person waves",
                "duration": 60, "relevant_windows": [[5, 12]],
            }) + "\n")
    out = str(tmp_path / "serve.jsonl")
    main([
        "--annotation-file", ann,
        "--video-source", "synthetic",
        "--model-size", "tiny",
        "--n-frms", "4",
        "--slots", "2",
        "--output-file", out,
    ])
    rows = [_json.loads(l) for l in open(out)]
    assert len(rows) == 5
    assert {r["qid"] for r in rows} == set(range(5))
    for r in rows:
        assert "pred_relevant_windows" in r and r["latency_s"] > 0

    # inline encode mode: encodes interleave with decode inside the serve
    # loop; same records come out (order may differ)
    out2 = str(tmp_path / "serve_inline.jsonl")
    main([
        "--annotation-file", ann,
        "--video-source", "synthetic",
        "--model-size", "tiny",
        "--n-frms", "4",
        "--slots", "2",
        "--encode-mode", "inline",
        "--output-file", out2,
    ])
    rows2 = [_json.loads(l) for l in open(out2)]
    key = lambda r: r["qid"]  # noqa: E731
    strip = lambda r: {k: v for k, v in r.items() if k != "latency_s"}  # noqa: E731
    assert sorted(map(strip, rows2), key=key) == sorted(map(strip, rows), key=key)


def test_serve_cli_embeds_flag(tmp_path):
    """`--embeds host` (pull prefix embeds to host after encode — the
    memory-safe upfront default) and `--embeds device` (no readback) must
    produce identical records: the bf16 prefix survives the host round
    trip bit-exactly."""
    import json as _json

    from mraudio_tpu.cli.serve import main

    ann = str(tmp_path / "ann.jsonl")
    with open(ann, "w") as f:
        for i in range(3):
            f.write(_json.dumps({
                "vid": f"v{i}", "qid": i, "query": "a person claps",
                "duration": 60, "relevant_windows": [[5, 12]],
            }) + "\n")

    def run(embeds):
        out = str(tmp_path / f"serve_{embeds}.jsonl")
        main([
            "--annotation-file", ann,
            "--video-source", "synthetic",
            "--model-size", "tiny",
            "--n-frms", "4",
            "--slots", "2",
            "--embeds", embeds,
            "--output-file", out,
        ])
        strip = lambda r: {k: v for k, v in r.items() if k != "latency_s"}  # noqa: E731
        return sorted((strip(_json.loads(l)) for l in open(out)),
                      key=lambda r: r["qid"])

    assert run("host") == run("device")


def test_serve_cli_encode_batch(tmp_path):
    """Batched encoder dispatches (--encode-batch B) must be record-
    identical to per-request encodes, including the repeated-sample
    padding of a short tail group (5 requests, B=3 -> groups 3 + 2+pad)."""
    import json as _json

    from mraudio_tpu.cli.serve import main

    ann = str(tmp_path / "ann.jsonl")
    with open(ann, "w") as f:
        for i in range(5):
            f.write(_json.dumps({
                "vid": f"v{i}", "qid": i, "query": "a person jumps",
                "duration": 60, "relevant_windows": [[5, 12]],
            }) + "\n")

    def run(eb, mode):
        out = str(tmp_path / f"serve_eb{eb}_{mode}.jsonl")
        main([
            "--annotation-file", ann,
            "--video-source", "synthetic",
            "--model-size", "tiny",
            "--n-frms", "4",
            "--slots", "2",
            "--encode-batch", str(eb),
            "--encode-mode", mode,
            "--output-file", out,
        ])
        strip = lambda r: {k: v for k, v in r.items() if k != "latency_s"}  # noqa: E731
        return sorted((strip(_json.loads(l)) for l in open(out)),
                      key=lambda r: r["qid"])

    base = run(1, "upfront")
    assert run(3, "upfront") == base
    assert run(3, "inline") == base


def test_serve_cli_encode_ahead(tmp_path):
    """Host-stage encode prefetch (--encode-ahead N: a worker thread
    prepares sample decode/tokenize groups ahead so that CPU work
    overlaps the loop's device-blocked waits; the device stage stays in
    the loop so NO extra device-resident prefixes are buffered) must be
    record-identical to the synchronous inline loop (--encode-ahead 0),
    including with batched encodes."""
    import json as _json

    from mraudio_tpu.cli.serve import main

    ann = str(tmp_path / "ann.jsonl")
    with open(ann, "w") as f:
        for i in range(5):
            f.write(_json.dumps({
                "vid": f"v{i}", "qid": i, "query": "a person reads",
                "duration": 60, "relevant_windows": [[5, 12]],
            }) + "\n")

    def run(ahead, eb=1):
        out = str(tmp_path / f"serve_ahead{ahead}_eb{eb}.jsonl")
        stats = main([
            "--annotation-file", ann,
            "--video-source", "synthetic",
            "--model-size", "tiny",
            "--n-frms", "4",
            "--slots", "2",
            "--encode-mode", "inline",
            "--encode-batch", str(eb),
            "--encode-ahead", str(ahead),
            "--output-file", out,
        ])
        strip = lambda r: {k: v for k, v in r.items() if k != "latency_s"}  # noqa: E731
        return stats, sorted((strip(_json.loads(l)) for l in open(out)),
                             key=lambda r: r["qid"])

    stats_sync, base = run(0)
    assert "encode_busy_s" not in stats_sync
    assert stats_sync["encode_ahead"] == 0
    stats_ahead, ahead = run(2)
    assert ahead == base
    assert stats_ahead["encode_ahead"] == 2
    # the worker's host-stage cost is recorded separately from the loop's
    # blocking wait (their difference is the overlap won)
    assert stats_ahead["encode_busy_s"] >= 0
    _, grouped = run(1, eb=3)    # default depth, batched encode groups
    assert grouped == base


def test_encode_stream_oom_backpressure():
    """An encode group whose device dispatch hits RESOURCE_EXHAUSTED is
    retried ONCE after the installed recovery callback (serve drains the
    in-flight decode); without a callback, or for non-OOM errors, the
    exception propagates."""
    from mraudio_tpu.cli.serve import _EncodeStream

    calls = {"drained": 0}

    def fail_once_stage():
        failed = set()

        def device_stage(tag):
            if tag == "boom" and "boom" not in failed:
                failed.add("boom")
                raise RuntimeError("RESOURCE_EXHAUSTED: TPU backend error")
            return [(tag, 0), (tag, 1)]

        return device_stage

    stream = _EncodeStream(
        iter([("ok",), ("boom",)]), fail_once_stage(), None, 0
    )
    assert next(stream) == ("ok", 0)
    assert next(stream) == ("ok", 1)

    # no recovery installed: the OOM propagates
    with pytest.raises(RuntimeError, match="RESOURCE_EXHAUSTED"):
        next(stream)

    def drain():
        calls["drained"] += 1

    stream = _EncodeStream(
        iter([("boom",), ("ok",)]), fail_once_stage(), None, 0
    )
    stream.oom_recover = drain
    out = list(stream)
    assert out == [("boom", 0), ("boom", 1), ("ok", 0), ("ok", 1)]
    assert calls["drained"] == 1                  # drained exactly once

    # non-OOM errors are never swallowed
    def bad_stage(tag):
        raise ValueError("unrelated")

    stream = _EncodeStream(iter([("x",)]), bad_stage, None, 0)
    stream.oom_recover = drain
    with pytest.raises(ValueError, match="unrelated"):
        next(stream)


def test_prefetched_stream_propagates_errors():
    """An exception inside the encode worker surfaces on the consumer
    thread instead of hanging the serve loop."""
    from mraudio_tpu.cli.serve import _PrefetchedStream

    def boom():
        yield 1
        raise RuntimeError("encode failed")

    stream = _PrefetchedStream(boom(), ahead=2)
    assert next(stream) == 1
    with pytest.raises(RuntimeError, match="encode failed"):
        next(stream)


def test_bench_serve_tiny_profile(tmp_path, monkeypatch):
    """The bench serving profile (inline mode, tiny config) produces the
    stats the headline run embeds, and caches them."""
    import bench

    monkeypatch.setattr(
        bench, "SERVE_CACHE_PATH", str(tmp_path / "serve_cache.json")
    )
    result = bench.run_serve("serve-tiny")
    assert result["requests"] == 5
    assert result["encode_mode"] == "inline"
    assert result["requests_per_sec"] > 0
    assert result["requests_per_sec_incl_encode"] == result["requests_per_sec"]
    assert result["latency_p50_s"] > 0
    cached = bench.cached_serve_results()
    assert cached["serve-tiny"]["cached"] is True
    assert cached["serve-tiny"]["requests_per_sec"] == result["requests_per_sec"]


def test_steps_per_dispatch_token_parity(setup):
    """K decode micro-steps per dispatch (lax.scan window) must emit the
    same tokens as single-step dispatch — rows never read each other's
    state, and a finished row's window tail is discarded host-side."""
    model, params, s, d = setup
    max_new = 6
    prefixes = _make_prefixes(4, s, d, seed=5)
    reqs = [Request(i, e, m) for i, (e, m) in enumerate(prefixes)]

    def run(engine):
        pending = list(reqs)
        results = {}
        while engine.active.any() or pending:
            if pending and engine.free_slots():
                admitted = engine.submit_many(pending)
                del pending[:admitted]
            for comp in engine.step():
                results[comp.request_id] = comp.token_ids
        return results

    kw = dict(prefix_len=s, max_new_tokens=max_new, eos_id=2)
    # 2 slots + 4 requests: the second pair is admitted only after the
    # first pair's windows finish — exercises re-admission into slots
    # whose window state was discarded.  K=4 does not divide max_new=6:
    # exercises the budget-trim inside a window.
    base = run(ContinuousBatcher(model, params, max_slots=2, **kw))
    for k in (2, 4):
        windowed = run(ContinuousBatcher(
            model, params, max_slots=2, steps_per_dispatch=k, **kw
        ))
        assert windowed == base, f"K={k} diverged"


@pytest.mark.parametrize("w", [2, 4])
def test_spec_engine_token_identical(setup, w):
    """spec_width engine must emit exactly the spec_width=1 completions
    (self-speculation is verify-then-commit: draft quality affects speed
    only)."""
    model, params, s, d = setup
    max_new = 8
    prefixes = _make_prefixes(5, s, d, seed=7)

    def run(spec):
        engine = ContinuousBatcher(
            model, params, prefix_len=s, max_new_tokens=max_new, eos_id=2,
            max_slots=3, spec_width=spec,
        )
        pending = [Request(i, e, m) for i, (e, m) in enumerate(prefixes)]
        done = {}
        while pending or engine.active.any():
            while pending and engine.free_slots():
                n = engine.submit_many(pending[: engine.free_slots()])
                pending = pending[n:]
            for c in engine.step():
                done[c.request_id] = list(c.token_ids)
        return done

    base = run(1)
    spec = run(w)
    assert base.keys() == spec.keys()
    for rid in base:
        assert base[rid] == spec[rid], rid


def test_spec_engine_hints_token_identical(setup):
    """Per-request prompt-lookup hint streams change drafting only:
    completions stay identical to spec_width=1 whatever the hints say."""
    model, params, s, d = setup
    prefixes = _make_prefixes(4, s, d, seed=21)
    rng = np.random.default_rng(3)

    def run(spec, with_hints):
        engine = ContinuousBatcher(
            model, params, prefix_len=s, max_new_tokens=8, eos_id=2,
            max_slots=2, spec_width=spec,
        )
        pending = [
            Request(i, e, m,
                    hint_ids=(rng.integers(0, 32, 16).astype(np.int32)
                              if with_hints else None))
            for i, (e, m) in enumerate(prefixes)
        ]
        done = {}
        while pending or engine.active.any():
            while pending and engine.free_slots():
                n = engine.submit_many(pending[: engine.free_slots()])
                pending = pending[n:]
            for c in engine.step():
                done[c.request_id] = list(c.token_ids)
        return done

    base = run(1, False)
    assert run(4, True) == base
    assert run(4, False) == base


def test_draft_for_slot_hint_fallback(setup):
    """Host-side drafting: history match wins; the hint stream serves the
    cold start; repeat-cur otherwise."""
    model, params, s, d = setup
    engine = ContinuousBatcher(
        model, params, prefix_len=s, max_new_tokens=8, eos_id=2,
        max_slots=1, spec_width=4,
    )
    engine.cur_ids[0] = 5
    engine.hints[0] = np.asarray([1, 5, 9, 8, 7], np.int32)
    engine.emitted[0] = []
    assert engine._draft_for_slot(0) == [5, 9, 8, 7]    # cold start: hints
    engine.emitted[0] = [5, 6, 7]
    assert engine._draft_for_slot(0) == [5, 6, 7, 5]    # history wins
    engine.hints[0] = np.asarray([1, 2, 3], np.int32)
    engine.emitted[0] = []
    assert engine._draft_for_slot(0) == [5, 5, 5, 5]    # no source: repeat


def test_spec_engine_with_int8_kv(setup):
    model, params, s, d = setup
    cfg_q = model.cfg.replace(kv_quant="int8")
    model_q = LlamaModel(cfg_q, None)
    prefixes = _make_prefixes(4, s, d, seed=9)

    def run(spec):
        engine = ContinuousBatcher(
            model_q, params, prefix_len=s, max_new_tokens=6, eos_id=2,
            max_slots=2, spec_width=spec,
        )
        pending = [Request(i, e, m) for i, (e, m) in enumerate(prefixes)]
        done = {}
        while pending or engine.active.any():
            while pending and engine.free_slots():
                n = engine.submit_many(pending[: engine.free_slots()])
                pending = pending[n:]
            for c in engine.step():
                done[c.request_id] = list(c.token_ids)
        return done

    assert run(1) == run(4)


def test_pipeline_depth_token_identical(setup):
    """pipeline_depth=2 (device-resident state, tokens read back one
    dispatch late) must emit exactly the depth=1 completions — the ghost
    dispatch a freed slot receives is discarded, and admission overwrites
    device row state wholesale."""
    model, params, s, d = setup
    max_new = 6
    prefixes = _make_prefixes(5, s, d, seed=11)
    reqs = [Request(i, e, m) for i, (e, m) in enumerate(prefixes)]

    def run(depth, k=1):
        engine = ContinuousBatcher(
            model, params, prefix_len=s, max_new_tokens=max_new, eos_id=2,
            max_slots=2, steps_per_dispatch=k, pipeline_depth=depth,
        )
        pending = list(reqs)
        done = {}
        # 2 slots + 5 requests: slots are freed and re-admitted while a
        # ghost dispatch for the old request is still in flight — the
        # request-id snapshot must keep its tokens out of the new request
        while pending or engine.active.any() or engine._inflight:
            if pending and engine.free_slots():
                admitted = engine.submit_many(pending)
                del pending[:admitted]
            for c in engine.step():
                done[c.request_id] = list(c.token_ids)
        return done

    base = run(1)
    assert run(2) == base
    assert run(2, k=3) == base  # pipelined window dispatches


def test_pipeline_readback_lag_and_drain(setup):
    """The first pipelined step primes the queue (no tokens yet); the
    drain after the last active row still surfaces every completion."""
    model, params, s, d = setup
    prefixes = _make_prefixes(1, s, d, seed=13)
    engine = ContinuousBatcher(
        model, params, prefix_len=s, max_new_tokens=4, eos_id=2,
        max_slots=1, pipeline_depth=2,
    )
    assert engine.submit(Request(0, *prefixes[0]))
    first = engine.step()
    assert first == [] and len(engine._inflight) == 1
    out = engine.run_to_completion()
    assert len(out) == 1 and len(out[0].token_ids) == 4
    assert not engine._inflight  # drained
