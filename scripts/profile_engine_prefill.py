"""Isolate the serving engine's admission-prefill cost.

The deployable serving config spends ~4.7 s per 2-row admission
(docs/BENCHMARKS.md "Serving") where the offline batched prefill path
implies ~2 s for the same tokens.  Roadmap suspects: (a) SnapKV
observation-window scoring during prefill (cfg.kv_keep), (b) the
compact_cache top-k pass, (c) mis-attribution — in-flight decode
dispatches queued ahead of the timed prefill dispatch.  This script
times each stage on an otherwise-idle chip, decode never in flight:

  1. prefill (kv_keep=1784)   — prefill_cache + obs scoring + lm_head
  2. prefill (kv_keep=0)      — the same tokens without scoring
  3. compact_cache            — the top-k compaction alone
  4. engine submit_many       — the full admission path (prefill +
                                compact + slot scatter + row admit)

(1)-(2) = the scoring cost; (4)-(1)-(3) = scatter/admit overhead; any
remaining gap to the serve loop's measured 4.7 s is decode attribution.

Run:  python scripts/profile_engine_prefill.py [--tiny] [--stage all]
"""

from __future__ import annotations

import argparse
import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def time_best(fn, steps, *args):
    t0 = time.perf_counter()
    jax.block_until_ready(fn(*args))
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(steps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    return min(times), compile_s, sorted(times)[len(times) // 2], times


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--seq", type=int, default=5353)
    ap.add_argument("--budget", type=int, default=64)
    ap.add_argument("--kv-keep", type=int, default=1784)
    ap.add_argument("--slots", type=int, default=4)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny decoder on CPU — script smoke test")
    ap.add_argument("--stage", default="all",
                    choices=["all", "prefill", "engine", "decode"])
    ap.add_argument("--window", type=int, default=1,
                    help="decode stage: steps_per_dispatch of the timed "
                    "decode window")
    ap.add_argument("--decode-dispatches", type=int, default=8,
                    help="decode stage: timed dispatches after warmup")
    args = ap.parse_args()

    if args.tiny:
        jax.config.update("jax_platforms", "cpu")

    from bench import enable_compile_cache

    enable_compile_cache()

    from mraudio_tpu.config import LlamaConfig
    from mraudio_tpu.infer.generate import prefill_cache
    from mraudio_tpu.models.casting import cast_params_for_inference
    from mraudio_tpu.models.llama import LlamaModel, compact_cache

    if args.tiny:
        base = LlamaConfig(
            vocab_size=128, hidden_size=64, num_layers=2, num_heads=4,
            num_kv_heads=4, intermediate_size=128, quantization="none",
            kv_quant="int8", prefill_chunk=32,
        )
        args.seq, args.budget = 48, 8
        # clamp to the tiny sequence, but keep an explicit --kv-keep 0
        # (= "profile the no-compaction config") as 0
        args.kv_keep = min(args.kv_keep, 24) if args.kv_keep else 0
    else:
        base = LlamaConfig(quantization="int8", kv_quant="int8")
    cfg_keep = base.replace(kv_keep=args.kv_keep)
    cfg_nokeep = base.replace(kv_keep=0)
    model_keep = LlamaModel(cfg_keep, None)
    model_nokeep = LlamaModel(cfg_nokeep, None)

    b, s = args.batch, args.seq
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(b, s, base.hidden_size)) * 0.1,
                    jnp.bfloat16)
    mask01 = np.ones((b, s), np.int32)

    print("init params ...", flush=True)
    t0 = time.time()
    attend_tiny = jnp.ones((b, 1, 4, 4), bool)
    params = {"params": model_keep.init(
        jax.random.PRNGKey(0), x[:, :4], attend_tiny,
        jnp.zeros((b, 4), jnp.int32), jnp.zeros((b, 4), jnp.int32),
        method=LlamaModel.init_all,
    )["params"]}
    params = cast_params_for_inference(params)
    jax.block_until_ready(params)
    print(f"  {time.time()-t0:.1f}s", flush=True)

    results = {}

    if args.stage in ("all", "prefill"):
        # ---- 1/2: prefill with and without SnapKV scoring.  Mirrors the
        # engine's _prefill_fn: alloc = s under kv_keep (the compacted
        # cache is what enters the slot region), full region otherwise.
        # The kv_keep=0 variant is ALSO timed at alloc = s: the engine-
        # realistic alloc = s + budget differs by ~1.2% cache columns,
        # the same order as the scoring delta itself — the alloc-matched
        # pair is the unconfounded scoring-cost A/B.
        def make_prefill(model, alloc, tag):
            positions = jnp.asarray(
                np.maximum(np.cumsum(mask01, axis=-1) - 1, 0))
            pmask_full = (jnp.zeros((b, alloc), jnp.int32)
                          .at[:, :s].set(jnp.asarray(mask01)))

            @jax.jit
            def run(params, x):
                hidden, cache = prefill_cache(
                    model, params, x, positions, pmask_full, alloc)
                last = model.apply(
                    params, method=lambda m, h: m.lm_head(h),
                    h=hidden[:, -1:]).astype(jnp.float32)
                nxt = jnp.argmax(last[:, -1], axis=-1)
                # keep every cache write live without returning ~6 GB
                return nxt, jax.tree_util.tree_map(
                    lambda a: a.ravel()[0], cache)

            best, comp, med, all_t = time_best(run, args.steps, params, x)
            print(f"{tag}: best {best*1000:.0f} ms / med {med*1000:.0f} ms "
                  f"(compile+1st {comp:.1f}s)"
                  f"  all={['%.2f' % t for t in all_t]}", flush=True)
            return best

        if args.kv_keep:
            results["prefill_keep_s"] = make_prefill(
                model_keep, s, f"prefill kv_keep={args.kv_keep}")
            gc.collect()
            results["prefill_nokeep_match_s"] = make_prefill(
                model_nokeep, s, "prefill kv_keep=0 @s")
            gc.collect()
        results["prefill_nokeep_s"] = make_prefill(
            model_nokeep, s + args.budget, "prefill kv_keep=0   ")
        gc.collect()

        if args.kv_keep:
            # ---- 3: compact_cache alone, over a real post-prefill cache
            # (skipped at --kv-keep 0: prefill never writes obs_score and
            # a k=0 top-k is meaningless).
            positions = jnp.asarray(np.maximum(np.cumsum(mask01, -1) - 1, 0))
            pmask_full = jnp.asarray(
                np.pad(mask01, ((0, 0), (0, 0))))  # alloc == s

            @jax.jit
            def full_prefill(params, x):
                _, cache = prefill_cache(
                    model_keep, params, x, positions, pmask_full, s)
                return cache

            cache = full_prefill(params, x)
            jax.block_until_ready(cache)

            extra = args.budget  # engine adds spec slack; 0 here

            @jax.jit
            def compact(cache):
                return jax.tree_util.tree_map(
                    lambda a: a.ravel()[0],
                    compact_cache(cfg_keep, cache, pmask_full, s, extra))

            best, comp, med, all_t = time_best(compact, args.steps, cache)
            print(f"compact_cache      : best {best*1000:.0f} ms / med "
                  f"{med*1000:.0f} ms (compile+1st {comp:.1f}s)  "
                  f"all={['%.2f' % t for t in all_t]}", flush=True)
            results["compact_s"] = best
            del cache
            gc.collect()

    if args.stage in ("all", "engine"):
        # ---- 4: the engine's full admission path, warm, decode idle.
        from mraudio_tpu.infer.serving import ContinuousBatcher, Request

        engine = ContinuousBatcher(
            model_keep if args.kv_keep else model_nokeep, params,
            prefix_len=s, max_new_tokens=args.budget,
            eos_id=2, max_slots=args.slots, max_prefill_batch=b,
        )
        reqs = [
            Request(request_id=i, prefix_embeds=x[i],
                    prefix_mask=mask01[i])
            for i in range(b)
        ]

        def admit():
            engine.active[:] = False
            engine.slot_request = [None] * args.slots
            engine._inflight.clear()
            n = engine.submit_many(list(reqs))
            assert n == b, n
            return engine.cache, engine.dcur

        best, comp, med, all_t = time_best(lambda: admit(), args.steps)
        print(f"engine admission   : best {best*1000:.0f} ms / med "
              f"{med*1000:.0f} ms (compile+1st {comp:.1f}s)  "
              f"all={['%.2f' % t for t in all_t]}", flush=True)
        results["engine_admit_s"] = best

    if args.stage == "decode":
        # ---- 5: the decode window in isolation, queue idle — the twin
        # of stage 4 for the serve loop's OTHER half.  The loop's
        # decode_s is queue-attributed (it absorbs whatever device work
        # is in flight under the awaited readback), so the honest
        # per-token device cost needs an idle-chip chained measurement:
        # dispatch k+1 consumes dispatch k's donated outputs exactly as
        # the engine does, block_until_ready between dispatches.
        from mraudio_tpu.infer.serving import ContinuousBatcher, Request

        engine = ContinuousBatcher(
            model_keep if args.kv_keep else model_nokeep, params,
            prefix_len=s, max_new_tokens=args.budget,
            eos_id=2, max_slots=args.slots, max_prefill_batch=b,
            steps_per_dispatch=args.window,
        )
        reqs = [
            Request(request_id=i, prefix_embeds=x[i % b],
                    prefix_mask=mask01[i % b])
            for i in range(args.slots)
        ]
        admitted = 0
        while admitted < args.slots:
            admitted += engine.submit_many(reqs[admitted:])
        jax.block_until_ready(engine.cache)
        active = jnp.asarray(engine.active)
        state = (engine.cache, engine.dcur, engine.dpos, engine.dvalid,
                 engine.dlen)

        def dispatch(state):
            out = engine._decode_window(engine.params, *state, active)
            # sync via VALUE readback, not block_until_ready: the decode
            # window donates its big inputs, so every large output
            # aliases an input buffer, and on this remote backend
            # block_until_ready on aliased outputs returns immediately
            # (measured: "1.7 ms" for a dispatch whose weight reads
            # alone cost ~8 ms).  A D2H copy of dcur (written by the
            # last micro-step) cannot complete before the execution does.
            np.asarray(out[1])
            return out[:5], out[5]

        t0 = time.perf_counter()
        state, _ = dispatch(state)          # compile + warm
        comp = time.perf_counter() - t0
        times = []
        for _ in range(args.decode_dispatches):
            t0 = time.perf_counter()
            state, _ = dispatch(state)
            times.append(time.perf_counter() - t0)
        best, med = min(times), sorted(times)[len(times) // 2]
        K = args.window
        print(f"decode window K={K}, slots={args.slots} "
              f"(slot_prefix={engine.slot_prefix}, max_len={engine.max_len}): "
              f"best {best*1000:.1f} ms / med {med*1000:.1f} ms per dispatch "
              f"= {med*1000/K:.1f} ms/token-row (compile+1st {comp:.1f}s)  "
              f"all={['%.3f' % t for t in times]}", flush=True)
        results["decode_dispatch_s"] = med

    if ("prefill_keep_s" in results and "prefill_nokeep_match_s" in results
            and "engine_admit_s" in results):
        # alloc-matched A/B: both passes ran at alloc = s, so the delta
        # is scoring alone, not the ~1.2% cache-column difference
        score = results["prefill_keep_s"] - results["prefill_nokeep_match_s"]
        residual = (results["engine_admit_s"]
                    - results["prefill_keep_s"] - results["compact_s"])
        print(f"\nattribution: obs-scoring {score*1000:+.0f} ms "
              f"(alloc-matched), compact {results['compact_s']*1000:.0f} ms, "
              f"residual {residual*1000:+.0f} ms "
              f"(jit fusion of prefill+compact inside the engine dispatch; "
              f"engine total {results['engine_admit_s']*1000:.0f} ms)")


if __name__ == "__main__":
    main()
