"""Benchmark: end-to-end moment-retrieval throughput (clips/sec/chip).

Measures the full inference pipeline — on-device preprocessing (frame
normalize + mel fbank), EVA-ViT/BEATs encoding, dual Q-Formers,
interleave build, and the 64-token greedy decode — on synthetic
QVH-shaped inputs with random weights (no weight corpus ships in this
environment; throughput is architecture-shaped, not weight-shaped).

Prints ONE JSON line:
    {"metric": "clips/sec/chip", "value": N, "unit": "clips/s",
     "vs_baseline": N, ...}

``vs_baseline`` compares against the same pipeline run on the host CPU
(the reference implementation is CPU-bound Python/torch; BASELINE.md's
north-star is >=10x CPU at parity).  The CPU number is measured once
and cached in ``.bench_cpu_cache.json``.

Profile via MRAUDIO_BENCH_PROFILE:
tiny | base | full | charades | videollama (default full — the
production-size stack is the headline).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def make_profile(name: str):
    from mraudio_tpu.config import (
        AudioFrontendConfig,
        BeatsConfig,
        DataConfig,
        LlamaConfig,
        LoraConfig,
        QFormerConfig,
        ViTConfig,
        XInstructBLIPConfig,
        tiny_data_config,
        tiny_model_config,
    )

    if name == "tiny":
        return tiny_model_config(), tiny_data_config(n_frms=4), 2, 3

    if name == "base":
        # QVH-shaped data; mid-size stack (ViT-B-class frame encoder,
        # real-size BEATs/Q-Former, ~1.1B-class decoder).
        model = XInstructBLIPConfig(
            vit=ViTConfig(image_size=224, patch_size=14, width=768, depth=12,
                          num_heads=12, mlp_dim=3072),
            beats=BeatsConfig(),
            qformer=QFormerConfig(),
            llm=LlamaConfig(vocab_size=32001, hidden_size=2048, num_layers=22,
                            num_heads=16, num_kv_heads=16, intermediate_size=5504),
            lora=LoraConfig(),
            max_new_tokens=64,
        )
        data = DataConfig.for_dataset("QVH").replace(video_source="synthetic")
        return model, data, 2, 2

    if name in ("full", "charades"):
        # int8 KV cache by default: B=2 next to the int8 7B no longer
        # fits a 16 GB chip with a bf16 cache (5.7 GB vs 2.9 GB), and
        # the kernels consume the int8 tensors directly (scales fold
        # into logits/probs), so throughput matches bf16 — measured
        # 0.464 vs 0.462 clips/s (docs/BENCHMARKS.md).
        kv_quant = os.environ.get("MRAUDIO_BENCH_KV_QUANT", "int8")
        # MRAUDIO_BENCH_KEYFRAME_INTERVAL=K (K>1) turns on the opt-in
        # temporal-residual ViT (models/eva_vit.py) — an approximation,
        # so it is never the headline configuration.
        kf = int(os.environ.get("MRAUDIO_BENCH_KEYFRAME_INTERVAL", "1"))
        scan = os.environ.get("MRAUDIO_BENCH_SCAN_LAYERS", "0") == "1"
        # MRAUDIO_BENCH_CONSTRAINED=1 measures grammar-constrained
        # decoding (+ forced-token speculation, MRAUDIO_BENCH_SPEC_WIDTH).
        # Not the headline: under random weights the grammar changes how
        # fast rows terminate, so it isn't clip-comparable with the
        # unconstrained run — compare spec_width=1 vs >1 instead (token-
        # identical by construction).
        constrained = os.environ.get("MRAUDIO_BENCH_CONSTRAINED", "0") == "1"
        spec = int(os.environ.get("MRAUDIO_BENCH_SPEC_WIDTH", "4"))
        # MRAUDIO_BENCH_LOOKUP_SPEC=W (W>=2) turns on exact greedy
        # self-speculation (infer/generate.py::lookup_generate) — token-
        # identical to plain greedy, so unlike the grammar path it IS
        # clip-comparable with the unconstrained baseline.
        lookup = int(os.environ.get("MRAUDIO_BENCH_LOOKUP_SPEC", "0"))
        # MRAUDIO_BENCH_VIDEO_WIRE=yuv420 ships I420 planes (half the
        # host->device video bytes; identical pixels up to 4:2:0 chroma,
        # which the source video had already discarded).
        wire = os.environ.get("MRAUDIO_BENCH_VIDEO_WIRE", "rgb")
        # MRAUDIO_BENCH_KV_KEEP=N (N>0) turns on post-prefill KV
        # compaction (config.LlamaConfig.kv_keep) — an approximation, so
        # never the headline configuration.
        keep = int(os.environ.get("MRAUDIO_BENCH_KV_KEEP", "0"))
        # MRAUDIO_BENCH_QUANT overrides the weight format (int8 default;
        # int4 halves weight bytes again — also an accuracy trade).
        quant = os.environ.get("MRAUDIO_BENCH_QUANT", "int8")
        # MRAUDIO_BENCH_MLP_CHUNK=N tiles the prefill MLP over N-token
        # chunks (caps the (B, S, 11008) f32 gate/up temps).  NOT part
        # of the default B=3 config: measured to *grow* the compiled
        # footprint next to prefill_chunk (the scan body's stacked temps
        # outweigh the gate/up savings) — B=3 + prefill_chunk alone
        # compiles, B=3 + both OOMs by 287 MB.
        mlp_chunk = int(os.environ.get("MRAUDIO_BENCH_MLP_CHUNK", "0"))
        # MRAUDIO_BENCH_PREFILL_CHUNK=N runs prefill in N-token segments
        # (bit-identical tokens; caps the O(B*S) prefill temps — this is
        # what makes the default B=3 fit one 16 GB chip: measured 0.6488
        # clips/s @ 38% MFU vs 0.5995 @ B=2 — docs/BENCHMARKS.md).
        pf_chunk = int(os.environ.get("MRAUDIO_BENCH_PREFILL_CHUNK", "2048"))
        # MRAUDIO_BENCH_UNROLL_PREFILL=1 unrolls the prefill attention's
        # query tiles — EXACT numerics (same ops, traced unrolled), ~4%
        # at B=2 but ~4x the cold compile; a long-lived process's trade.
        unroll = os.environ.get("MRAUDIO_BENCH_UNROLL_PREFILL", "0") == "1"
        model = XInstructBLIPConfig(
            vit=ViTConfig(keyframe_interval=kf),
            llm=LlamaConfig(quantization=quant, kv_quant=kv_quant,
                            scan_layers=scan, kv_keep=keep,
                            mlp_seq_chunk=mlp_chunk,
                            attention_unroll_prefill=unroll,
                            prefill_chunk=pf_chunk),
            constrained_decoding=constrained,
            spec_width=spec,
            lookup_spec=lookup,
            video_wire=wire,
        )
        if name == "charades":
            # Charades-STA shapes (20 frames) on the same full-size
            # stack and knob surface; the ~3x shorter prefill (~0.5 GB
            # int8 KV per row) admits a larger default batch — measured
            # 1.321 (B=2) -> 1.551 (B=6) -> 1.786 clips/s (B=8);
            # B=10 OOMs by 316 MB.
            data = DataConfig.for_dataset("Charades_STA").replace(
                video_source="synthetic", video_wire=wire
            )
            return model, data, 8, 2
        data = DataConfig.for_dataset("QVH").replace(
            video_source="synthetic", video_wire=wire
        )
        return model, data, 3, 3

    if name == "videollama":
        # Backbone #2 (models/videollama.py) at full size on QVH shapes,
        # sharing the `full` profile's knob surface.  The STC connector
        # compresses 60 frames to ~960 LLM tokens (vs 5,353 for the
        # interleaved X-InstructBLIP prefix), so the KV cache is ~4.4x
        # smaller per row and a larger batch fits one chip.
        from mraudio_tpu.models.videollama import videollama_config_from

        base_model, data, _, _ = make_profile("full")
        return videollama_config_from(base_model, data.n_frms), data, 4, 3

    raise ValueError(f"unknown profile {name}")


def make_batch(data_cfg, model, batch_size: int):
    from mraudio_tpu.data.dataset import MRDataset, collate

    anns = [
        {
            "vid": f"bench{i}",
            "qid": i,
            "query": "a person demonstrates the benchmark action",
            "duration": 150,
            "relevant_windows": [[10, 30]],
        }
        for i in range(batch_size)
    ]
    ds = MRDataset(data_cfg, annotations=anns)
    return collate([ds.get(i) for i in range(batch_size)], batch_size)


def flops_report(model, data_cfg, batch_size: int, clips_per_sec: float,
                 device_kind: str) -> dict:
    """Analytic FLOPs + MFU for the measured configuration."""
    from mraudio_tpu.models.videollama import VideoLLaMA
    from mraudio_tpu.utils.flops import (
        peak_flops_for,
        pipeline_flops,
        videollama_flops,
    )

    cfg = model.cfg
    n_frms = data_cfg.n_frms
    if isinstance(model, VideoLLaMA):
        v_tok = (n_frms // cfg.temporal_stride) * (
            cfg.vit.num_patches // cfg.spatial_pool ** 2
        )
        prefill = v_tok + n_frms + cfg.max_txt_len
        f = videollama_flops(
            cfg, model.audio_cfg, n_frms, 1, prefill, cfg.max_new_tokens
        )
    else:
        per_frame = sum(
            len(model.cue_ids[m]) + cfg.qformer.num_query_tokens
            for m in ("video", "audio") if m in cfg.modalities
        ) + (cfg.tokens_per_timestamp if cfg.interleave_seconds else 0)
        prefill = n_frms * per_frame + cfg.tokens_per_duration + cfg.max_txt_len
        f = pipeline_flops(cfg, model.audio_cfg, n_frms, 1, prefill, cfg.max_new_tokens)
    peak = peak_flops_for(device_kind)
    achieved = clips_per_sec * f["total"]
    # Decode is HBM-bound, not FLOPs-bound: quote its token rate from the
    # measured share of time it would take at the same utilization.
    return {
        "prefill_tokens": prefill,
        "flops_per_clip_T": round(f["total"] / 1e12, 1),
        "flops_split_T": {k: round(v / 1e12, 2) for k, v in f.items() if k != "total"},
        "peak_tflops": peak / 1e12,
        "mfu": round(achieved / peak, 4),
    }


def enable_compile_cache():
    """Persistent XLA compilation cache: repeat bench runs of the same
    graph skip the multi-minute full-size compile."""
    from mraudio_tpu.utils.platform import enable_compile_cache as _enable

    _enable(os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))


def run(profile: str, steps: int | None = None, batch_size: int | None = None,
        warmup: bool = True, runs: int = 1):
    """``runs`` > 1 repeats the steady-state measurement (same compiled
    graphs, warm) and reports the MEDIAN rate plus every run's rate —
    the tunnel's dispatch latency swings ±25% run to run, so a single
    sample is not a defensible headline (VERDICT r3 #2).

    ``warmup=False`` skips the separate compile pass and times the
    (single) measured loop compile-inclusive — for the offline CPU
    baseline, where a clip takes hours and compile is minutes-scale
    noise (documented in docs/BENCHMARKS.md)."""
    import statistics

    import jax

    from mraudio_tpu.models.videollama import VideoLLaMA, VideoLLaMAConfig
    from mraudio_tpu.models.xinstructblip import XInstructBLIP

    model_cfg, data_cfg, default_batch, default_steps = make_profile(profile)
    steps = steps or default_steps
    batch_size = batch_size or default_batch
    setup_t0 = time.time()
    if isinstance(model_cfg, VideoLLaMAConfig):
        model = VideoLLaMA(model_cfg, audio_cfg=data_cfg.audio)
    else:
        model = XInstructBLIP(model_cfg, audio_cfg=data_cfg.audio)
    params = model.init_params(jax.random.PRNGKey(0))
    from mraudio_tpu.models.casting import cast_params_for_inference

    params = cast_params_for_inference(params)
    if os.environ.get("MRAUDIO_BENCH_QUANT_ENCODERS"):
        # opt-in int8 encoder storage (approximation; quant_tree)
        from mraudio_tpu.models.quant_tree import quantize_subtrees

        params = quantize_subtrees(
            params, getattr(model, "ENCODER_PARAM_KEYS", ())
        )
    if os.environ.get("MRAUDIO_BENCH_ZERO_HEAD"):
        # Upper-bound probe for lookup speculation: an all-zero lm_head
        # makes greedy emit one repeated token (argmax ties at 0: never
        # EOS, so the full 64-step budget runs, and every bigram draft
        # verifies).  Same compiled graphs as the normal run — only the
        # param values change — so greedy-vs-lookup under this flag
        # isolates the decode-dispatch reduction at acceptance=1.
        import jax.numpy as jnp

        params = dict(params)
        params["llm"] = dict(params["llm"])
        params["llm"]["lm_head"] = {
            k: jnp.zeros_like(v) for k, v in params["llm"]["lm_head"].items()
        }
    batch = make_batch(data_cfg, model, batch_size)
    setup_time = time.time() - setup_t0

    # Warmup / compile.
    compile_time = 0.0
    if warmup:
        t0 = time.time()
        model.generate(params, batch)
        compile_time = time.time() - t0

    # Steady state, pipelined exactly as the eval driver runs: step i+1's
    # transfer AND dispatch are issued before step i's token readback, so
    # the device queue never drains across the host gap.
    rates, run_elapsed = [], []
    for _ in range(max(1, runs)):
        t0 = time.time()
        dev = model.device_inputs(batch)
        pending = None
        for i in range(steps):
            next_dev = model.device_inputs(batch) if i + 1 < steps else None
            submitted = model.generate_submit(params, batch, device_inputs=dev)
            if pending is not None:
                model.generate_finalize(pending)
            pending = submitted
            dev = next_dev
        out = model.generate_finalize(pending)
        elapsed = time.time() - t0
        run_elapsed.append(elapsed)
        rates.append(batch_size * steps / elapsed)
    clips_per_sec = statistics.median(rates)
    result = {
        "clips_per_sec": clips_per_sec,
        "runs_clips_per_sec": [round(r, 4) for r in rates],
        "setup_time_s": setup_time,
        "compile_time_s": compile_time,
        "elapsed_s": sum(run_elapsed),
        "batch_size": batch_size,
        "steps": steps,
        "n_frms": data_cfg.n_frms,
        "sample_output": out[0][:40],
    }
    result["flops"] = flops_report(
        model, data_cfg, batch_size, clips_per_sec,
        jax.devices()[0].device_kind,
    )
    result["_model"] = model
    result["_params"] = params
    result["_data_cfg"] = data_cfg
    return result


MEDIA_ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          ".bench_media")


def run_media_pass(model, params, data_cfg, batch_size: int) -> dict:
    """Media-included measurement: the SAME model/params/compiled graph,
    but clips read from real H.264+AAC mp4 files on disk through the
    native decoder with thread prefetch — i.e. the full
    preprocess+encode+decode pipeline of the BASELINE metric, driven by
    the production eval driver (`infer/evaluate.py`), not a synthetic
    batcher.  The fabricated corpus (data/media.py) is cached under
    ``.bench_media`` across runs."""
    import time as _time

    from mraudio_tpu.config import RunConfig
    from mraudio_tpu.data.dataset import MRDataset
    from mraudio_tpu.data.media import fabricate_media_set
    from mraudio_tpu.infer.evaluate import run_inference

    fab_t0 = _time.time()
    ann = fabricate_media_set(
        MEDIA_ROOT, n_videos=8, duration=150.0, fps=24.0,
        queries_per_video=3, gop=60, seed=11,
    )
    fabricate_s = _time.time() - fab_t0
    media_data = data_cfg.replace(
        video_source="native", video_folder=MEDIA_ROOT, annotation_file=ann,
    )
    # Host decode budget: one full sample fetch (video gather + audio
    # demux + resample), measured serially outside the overlap.
    ds = MRDataset(media_data, annotation_path=ann)
    t0 = _time.time()
    for i in (0, 1, 2):
        ds.get(i, strict=True)
    decode_s_per_clip = (_time.time() - t0) / 3
    cfg = RunConfig(model=model.cfg, data=media_data)
    res = run_inference(
        cfg, model=model, params=params,
        output_file=None, batch_size=batch_size, num_workers=2,
    )
    return {
        "media_clips_per_sec": round(res["clips_per_sec"], 4),
        "decode_s_per_clip": round(decode_s_per_clip, 3),
        "media_clips": len(res["records"]),
        "media_batch_size": res["batch_size"],
        "media_fabricate_s": round(fabricate_s, 1),
    }


CACHE_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          ".bench_cpu_cache.json")
TRAIN_CACHE_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".bench_train_cache.json")


def run_train(profile: str = "train", steps: int | None = None,
              batch_size: int | None = None) -> dict:
    """Training-throughput profile: sec/step, train clips/s, analytic
    train MFU for the full-size --single-chip stack (profile "train")
    or the tiny config (profile "train-tiny").

    Measured as two epochs over synthetic QVH-shaped batches: epoch 0
    pays the compile, epoch 1 is the steady-state measurement (the
    windowed encoder path makes per-step gaps uneven, so whole-epoch
    wall time / steps is the honest rate).  Results are cached in
    ``.bench_train_cache.json`` so the routine benchmark run (which
    must stay ~10 min) embeds them without re-measuring; refresh with
    ``MRAUDIO_BENCH_PROFILE=train python bench.py``."""
    import json as _json
    import time as _time

    import jax

    from mraudio_tpu.config import (
        DataConfig, RunConfig, TrainConfig, full_model_config,
        tiny_data_config, tiny_model_config,
    )
    from mraudio_tpu.data.dataset import MRDataset
    from mraudio_tpu.train.trainer import Trainer
    from mraudio_tpu.utils.flops import (
        peak_flops_for, prefill_length, train_step_flops,
    )

    tiny = profile.endswith("tiny")
    if tiny:
        batch = batch_size or 2
        steps = steps or 4
        model_cfg = tiny_model_config()
        data_cfg = tiny_data_config(n_frms=4)
        tc = TrainConfig(max_epoch=2, batch_size=batch, warmup_steps=2,
                         accum_grad_iters=2, output_dir="/tmp/bench_train_out",
                         val_freq=10, save_freq=0, num_workers=1)
    else:
        # the measured one-16GB-chip production recipe
        # (cli/finetune.py --single-chip; docs/BENCHMARKS.md)
        batch = batch_size or 2
        model_cfg = full_model_config()
        model_cfg = model_cfg.replace(
            vit=model_cfg.vit.replace(grad_checkpoint=True),
            llm=model_cfg.llm.replace(
                grad_checkpoint=True, scan_layers=True,
                attention_unroll_train=True,
            ),
        )
        data_cfg = DataConfig.for_dataset("QVH", video_source="synthetic")
        # encoder_window: bitwise-exact; amortizes the per-window
        # encoder-weight upload (1.44 GB — wire-bound at ~35 MB/s
        # through this tunnel, ~44 s) over W steps.  Default 12 = the
        # --single-chip recipe (cli/finetune.py) and the recorded
        # round-4 cache entry; steps defaults to one full window so the
        # measured epoch amortizes exactly as recorded.  Keep steps a
        # multiple of W or the tail window under-amortizes.
        window = int(os.environ.get("MRAUDIO_BENCH_TRAIN_WINDOW", "12"))
        # TWO windows by default (r5): with one window per epoch the
        # double-buffered upload (train.upload_overlap) never engages —
        # there is no next window to stage for.  At 2 windows the
        # second window's ~1.4 GB encoder upload streams while the
        # first window's LLM steps run, so the measured sec_per_step
        # includes one visible upload instead of two (the steady-state
        # limit is ~zero visible uploads; a 24-step epoch shows the
        # first-window cold upload amortized over 2W steps).
        # MRAUDIO_BENCH_TRAIN_OVERLAP=1 opts in to the double-buffered
        # upload — NOT the default: the B=2 flagship config has < 1.4 GB
        # of headroom over program B's peak and measured a mid-window
        # RESOURCE_EXHAUSTED with the staged copy resident (round 5);
        # B=1 (BATCH=1) is where the overlap pays on one chip.
        steps = steps or 2 * window
        overlap = os.environ.get("MRAUDIO_BENCH_TRAIN_OVERLAP", "0") == "1"
        tc = TrainConfig(max_epoch=2, batch_size=batch, warmup_steps=2,
                         accum_grad_iters=2, output_dir="/tmp/bench_train_out",
                         val_freq=10, save_freq=0, num_workers=1,
                         quant_frozen="int8", split_encode_step=True,
                         encoder_window=window, upload_overlap=overlap)
    anns = [
        {"vid": f"t{i}", "qid": i, "query": "a person trains the benchmark",
         "duration": 150, "relevant_windows": [[10, 30]]}
        for i in range(batch * steps)
    ]
    cfg = RunConfig(model=model_cfg, data=data_cfg, train=tc)
    train_ds = MRDataset(data_cfg, annotations=anns, split="train")
    val_ds = MRDataset(data_cfg, annotations=anns[:batch], split="eval")
    trainer = Trainer(cfg, train_dataset=train_ds, val_dataset=val_ds)

    t0 = _time.time()
    trainer.train_epoch(0)   # compile + first pass
    compile_epoch_s = _time.time() - t0
    t0 = _time.time()
    trainer.train_epoch(1)   # steady state
    steady_s = _time.time() - t0

    # Device-true stage accounting (VERDICT r3 #3): time each of the
    # windowed step's device stages individually, block_until_ready-
    # bracketed on an idle queue — encoder-weight upload (paid once per
    # encoder_window of W steps), the encode dispatch, and the loss/grad/
    # update dispatch.  device_true_sec_per_step = upload/W + encode +
    # step is what the hardware needs per step with zero host/tunnel
    # dead time; the gap to the end-to-end sec/step is dispatch latency
    # and host work, not compute.
    device_true = {}
    if not tiny:
        try:
            device_true = _train_device_true(trainer, steps)
        except Exception as e:  # never fail the profile on the probe
            device_true = {"device_true_error": f"{type(e).__name__}: {e}"[:200]}

    sec_per_step = steady_s / steps
    clips_per_sec = batch / sec_per_step
    seq = prefill_length(model_cfg, data_cfg.n_frms) + model_cfg.max_output_txt_len
    f = train_step_flops(
        model_cfg, data_cfg.audio, data_cfg.n_frms, batch, seq,
        grad_checkpoint=model_cfg.llm.grad_checkpoint,
    )
    peak = peak_flops_for(jax.devices()[0].device_kind)
    result = {
        "profile": profile,
        "sec_per_step": round(sec_per_step, 2),
        "train_clips_per_sec": round(clips_per_sec, 4),
        "train_mfu": round(f["total"] / sec_per_step / peak, 4),
        "train_flops_per_step_T": round(f["total"] / 1e12, 1),
        "batch_size": batch,
        "steps": steps,
        "n_frms": data_cfg.n_frms,
        "seq_len": seq,
        "compile_epoch_s": round(compile_epoch_s, 1),
        "device": jax.devices()[0].device_kind,
        **({"upload_overlap": tc.upload_overlap,
            "encoder_window": tc.encoder_window} if not tiny else {}),
        **device_true,
    }
    if "device_true_sec_per_step" in result:
        result["device_true_mfu"] = round(
            f["total"] / result["device_true_sec_per_step"] / peak, 4
        )
    cache = {}
    if os.path.exists(TRAIN_CACHE_PATH):
        with open(TRAIN_CACHE_PATH) as fp:
            cache = _json.load(fp)
    cache[profile] = result
    with open(TRAIN_CACHE_PATH, "w") as fp:
        _json.dump(cache, fp, indent=1)
    return result


def _train_device_true(trainer, steps: int) -> dict:
    """Stage-isolated device-true timing of one full-size train step
    (the train-step analog of ``scripts/profile_engine_prefill.py``).

    Runs each device stage of the windowed split step alone on an idle
    queue, ``block_until_ready``-bracketed, min-of-3 after the in-epoch
    compile (``perf_counter``; every rep attached): encoder-weight
    upload, encode dispatch (program A), loss/grad/update dispatch
    (program B).  Only meaningful for the windowed split-step config the
    ``train`` profile measures (``cli/finetune.py --single-chip``)."""
    import time as _time

    import jax

    fns = next(iter(trainer._step_fns.values()))
    if not (isinstance(fns, tuple) and fns[0] == "windowed"):
        return {"device_true_error": "not the windowed split-step config"}
    _, encode_fn, step_jit, frozen_enc, frozen_rest = fns
    W = trainer.cfg.train.encoder_window
    batch = next(trainer.train_loader.iter_from(0))
    arrays = trainer._arrays_for_loss(batch)
    crop = trainer._sample_crops(batch, step=0)
    rng = jax.random.fold_in(trainer._drop_key, 0)

    def best(f, reps=3):
        ts = []
        for _ in range(reps):
            t0 = _time.perf_counter()
            f()
            ts.append(round(_time.perf_counter() - t0, 3))
        return min(ts), ts

    def upload():
        # the real per-window path: one packed transfer + one jitted
        # unpack (trainer._upload_encoders).  Sync via VALUE readback:
        # unpack outputs may alias the donated buffer, and on the remote
        # backend block_until_ready on aliased outputs does not wait.
        dev = trainer._upload_encoders(frozen_enc)
        np.asarray(next(iter(dev.values()))[..., :1])
        for v in dev.values():
            v.delete()

    upload_s, upload_all = best(upload)

    dev_enc = trainer._upload_encoders(frozen_enc)
    np.asarray(next(iter(dev_enc.values()))[..., :1])
    modal_box = [None]

    def encode():
        modal_box[0] = encode_fn(dev_enc, *arrays[:4], crop)
        jax.block_until_ready(modal_box[0])

    encode_s, encode_all = best(encode)
    modal = modal_box[0]
    for v in dev_enc.values():
        v.delete()

    carry = [trainer.trainable, trainer.opt_state]

    def step():
        loss, carry[0], carry[1] = step_jit(
            carry[0], frozen_rest, carry[1], modal, arrays[4:], rng
        )
        jax.block_until_ready(loss)

    step_s, step_all = best(step)
    # step_jit donates (trainable, opt_state): hand the live buffers back
    trainer.trainable, trainer.opt_state = carry

    per_step = upload_s / max(W, 1) + encode_s + step_s
    return {
        "device_true_sec_per_step": round(per_step, 3),
        "device_true_upload_s": upload_s,
        "device_true_encode_s": encode_s,
        "device_true_step_s": step_s,
        "device_true_runs": {
            "upload": upload_all, "encode": encode_all, "step": step_all,
        },
        "encoder_window": W,
        # per-step dispatch budget of the end-to-end path: 1 encode + 1
        # step + 1/W weight upload (plus token readback in _post_step)
        "dispatches_per_step": round(2 + 1 / max(W, 1), 2),
    }


def cached_train_results() -> dict | None:
    if os.path.exists(TRAIN_CACHE_PATH):
        with open(TRAIN_CACHE_PATH) as fp:
            cache = json.load(fp)
        return {k: {**v, "cached": True} for k, v in cache.items()}
    return None


SERVE_CACHE_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".bench_serve_cache.json")


def run_serve(profile: str = "serve") -> dict:
    """Serving-throughput profile: requests/sec of the continuous-batching
    engine (`infer/serving.py`) driven through the serve CLI's loop, full
    size ("serve") or tiny ("serve-tiny").

    Default = the production pipeline rate: inline encode mode (encoder
    dispatches overlap in-flight decode, device-resident prefix embeds —
    no host round trip per request) on the measured deployable engine
    config (slots=4, 2-wide batched admission, SnapKV keep=1784; see
    docs/BENCHMARKS.md "Serving").  requests/sec then covers everything a
    deployment pays per request: preprocess, encoders, prefill, decode.
    Knobs (env): MRAUDIO_BENCH_SERVE_{REQUESTS,SLOTS,MPB,KV_KEEP,SPEC,
    STEPS,PIPELINE,MODE,ENCODE_BATCH,AHEAD,REPEAT}.  Like the train
    profile, results are cached in
    ``.bench_serve_cache.json`` so the routine ~10-min benchmark run
    embeds them without re-measuring; refresh with
    ``MRAUDIO_BENCH_PROFILE=serve python bench.py``."""
    import json as _json
    import time as _time

    import jax

    from mraudio_tpu.cli.serve import (
        encode_request_stream, encode_requests, serve,
    )
    from mraudio_tpu.data.dataset import MRDataset
    from mraudio_tpu.models.casting import cast_params_for_inference
    from mraudio_tpu.models.xinstructblip import XInstructBLIP

    tiny = profile.endswith("tiny")
    env = lambda k, d: os.environ.get(f"MRAUDIO_BENCH_SERVE_{k}", d)  # noqa: E731
    n_requests = int(env("REQUESTS", "5" if tiny else "10"))
    slots = int(env("SLOTS", "2" if tiny else "4"))
    mpb = int(env("MPB", "0" if tiny else "2"))
    kv_keep = int(env("KV_KEEP", "0" if tiny else "1784"))
    spec = int(env("SPEC", "1"))
    # K=2 is the recorded deployable config; K=8 measured a tie (the
    # makespan is device-work bound, docs/BENCHMARKS.md round 4).
    # spec_width>1 requires steps_per_dispatch=1 (ContinuousBatcher),
    # so a SPEC>1 sweep without STEPS set must not inherit the K=2 default
    steps = int(env("STEPS", "1" if spec > 1 else "2"))
    depth = int(env("PIPELINE", "2"))
    mode = env("MODE", "inline")
    encode_batch = int(env("ENCODE_BATCH", "0")) or mpb or slots
    encode_ahead = int(env("AHEAD", "1"))  # host-stage groups prefetched
    # UPLOAD=1: prefetch worker also device_puts input buffers ahead —
    # opt-in, measured to OOM the full-size config (cli/serve.py)
    upload_ahead = env("UPLOAD", "0") == "1"

    model_cfg, data_cfg, _, _ = make_profile("tiny" if tiny else "full")
    if kv_keep:
        model_cfg = model_cfg.replace(
            llm=model_cfg.llm.replace(kv_keep=kv_keep)
        )
    setup_t0 = _time.time()
    model = XInstructBLIP(model_cfg, audio_cfg=data_cfg.audio)
    params = cast_params_for_inference(
        model.init_params(jax.random.PRNGKey(0))
    )
    if env("QUANT_ENCODERS", "0") == "1":
        # int8 encoder storage (approximation; frees ~1.35 GB for an
        # extra decode slot — the slots=5 capacity probe)
        from mraudio_tpu.models.quant_tree import quantize_subtrees

        params = quantize_subtrees(params, model.ENCODER_PARAM_KEYS)
    anns = [
        {"vid": f"srv{i}", "qid": i,
         "query": "a person serves the benchmark request",
         "duration": 150, "relevant_windows": [[10, 30]]}
        for i in range(n_requests)
    ]
    ds = MRDataset(data_cfg, annotations=anns)
    setup_s = _time.time() - setup_t0

    # One engine for the whole measurement (production semantics: a
    # serving process keeps its engine alive forever).  Rebuilding it
    # per run re-paid per-instance jit re-trace + compile-cache
    # deserialization — measured ~20 s of a 45 s run.
    engine_holder: dict = {}

    def one_run():
        if mode == "inline":
            stream = encode_request_stream(
                model, params, ds, limit=n_requests,
                device_embeds=True, encode_batch=encode_batch,
                host_ahead=encode_ahead, upload_ahead=upload_ahead,
            )
            _, stats = serve(
                model, params, None, slots, model_cfg.max_new_tokens,
                max_prefill_batch=mpb, spec_width=spec,
                steps_per_dispatch=steps,
                pipeline_depth=depth, request_stream=stream,
                encode_batch=encode_batch, engine_cache=engine_holder,
            )
        else:
            t0 = _time.time()
            reqs = encode_requests(model, params, ds, limit=n_requests,
                                   device_embeds=False,
                                   encode_batch=encode_batch,
                                   host_ahead=encode_ahead,
                                   upload_ahead=upload_ahead)
            encode_s = _time.time() - t0
            _, stats = serve(
                model, params, reqs, slots, model_cfg.max_new_tokens,
                max_prefill_batch=mpb, spec_width=spec,
                steps_per_dispatch=steps,
                pipeline_depth=depth, encode_s=encode_s,
                encode_batch=encode_batch, engine_cache=engine_holder,
            )
        return stats

    # Honest repeats (VERDICT r3 #1): WARMUP=1 runs the loop once
    # UNCOUNTED (it pays the engine-jit compiles, which would otherwise
    # sink the first measured run by an order of magnitude), then
    # REPEAT (default 3) measured runs; the recorded stats are the run
    # with the MEDIAN requests/sec, every run's rate attached.  A run
    # lost to the allocator's run-to-run RESOURCE_EXHAUSTED variance
    # near the 16 GB line (the in-loop drain-and-retry usually absorbs
    # it; observed to escape once) drops that repeat instead of the
    # whole measurement.
    import gc

    repeat = max(1, int(env("REPEAT", "3")))
    warmups = int(env("WARMUP", "1"))
    all_stats = []
    for r in range(warmups + repeat):
        try:
            st = one_run()
            if r >= warmups:
                all_stats.append(st)
            print(f"serve run {r}{' (warmup)' if r < warmups else ''}: "
                  f"{st['requests_per_sec']} req/s p95={st['latency_p95_s']}",
                  file=__import__("sys").stderr, flush=True)
        except jax.errors.JaxRuntimeError as e:
            if "RESOURCE_EXHAUSTED" not in str(e):
                raise
            if r == warmups + repeat - 1 and not all_stats:
                raise
            print(f"serve repeat {r} ResourceExhausted; continuing",
                  file=__import__("sys").stderr, flush=True)
            # the failed dispatch consumed donated engine buffers — the
            # cached engine is poisoned (its next use would die on
            # 'Array has been deleted', which the handler above would
            # NOT catch); evict it so the next repeat builds fresh
            if "engine" in engine_holder:
                engine_holder.pop("engine").close()
                engine_holder.clear()
        # Every iteration, success or not: collect AFTER the except
        # scope closes (inside it, the exception's __traceback__ still
        # pins the dead run's frames — engine + device-resident prefix
        # embeds), so the next run builds against a clean chip tens of
        # MB from the 16 GB line.
        gc.collect()
    # λ-load leg (VERDICT r4 #5): one sustained-load pass under an
    # open-loop Poisson arrival process with a per-request deadline, on
    # the SAME warm engine — requests pre-encoded (upfront) so the
    # measured figure isolates serving behavior under load; the burst
    # figure above stays the continuity headline.  λ defaults below the
    # measured burst capacity (stable queue); override with
    # MRAUDIO_BENCH_SERVE_LAMBDA / _TIMEOUT.
    # Two default λ points make a minimal latency-vs-λ curve.  The
    # engine is a BATCH server: its service rate grows with queue depth
    # (a solo request pays the full ~19 s weight-stream decode + its
    # host-resident prefix upload; 4 concurrent slots share the sweep →
    # the 0.52 req/s burst rate).  So the sparse point (λ=0.05, gaps ≳
    # the solo service time) measures the open-loop SOLO latency floor,
    # and the dense point (λ=0.35) measures the batching regime where
    # queueing raises concurrency and throughput — a non-monotonic
    # utilization curve that is real, not a bug (docs/BENCHMARKS.md
    # round-5 serving notes).
    load_stats = None
    lam_env = env("LAMBDA", "0" if tiny else "0.05,0.35")
    lams = [float(x) for x in lam_env.split(",") if float(x) > 0]
    if lams:
        from mraudio_tpu.cli.serve import poisson_arrivals

        timeout_s = float(env("TIMEOUT", "120"))
        load_stats = []
        try:
            t0 = _time.time()
            reqs = encode_requests(model, params, ds, limit=n_requests,
                                   device_embeds=False,
                                   encode_batch=encode_batch,
                                   host_ahead=encode_ahead)
            load_encode_s = _time.time() - t0
            for lam in lams:
                # two passes, record the SECOND: sparse arrivals admit at
                # widths the burst warmup never compiled (width-1/odd
                # admission jits), and that cold compile polluted the
                # first measured λ leg by up to 4x (observed: 0.148 vs
                # 0.239 req/s at λ=0.35 cold vs warm)
                for _pass in range(2):
                    _, ls = serve(
                        model, params, reqs, slots, model_cfg.max_new_tokens,
                        max_prefill_batch=mpb, spec_width=spec,
                        steps_per_dispatch=steps, pipeline_depth=depth,
                        encode_s=load_encode_s, encode_batch=encode_batch,
                        engine_cache=engine_holder,
                        arrivals=poisson_arrivals(len(reqs), lam, seed=0),
                        request_timeout_s=timeout_s,
                    )
                load_stats.append({
                    "lambda_rps": lam,
                    "offered_rps": ls.get("load", {}).get("offered_rps"),
                    "requests_per_sec": ls["requests_per_sec"],
                    "latency_p50_s": ls["latency_p50_s"],
                    "latency_p95_s": ls["latency_p95_s"],
                    "latency_from": "arrival",
                    "request_timeout_s": timeout_s,
                    "timeouts": ls.get("timeouts", 0),
                    "requests": ls["requests"],
                })
                print(f"serve load λ={lam}: {ls['requests_per_sec']} req/s "
                      f"p95={ls['latency_p95_s']} "
                      f"timeouts={ls.get('timeouts', 0)}",
                      file=__import__("sys").stderr, flush=True)
        except jax.errors.JaxRuntimeError as e:
            if "RESOURCE_EXHAUSTED" not in str(e):
                raise
            print("serve load leg ResourceExhausted; partial",
                  file=__import__("sys").stderr, flush=True)
            engine_holder.clear()
    if "engine" in engine_holder:
        engine_holder.pop("engine").close()
    rates = sorted(st["requests_per_sec"] for st in all_stats)
    # lower median (even counts happen when an OOM drops a repeat):
    # pick the conservative middle run, never the faster one
    median_rate = rates[(len(rates) - 1) // 2]
    stats = next(st for st in all_stats
                 if st["requests_per_sec"] == median_rate)
    result = {
        "profile": profile,
        **stats,
        "setup_s": round(setup_s, 1),
        "device": jax.devices()[0].device_kind,
    }
    result["runs_req_per_sec"] = [
        st["requests_per_sec"] for st in all_stats
    ]
    result["runs_latency_p95_s"] = [
        st.get("latency_p95_s") for st in all_stats
    ]
    if load_stats:
        result["load"] = load_stats
    cache = {}
    if os.path.exists(SERVE_CACHE_PATH):
        with open(SERVE_CACHE_PATH) as fp:
            cache = _json.load(fp)
    cache[profile] = result
    with open(SERVE_CACHE_PATH, "w") as fp:
        _json.dump(cache, fp, indent=1)
    return result


def cached_serve_results() -> dict | None:
    if os.path.exists(SERVE_CACHE_PATH):
        with open(SERVE_CACHE_PATH) as fp:
            cache = json.load(fp)
        return {k: {**v, "cached": True} for k, v in cache.items()}
    return None


def cpu_baseline(profile: str) -> float:
    """Cached CPU clips/sec for the same pipeline (0.0 when absent).

    The CPU measurement is expensive (a ~1B-parameter pipeline on one
    host core) so it is an explicit offline step —
    ``python bench.py --measure-cpu-baseline`` — whose result is
    committed in ``.bench_cpu_cache.json``; the routine benchmark run
    never blocks on it."""
    if os.path.exists(CACHE_PATH):
        with open(CACHE_PATH) as f:
            cache = json.load(f)
        if profile in cache:
            return cache[profile]
        if profile in ("full", "charades", "videollama") and "base" in cache:
            # A direct CPU run of the production stack is ~10 h/clip on
            # this 1-core host; scale the measured `base` CPU number by
            # the analytic FLOP ratio instead (marked estimated).
            from mraudio_tpu.config import AudioFrontendConfig
            from mraudio_tpu.utils.flops import pipeline_flops, videollama_flops

            base_m, base_d, _, _ = make_profile("base")
            prof_m, prof_d, _, _ = make_profile(profile)
            audio = AudioFrontendConfig()
            base_f = pipeline_flops(base_m, audio, base_d.n_frms, 1, 2500, 64)["total"]
            if profile == "videollama":
                prof_f = videollama_flops(
                    prof_m, audio, prof_d.n_frms, 1, 1148, 64
                )["total"]
            else:
                prof_f = pipeline_flops(prof_m, audio, prof_d.n_frms, 1, 5300, 64)["total"]
            return cache["base"] * base_f / prof_f
    return 0.0


def measure_cpu_baseline(profile: str) -> float:
    """Measure the profile's CPU clips/s on this host and cache it.

    For the production-size profiles ONE clip takes hours on this 1-core
    host (the ``base`` profile measured ~5 GFLOP/s effective), so the
    measurement is a single B=1 pass timed compile-inclusive (no separate
    warmup pass): the minutes-scale CPU compile biases the CPU rate LOW
    by ~1-3% — i.e. it slightly inflates ``vs_baseline``; noted in
    docs/BENCHMARKS.md.  Batch override via MRAUDIO_BENCH_BATCH (default
    1 for full-size profiles: the matmuls saturate one core at B=1, so
    per-clip rate is batch-flat there)."""
    import sys
    import jax

    jax.config.update("jax_platforms", "cpu")
    batch_env = os.environ.get("MRAUDIO_BENCH_BATCH")
    full_size = profile in ("full", "charades", "videollama")
    batch = int(batch_env) if batch_env else (1 if full_size else None)
    print(f"measuring CPU baseline for profile={profile} batch={batch} "
          "(single compile-inclusive pass; hours at full size)",
          file=sys.stderr, flush=True)
    t0 = time.time()
    result = run(profile, steps=1, batch_size=batch, warmup=not full_size)
    print(f"CPU baseline pass done in {time.time() - t0:.0f}s",
          file=sys.stderr, flush=True)
    cache = {}
    if os.path.exists(CACHE_PATH):
        with open(CACHE_PATH) as f:
            cache = json.load(f)
    cache[profile] = round(result["clips_per_sec"], 8)
    with open(CACHE_PATH, "w") as f:
        json.dump(cache, f)
    print(json.dumps({"profile": profile, "cpu_clips_per_sec": cache[profile]}))
    return cache[profile]


def main():
    import sys

    # Headline = the production-size stack (EVA-ViT-g + BEATs + dual
    # Q-Formers + int8 7B), not the mid-size "base" profile.
    profile = os.environ.get("MRAUDIO_BENCH_PROFILE", "full")
    steps_env = os.environ.get("MRAUDIO_BENCH_STEPS")
    steps = int(steps_env) if steps_env else None
    batch_env = os.environ.get("MRAUDIO_BENCH_BATCH")
    batch_size = int(batch_env) if batch_env else None

    if "--measure-cpu-baseline" in sys.argv:
        measure_cpu_baseline(profile)
        return

    import jax

    enable_compile_cache()
    if os.environ.get("MRAUDIO_BENCH_FORCE_CPU"):
        jax.config.update("jax_platforms", "cpu")

    if profile.startswith("train"):
        # training-throughput profile: its own JSON line + cache refresh
        result = run_train(profile, steps=steps, batch_size=batch_size)
        print(json.dumps({
            "metric": "train_sec_per_step", "value": result["sec_per_step"],
            "unit": "s/step", **result,
        }))
        return
    if profile.startswith("serve"):
        # serving-throughput profile: its own JSON line + cache refresh
        result = run_serve(profile)
        print(json.dumps({
            "metric": "serve_requests_per_sec",
            "value": result["requests_per_sec"],
            "unit": "req/s", **result,
        }))
        return

    device_kind = jax.devices()[0].device_kind
    # Runtime ResourceExhausted at the default batch is possible through
    # the tunnel (allocator state varies run to run near the 16 GB line);
    # fall back down a batch ladder rather than failing the benchmark —
    # the JSON reports the batch actually measured.
    ladders = {"full": [3, 2, 1], "charades": [8, 6, 4, 2],
               "videollama": [4, 2, 1]}
    ladder = [batch_size] if batch_size else ladders.get(profile, [None])
    # Median-of-N steady-state runs (VERDICT r3 #2): the tunnel's
    # dispatch latency swings ±25% run to run; the headline is the
    # median with every run's rate attached.
    runs = int(os.environ.get("MRAUDIO_BENCH_RUNS", "3"))
    result = None
    for attempt, b in enumerate(ladder):
        try:
            result = run(profile, steps=steps, batch_size=b, runs=runs)
            break
        except jax.errors.JaxRuntimeError as e:
            if "RESOURCE_EXHAUSTED" not in str(e) or b == ladder[-1]:
                raise
            import gc
            import sys

            print(f"batch={b} ResourceExhausted; retrying smaller",
                  file=sys.stderr)
            gc.collect()
    batch_fallback = attempt > 0

    payload = {
        "metric": "clips/sec/chip",
        "value": round(result["clips_per_sec"], 4),
        "unit": "clips/s",
        "runs": result["runs_clips_per_sec"],
        "profile": profile,
        "device": device_kind,
        "compile_time_s": round(result["compile_time_s"], 1),
        "setup_time_s": round(result["setup_time_s"], 1),
        "batch_size": result["batch_size"],
        "n_frms": result["n_frms"],
        "mfu": result["flops"]["mfu"],
        "flops_per_clip_T": result["flops"]["flops_per_clip_T"],
        "prefill_tokens": result["flops"]["prefill_tokens"],
    }
    if batch_fallback:
        payload["batch_fallback"] = True
    # Media-included pass (BASELINE metric = preprocess+encode+DECODE):
    # default-on for the headline profile; MRAUDIO_BENCH_MEDIA=0 skips.
    if (profile in ("full", "charades")
            and os.environ.get("MRAUDIO_BENCH_MEDIA", "1") == "1"
            and not os.environ.get("MRAUDIO_BENCH_FORCE_CPU")):
        try:
            payload.update(run_media_pass(
                result["_model"], result["_params"], result["_data_cfg"],
                result["batch_size"],
            ))
        except Exception as e:  # never fail the headline on the media leg
            payload["media_error"] = f"{type(e).__name__}: {e}"[:200]
    # Training throughput (VERDICT r2 #6): embedded from the offline-
    # refreshed cache so the routine run stays inside its time budget;
    # refresh with MRAUDIO_BENCH_PROFILE=train / train-tiny.
    train_cached = cached_train_results()
    if train_cached:
        payload["train"] = train_cached
    # Serving throughput: same offline-refreshed-cache pattern; refresh
    # with MRAUDIO_BENCH_PROFILE=serve / serve-tiny.
    serve_cached = cached_serve_results()
    if serve_cached:
        payload["serve"] = serve_cached
    if not os.environ.get("MRAUDIO_BENCH_FORCE_CPU"):
        baseline = cpu_baseline(profile)
        payload["cpu_clips_per_sec"] = round(baseline, 6)
        cache = {}
        if os.path.exists(CACHE_PATH):
            with open(CACHE_PATH) as f:
                cache = json.load(f)
        payload["cpu_baseline_estimated"] = profile not in cache
        payload["vs_baseline"] = (
            round(result["clips_per_sec"] / baseline, 2) if baseline else None
        )
    else:
        payload["vs_baseline"] = 1.0
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
