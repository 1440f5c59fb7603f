"""Quality gate for the ``evaluate --fast`` preset (config.apply_fast_preset).

The preset stacks the measured throughput levers: temporal-residual ViT
(an approximation), yuv420 wire (lossless vs a 4:2:0 source), and
grammar-constrained decoding (output always parses).  The gate runs
exact-vs-fast submissions from a task-solving synthetic model through
the REAL scorer (``eval_submission``) and bounds the metric delta — the
A/B harness the preset's one-flag surface is contractually tied to.
"""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from mraudio_tpu.config import (
    RunConfig,
    apply_fast_preset,
    tiny_data_config,
    tiny_model_config,
)
from mraudio_tpu.data.dataset import MRDataset, collate
from mraudio_tpu.eval.mr_eval import eval_submission
from mraudio_tpu.models.xinstructblip import XInstructBLIP
from mraudio_tpu.text.postprocess import moment_str_to_list, post_process

TARGET = [[12, 34]]


def _records(model, params, batch):
    texts = model.generate(params, batch)
    return [
        {
            "qid": qid,
            "relevant_windows": TARGET,
            "pred_relevant_windows": moment_str_to_list(post_process(t)),
        }
        for qid, t in zip(batch.qid, texts)
    ]


def _score(records):
    return eval_submission(records, records, verbose=False)["brief"]


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    """Tiny model trained until generate emits the exact target span
    (the test_approx_quality.py recipe)."""
    cfg = tiny_model_config().replace(max_new_tokens=16)
    model = XInstructBLIP(cfg, audio_cfg=tiny_data_config().audio)
    params = model.init_params(jax.random.PRNGKey(0))
    tok = model.llm_tokenizer

    path = str(tmp_path_factory.mktemp("fastq") / "ann.jsonl")
    with open(path, "w") as f:
        for i in range(2):
            f.write(json.dumps({
                "vid": f"v{i}", "qid": i, "query": f"someone acts {i}",
                "duration": 150, "relevant_windows": TARGET,
            }) + "\n")
    ds = MRDataset(tiny_data_config(n_frms=4), annotation_path=path)
    batch = collate([ds.get(i) for i in range(2)], 2)
    text = model.prepare_text(
        batch.text_input, np.asarray(batch.timestamps), batch.duration,
        text_output=batch.text_output,
    )

    b, total = 2, cfg.max_txt_len + cfg.max_output_txt_len
    concat_ids = np.full((b, total), tok.pad_token_id, np.int32)
    concat_mask = np.zeros((b, total), np.int32)
    labels = np.full((b, total), -100, np.int32)
    for i, (inp, out) in enumerate(zip(batch.text_input, batch.text_output)):
        in_ids = tok.encode(inp.strip(), add_special_tokens=False)[-cfg.max_txt_len:]
        out_ids = tok.encode(out, add_special_tokens=False) + [tok.eos_token_id]
        seq = (in_ids + out_ids)[:total]
        concat_ids[i, :len(seq)] = seq
        concat_mask[i, :len(seq)] = 1
        labels[i, :len(seq)] = seq
        labels[i, :len(in_ids)] = -100

    arrays = (
        jnp.asarray(batch.video), jnp.asarray(batch.audio),
        jnp.asarray(text.qformer_ids), jnp.asarray(text.qformer_mask),
        jnp.asarray(text.ts_ids), jnp.asarray(text.ts_mask),
        jnp.asarray(text.dur_ids), jnp.asarray(text.dur_mask),
        jnp.asarray(concat_ids), jnp.asarray(concat_mask), jnp.asarray(labels),
    )
    trainable = {"llm": params["llm"]}
    frozen = {k: v for k, v in params.items() if k != "llm"}
    tx = optax.adamw(5e-3)
    opt_state = tx.init(trainable)

    @jax.jit
    def step(trainable, opt_state):
        def loss_fn(tr):
            return model._loss_fn({**frozen, **tr}, *arrays, n_frms=4)

        loss, grads = jax.value_and_grad(loss_fn)(trainable)
        updates, opt_state = tx.update(grads, opt_state, trainable)
        return loss, optax.apply_updates(trainable, updates), opt_state

    exact = False
    for i in range(1, 151):
        loss, trainable, opt_state = step(trainable, opt_state)
        if i % 25 == 0:
            merged = {**frozen, **trainable}
            recs = _records(model, merged, batch)
            if all(r["pred_relevant_windows"] == TARGET for r in recs):
                exact = True
                break
    assert exact, f"never reached exact span output (loss {float(loss):.4f})"
    return cfg, {**frozen, **trainable}, batch, ds


def _fast_cfg(model_cfg, residual=True):
    run = apply_fast_preset(RunConfig(model=model_cfg, data=tiny_data_config(n_frms=4)))
    m = run.model
    if residual:
        # tiny ViT has 4 patches; the production R=64 must clamp down
        m = m.replace(vit=m.vit.replace(keyframe_interval=2, residual_tokens=2))
    else:
        m = m.replace(vit=m.vit.replace(keyframe_interval=1, residual_tokens=0))
    return run.replace(model=m)


def test_grammar_lever_keeps_spans_identical(trained):
    """Grammar-constrained decoding alone must keep the learned spans
    EXACTLY: it only masks illegal tokens, and the trained model's
    greedy tokens are legal.  (yuv420 is NOT exactness-class on
    RGB-synthetic test content — the chroma subsample only becomes
    lossless against real 4:2:0 sources — so it is gated with the
    bounded-delta test below, not here.)"""
    cfg, params, batch, _ = trained
    exact = _score(_records(XInstructBLIP(
        cfg, audio_cfg=tiny_data_config().audio), params, batch))
    gcfg = cfg.replace(constrained_decoding=True, spec_width=4)
    fast = _score(_records(
        XInstructBLIP(gcfg, audio_cfg=tiny_data_config().audio), params, batch))
    assert exact["MR-full-R1@0.5"] == 100.0  # QVH metrics are percentages
    assert fast["MR-full-R1@0.5"] == exact["MR-full-R1@0.5"]
    assert fast["MR-full-mIoU"] == exact["MR-full-mIoU"]
    assert fast["MR-full-invalid_pred_num"] == 0


def test_fast_full_preset_bounded_metric_delta(trained):
    """The FULL preset (with the temporal-residual ViT approximation):
    scored metric delta vs exact is bounded, and the grammar guarantees
    zero invalid predictions regardless."""
    cfg, params, batch, _ = trained
    exact = _score(_records(XInstructBLIP(
        cfg, audio_cfg=tiny_data_config().audio), params, batch))
    run = _fast_cfg(cfg, residual=True)
    fast_model = XInstructBLIP(run.model, audio_cfg=tiny_data_config().audio)
    fast = _score(_records(fast_model, params, batch))
    assert fast["MR-full-invalid_pred_num"] == 0
    # The tiny 2-patch residual encoder is a far harsher approximation
    # than the production 64-of-256; the gate bounds the collapse.
    assert fast["MR-full-R1@0.5"] >= exact["MR-full-R1@0.5"] - 50.0
    assert fast["MR-full-mIoU"] >= exact["MR-full-mIoU"] - 50.0


def test_fast_preset_production_values():
    """The one-flag surface applies exactly the measured stacked config."""
    run = apply_fast_preset(RunConfig())
    assert run.model.vit.keyframe_interval == 4
    assert run.model.vit.residual_tokens == 64
    assert run.model.constrained_decoding is True
    assert run.model.video_wire == "yuv420"
    assert run.data.video_wire == "yuv420"
