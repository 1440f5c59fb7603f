"""Saliency head: trains (BCE term + trainable pattern), reuses the
generate pass's encoder tokens, and lifts HL metrics above chance on a
synthetic task (round-1 VERDICT #9 / weak #4, #7).
"""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from mraudio_tpu.config import TrainConfig, tiny_data_config, tiny_model_config
from mraudio_tpu.data.dataset import Batch
from mraudio_tpu.eval.mr_eval import eval_submission
from mraudio_tpu.models.xinstructblip import XInstructBLIP
from mraudio_tpu.train.optim import merge_params, split_trainable


def _make_batch(b=2, t=4):
    """Frames 0,1 dark / 2,3 bright; relevant window covers the bright
    half — saliency labels are recoverable from pixels alone."""
    rng = np.random.default_rng(0)
    video = np.zeros((b, t, 28, 28, 3), np.uint8)
    video[:, :2] = rng.integers(0, 40, (b, 2, 28, 28, 3))
    video[:, 2:] = rng.integers(215, 255, (b, 2, 28, 28, 3))
    audio = rng.uniform(-1, 1, (b, 8000)).astype(np.float32)
    audio = np.clip(audio * 32767, -32768, 32767).astype(np.int16)
    stamps = np.tile(np.array([0, 2, 4, 6], np.int32), (b, 1))
    return Batch(
        video=video, audio=audio, timestamps=stamps,
        duration=[8] * b,
        text_input=["Query: bright scene\n"] * b,
        text_output=["[[4, 6]]"] * b,
        qid=list(range(b)), query=["bright scene"] * b, vid=[f"v{i}" for i in range(b)],
        valid=np.ones(b, bool),
    )


@pytest.fixture(scope="module")
def trained():
    cfg = tiny_model_config().replace(saliency_head=True)
    data_cfg = tiny_data_config(n_frms=4)
    model = XInstructBLIP(cfg, audio_cfg=data_cfg.audio)
    params = model.init_params(jax.random.PRNGKey(0))
    batch = _make_batch()

    assert "saliency_head" in params
    trainable, frozen = split_trainable(params, model.TRAINABLE_PATTERN)
    assert any("saliency_head" in "/".join(map(str, k)) for k in trainable)

    arrays = tuple(jnp.asarray(a) for a in model.loss_arrays(batch))
    assert len(arrays) == 12  # saliency labels appended

    tx = optax.adam(3e-3)
    opt_state = tx.init(trainable)

    @jax.jit
    def step(trainable, opt_state):
        def loss_fn(tr):
            return model._loss_fn(merge_params(tr, frozen), *arrays, n_frms=4)

        loss, grads = jax.value_and_grad(loss_fn)(trainable)
        updates, opt_state = tx.update(grads, opt_state, trainable)
        return loss, optax.apply_updates(trainable, updates), opt_state

    first = None
    for _ in range(60):
        loss, trainable, opt_state = step(trainable, opt_state)
        if first is None:
            first = float(loss)
    last = float(loss)
    return model, merge_params(trainable, frozen), batch, first, last


def test_saliency_loss_decreases(trained):
    _, _, _, first, last = trained
    assert last < first - 0.1, (first, last)


def test_saliency_separates_frames_and_reuses_generate_pass(trained):
    model, params, batch, _, _ = trained
    texts, saliency = model.generate(params, batch, return_saliency=True)
    assert len(texts) == 2 and saliency.shape == (2, 4)
    # bright (in-window) frames score above dark frames
    assert saliency[:, 2:].min() > saliency[:, :2].max()
    # fused output equals the standalone (re-encoding) path
    np.testing.assert_allclose(
        saliency, model.saliency_scores(params, batch), rtol=1e-4, atol=1e-5
    )


def test_hl_map_above_chance(trained):
    model, params, batch, _, _ = trained
    _, saliency = model.generate(params, batch, return_saliency=True)

    from mraudio_tpu.infer.evaluate import saliency_to_clip_grid

    records = []
    for i in range(2):
        pred = saliency_to_clip_grid(batch.timestamps[i], saliency[i], 8)
        records.append({
            "qid": i, "query": "bright scene", "vid": f"v{i}",
            "duration": 8,
            "relevant_windows": [[4, 6]],
            "pred_relevant_windows": [[4, 6]],
            "pred_saliency_scores": pred,
            "relevant_clip_ids": [2, 3],
            "saliency_scores": [[4, 4, 4], [4, 4, 4]],
        })
    metrics = eval_submission(records, records, verbose=False)
    brief = metrics["brief"]
    assert brief["HL-min-VeryGood-mAP"] > 60.0
    assert brief["HL-min-VeryGood-Hit1"] == 100.0


def test_trainer_val_loop_reports_hl_metrics(tmp_path, trained):
    """End-to-end: val loop attaches saliency and eval_submission emits
    HL keys when the annotations carry QVH saliency GT."""
    from mraudio_tpu.config import RunConfig
    from mraudio_tpu.data.dataset import MRDataset
    from mraudio_tpu.train.trainer import Trainer

    ann = str(tmp_path / "ann.jsonl")
    with open(ann, "w") as f:
        for i in range(2):
            f.write(json.dumps({
                "vid": f"v{i}", "qid": i, "query": "q", "duration": 8,
                "relevant_windows": [[4, 6]],
                "relevant_clip_ids": [2, 3],
                "saliency_scores": [[4, 4, 4], [3, 3, 3]],
            }) + "\n")
    cfg = RunConfig(
        model=tiny_model_config().replace(saliency_head=True),
        data=tiny_data_config(n_frms=4).replace(
            train_annotation_file=ann, val_annotation_file=ann
        ),
        train=TrainConfig(batch_size=2, max_epoch=1, accum_grad_iters=1,
                          output_dir=str(tmp_path / "out")),
    )
    trainer = Trainer(cfg)
    metrics = trainer.eval_epoch()
    assert "HL-min-VeryGood-mAP" in metrics["brief"]
