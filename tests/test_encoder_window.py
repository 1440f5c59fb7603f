"""train.encoder_window: windowed encoder residency.

The frozen encoder subtree lives on host between windows; each window
uploads it, runs the encode program for W batches, deletes the device
copy, then runs the W LLM loss/grad steps with only the LLM resident —
the memory lever for full-size 7B LoRA training on one 16 GB chip
(docs/BENCHMARKS.md "Full-size training").  The transform must be
EXACT: the same split_encode_step programs consume the same inputs in
the same order, so trained params match the per-batch path bitwise.
"""

import json

import numpy as np
import pytest

import jax

from mraudio_tpu.config import (
    RunConfig,
    TrainConfig,
    tiny_data_config,
    tiny_model_config,
)
from mraudio_tpu.train.trainer import Trainer


def _write_ann(tmp_path, name, n):
    path = str(tmp_path / name)
    with open(path, "w") as f:
        for i in range(n):
            f.write(json.dumps({
                "vid": f"v{i}", "qid": i, "query": f"action {i}",
                "duration": 150,
                "relevant_windows": [[5 * i % 100, 5 * i % 100 + 10]],
            }) + "\n")
    return path


def _cfg(tmp_path, out_name, **train_kw):
    train_ann = _write_ann(tmp_path, "train.jsonl", 4)
    val_ann = _write_ann(tmp_path, "val.jsonl", 2)
    data_cfg = tiny_data_config(n_frms=4).replace(
        train_annotation_file=train_ann, val_annotation_file=val_ann
    )
    kw = dict(
        max_epoch=1, batch_size=1, warmup_steps=2, accum_grad_iters=1,
        output_dir=str(tmp_path / out_name), val_freq=5, save_freq=5,
        split_encode_step=True,
    )
    kw.update(train_kw)
    return RunConfig(
        model=tiny_model_config(), data=data_cfg, train=TrainConfig(**kw)
    )


@pytest.mark.parametrize("accum", [1, 2])
def test_encoder_window_matches_per_batch_split(tmp_path, accum):
    """One epoch with encoder_window=2 produces bitwise-identical
    trainable params and losses to the per-batch split path — including
    under gradient accumulation (the reference's accum=2), where the
    optimizer only applies every second micro-step."""
    losses = {}

    def run(window):
        cfg = _cfg(tmp_path, f"out_w{window}_a{accum}",
                   encoder_window=window, accum_grad_iters=accum)
        trainer = Trainer(cfg)
        trainer.train_epoch(0)
        # collect the run log's per-step losses
        log = [
            json.loads(line)
            for line in open(trainer.runlog.path)
            if '"train_step"' in line
        ]
        losses[window] = [r["loss"] for r in log]
        return jax.tree_util.tree_map(np.asarray, trainer.trainable)

    base = run(0)
    windowed = run(2)
    assert losses[0] == losses[2]
    for k in base:
        np.testing.assert_array_equal(base[k], windowed[k])


def test_encoder_window_frees_device_encoders(tmp_path):
    """Between windows the encoder subtree is host numpy, and the
    training epoch still runs (device copies are uploaded per window
    and deleted afterwards)."""
    cfg = _cfg(tmp_path, "out_free", encoder_window=2)
    trainer = Trainer(cfg)
    enc_keys = trainer.model.ENCODER_PARAM_KEYS
    enc_leaves = [v for k, v in trainer.frozen.items() if k[0] in enc_keys]
    assert enc_leaves and all(isinstance(v, np.ndarray) for v in enc_leaves)
    trainer.train_epoch(0)
    # still host-resident after the epoch
    assert all(
        isinstance(v, np.ndarray)
        for k, v in trainer.frozen.items() if k[0] in enc_keys
    )
    # eval path re-uploads on demand
    metrics = trainer.eval_epoch()
    assert "brief" in metrics


def test_upload_overlap_bitwise_and_cleanup(tmp_path):
    """train.upload_overlap double-buffers the next window's encoder
    transfers; results must be bitwise-identical to the serialized
    path (same transfers + same unpack, different timing) and no staged
    buffer may survive the epoch."""
    results = {}
    for overlap in (False, True):
        cfg = _cfg(tmp_path, f"out_ov{int(overlap)}", encoder_window=2,
                   upload_overlap=overlap)
        trainer = Trainer(cfg)
        assert trainer._overlap_ok is overlap
        trainer.train_epoch(0)
        assert trainer._staged_enc is None  # consumed or freed
        results[overlap] = jax.tree_util.tree_map(
            np.asarray, trainer.trainable
        )
    for k in results[False]:
        np.testing.assert_array_equal(results[False][k], results[True][k])


def test_encoder_window_requires_split(tmp_path):
    cfg = _cfg(tmp_path, "out_err", encoder_window=2,
               split_encode_step=False)
    with pytest.raises(ValueError, match="split_encode_step"):
        Trainer(cfg)
