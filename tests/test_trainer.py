"""Trainer tests: schedule parity, trainable split, end-to-end tiny run,
checkpoint save/resume."""

import json
import math
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mraudio_tpu.config import (
    RunConfig,
    TrainConfig,
    tiny_data_config,
    tiny_model_config,
)
from mraudio_tpu.data.dataset import MRDataset
from mraudio_tpu.models.xinstructblip import XInstructBLIP
from mraudio_tpu.train.optim import (
    lavis_warmup_cosine_schedule,
    merge_params,
    split_trainable,
    trainable_mask,
)
from mraudio_tpu.train.trainer import Trainer


def _write_ann(tmp_path, name, n):
    path = str(tmp_path / name)
    with open(path, "w") as f:
        for i in range(n):
            f.write(json.dumps({
                "vid": f"v{i}", "qid": i, "query": f"action {i}",
                "duration": 150, "relevant_windows": [[5 * i % 100, 5 * i % 100 + 10]],
            }) + "\n")
    return path


def test_schedule_matches_lavis_semantics():
    cfg = TrainConfig(lr=3e-4, min_lr=0.0, warmup_steps=10, warmup_start_lr=1e-8,
                      max_epoch=4)
    sched = lavis_warmup_cosine_schedule(cfg, steps_per_epoch=20)
    # warmup: linear from 1e-8 over the first 10 steps of epoch 0
    assert float(sched(0)) == pytest.approx(1e-8)
    assert float(sched(5)) == pytest.approx(1e-8 + (3e-4 - 1e-8) * 5 / 10)
    # after warmup within epoch 0: cosine value at epoch 0 = peak
    assert float(sched(15)) == pytest.approx(3e-4)
    # epoch 2 of 4: cos(pi/2) → half
    assert float(sched(45)) == pytest.approx(0.5 * 3e-4, rel=1e-6)
    # final epoch: near zero
    assert float(sched(20 * 3 + 5)) == pytest.approx(
        0.5 * 3e-4 * (1 + math.cos(math.pi * 3 / 4)), rel=1e-6
    )


def test_split_trainable_lora_only():
    model = XInstructBLIP(tiny_model_config(), audio_cfg=tiny_data_config().audio)
    params = model.init_params(jax.random.PRNGKey(0))
    trainable, frozen = split_trainable(params)
    assert len(trainable) > 0
    assert all("lora" in "/".join(map(str, k)) for k in trainable)
    merged = merge_params(trainable, frozen)
    chex_equal = jax.tree_util.tree_all(
        jax.tree_util.tree_map(lambda a, b: (a == b).all(), merged, params)
    )
    assert chex_equal
    mask = trainable_mask(params)
    n_true = sum(jax.tree_util.tree_leaves(mask))
    assert n_true == len(trainable)


@pytest.fixture(scope="module")
def tiny_run(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("trainer")
    train_ann = _write_ann(tmp_path, "train.jsonl", 4)
    val_ann = _write_ann(tmp_path, "val.jsonl", 2)
    data_cfg = tiny_data_config(n_frms=4).replace(
        train_annotation_file=train_ann, val_annotation_file=val_ann
    )
    cfg = RunConfig(
        model=tiny_model_config(),
        data=data_cfg,
        train=TrainConfig(
            max_epoch=2, batch_size=2, warmup_steps=2, accum_grad_iters=2,
            output_dir=str(tmp_path / "out"), val_freq=1, save_freq=1,
        ),
    )
    return cfg


def test_trainer_end_to_end(tiny_run):
    trainer = Trainer(tiny_run)
    before = jax.tree_util.tree_map(np.asarray, trainer.trainable)
    summary = trainer.train()
    after = trainer.trainable
    # LoRA params actually moved
    moved = any(
        not np.allclose(np.asarray(after[k]), before[k]) for k in before
    )
    assert moved
    assert "best_epoch" in summary
    # validation produced metric dicts and checkpoints
    out = tiny_run.train.output_dir
    assert any(p.startswith("checkpoint_") for p in os.listdir(out))


def test_trainer_resume(tiny_run):
    out = tiny_run.train.output_dir
    ckpts = [
        p for p in os.listdir(out)
        if p.startswith("checkpoint_") and p != "checkpoint_best"
    ]
    assert ckpts
    resume_cfg = tiny_run.replace(
        train=tiny_run.train.replace(
            resume_ckpt_path=os.path.join(out, sorted(ckpts)[-1]),
            max_epoch=2,
        )
    )
    trainer = Trainer(resume_cfg)
    assert trainer.start_epoch >= 1


def test_trainer_int8_base(tmp_path):
    """LoRA training over an int8-quantized frozen base — the reference's
    actual configuration (LoRA over a bitsandbytes 8-bit Vicuna,
    ``models/xinstructblip.py:151,163``), and what ``cli/finetune.py``
    builds for ``--model-size full``: gradients must flow through the
    bf16 adapter branch beside the quantized matmul."""
    train_ann = _write_ann(tmp_path, "train.jsonl", 4)
    val_ann = _write_ann(tmp_path, "val.jsonl", 2)
    cfg = RunConfig(
        model=tiny_model_config(quantization="int8"),
        data=tiny_data_config(n_frms=4).replace(
            train_annotation_file=train_ann, val_annotation_file=val_ann
        ),
        train=TrainConfig(
            max_epoch=2, batch_size=2, warmup_steps=2, accum_grad_iters=1,
            output_dir=str(tmp_path / "out"), val_freq=2, save_freq=2,
        ),
    )
    trainer = Trainer(cfg)
    before = jax.tree_util.tree_map(np.asarray, trainer.trainable)
    trainer.train()
    moved = any(
        float(np.abs(np.asarray(trainer.trainable[k]) - before[k]).max()) > 1e-6
        for k in before
    )
    assert moved
