"""Failure detection: the train step's NaN/Inf loss guard.

A non-finite loss must (a) leave the trainable params bit-identical
(grads zeroed, update suppressed inside the jit), (b) be logged to the
run log, and (c) abort training after ``train.max_nan_skips``
consecutive occurrences instead of silently writing NaN checkpoints.
The reference's only counterpart is GradScaler's silent inf-step skip
(``utils/trainer.py:67``)."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mraudio_tpu.config import RunConfig, TrainConfig, tiny_data_config, tiny_model_config
from mraudio_tpu.train.trainer import Trainer


def _write_ann(tmp_path, name, n):
    path = str(tmp_path / name)
    with open(path, "w") as f:
        for i in range(n):
            f.write(json.dumps({
                "vid": f"v{i}", "qid": i, "query": f"action {i}",
                "duration": 150, "relevant_windows": [[5, 25]],
            }) + "\n")
    return path


def test_nan_guard_freezes_params_and_aborts(tmp_path):
    cfg = RunConfig(
        model=tiny_model_config(),
        data=tiny_data_config(n_frms=4).replace(
            train_annotation_file=_write_ann(tmp_path, "train.jsonl", 4),
            val_annotation_file=_write_ann(tmp_path, "val.jsonl", 2),
        ),
        train=TrainConfig(
            max_epoch=1, batch_size=2, accum_grad_iters=1, warmup_steps=2,
            output_dir=str(tmp_path / "out"), max_nan_skips=2,
        ),
    )
    trainer = Trainer(cfg)
    # Poison the frozen LLM weights: every forward's loss goes non-finite.
    for k in list(trainer.frozen):
        if k[0] == "llm":
            trainer.frozen[k] = jnp.full_like(trainer.frozen[k], jnp.inf)
    before = jax.tree_util.tree_map(np.asarray, trainer.trainable)

    with pytest.raises(RuntimeError, match="consecutive non-finite"):
        trainer.train_epoch(0)  # 2 steps -> max_nan_skips reached

    # the guard suppressed every update: trainable is bit-identical
    for k, v in before.items():
        np.testing.assert_array_equal(np.asarray(trainer.trainable[k]), v)

    events = [
        json.loads(line)
        for line in open(str(tmp_path / "out" / "train.jsonl"))
    ]
    skips = [e for e in events if e["event"] == "nan_skip"]
    assert len(skips) == 2
    assert skips[-1]["consecutive"] == 2
