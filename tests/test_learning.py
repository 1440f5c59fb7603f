"""Sanity: the LoRA training path actually reduces the loss."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from mraudio_tpu.config import tiny_data_config, tiny_model_config
from mraudio_tpu.data.dataset import MRDataset, collate
from mraudio_tpu.models.xinstructblip import XInstructBLIP
from mraudio_tpu.train.optim import merge_params, split_trainable


def test_lora_overfits_single_batch(tmp_path):
    cfg = tiny_model_config()
    model = XInstructBLIP(cfg, audio_cfg=tiny_data_config().audio)
    params = model.init_params(jax.random.PRNGKey(0))

    path = str(tmp_path / "ann.jsonl")
    with open(path, "w") as f:
        for i in range(2):
            f.write(json.dumps({
                "vid": f"v{i}", "qid": i, "query": f"someone acts {i}",
                "duration": 150, "relevant_windows": [[12, 34]],
            }) + "\n")
    ds = MRDataset(tiny_data_config(n_frms=4), annotation_path=path)
    batch = collate([ds.get(i) for i in range(2)], 2)

    text = model.prepare_text(
        batch.text_input, np.asarray(batch.timestamps), batch.duration,
        text_output=batch.text_output,
    )
    arrays = (
        jnp.asarray(batch.video), jnp.asarray(batch.audio),
        jnp.asarray(text.qformer_ids), jnp.asarray(text.qformer_mask),
        jnp.asarray(text.ts_ids), jnp.asarray(text.ts_mask),
        jnp.asarray(text.dur_ids), jnp.asarray(text.dur_mask),
        jnp.asarray(text.concat_ids), jnp.asarray(text.concat_mask),
        jnp.asarray(text.labels),
    )

    trainable, frozen = split_trainable(params)
    tx = optax.adamw(1e-2)
    opt_state = tx.init(trainable)

    @jax.jit
    def step(trainable, opt_state):
        def loss_fn(tr):
            return model._loss_fn(merge_params(tr, frozen), *arrays, n_frms=4)

        loss, grads = jax.value_and_grad(loss_fn)(trainable)
        updates, opt_state = tx.update(grads, opt_state, trainable)
        return loss, optax.apply_updates(trainable, updates), opt_state

    losses = []
    for _ in range(40):
        loss, trainable, opt_state = step(trainable, opt_state)
        losses.append(float(loss))

    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.9, f"no learning: {losses[0]} -> {losses[-1]}"
