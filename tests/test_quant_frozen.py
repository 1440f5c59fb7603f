"""Frozen-subtree int8 compression (models/quant_tree.py).

The reference trains LoRA over an 8-bit base (models/xinstructblip.py:151)
but keeps encoders fp16; `train.quant_frozen="int8"` extends int8 storage
to the frozen encoder kernels.  Tests: key/eligibility rules, round-trip
idempotency, and trainer-level exactness — with weights on the int8 grid
(so quantization is lossless) training with quant_frozen on and off must
follow the same trajectory.
"""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import traverse_util

from mraudio_tpu.config import RunConfig, TrainConfig, tiny_data_config, tiny_model_config
from mraudio_tpu.models import quant_tree
from mraudio_tpu.models.quant_tree import dequantize_frozen, quantize_frozen
from mraudio_tpu.models.xinstructblip import XInstructBLIP
from mraudio_tpu.train.trainer import Trainer


def test_eligibility_and_keys():
    flat = {
        ("vit", "block_0", "mlp", "fc1", "kernel"): jnp.ones((64, 1200), jnp.float32),
        ("vit", "block_0", "mlp", "fc1", "bias"): jnp.ones((1200,), jnp.float32),
        ("llm", "lm_head", "kernel"): jnp.ones((64, 1200), jnp.float32),
        ("llm", "layer_0", "q", "w_int8"): jnp.ones((64, 1200), jnp.int8),
        ("vit", "norm", "scale"): jnp.ones((64,), jnp.float32),
        ("small", "kernel"): jnp.ones((4, 8), jnp.float32),
    }
    q = quantize_frozen(flat)
    # only the big float non-lm_head kernel got split into q/scale keys
    assert ("vit", "block_0", "mlp", "fc1", "kernel", "int8") in q
    assert ("vit", "block_0", "mlp", "fc1", "kernel", "scale") in q
    assert ("vit", "block_0", "mlp", "fc1", "kernel") not in q
    for k in flat:
        if k[-1] != "kernel" or "lm_head" in k or k == ("small", "kernel"):
            assert k in q and q[k] is flat[k]
    assert q[("llm", "lm_head", "kernel")] is flat[("llm", "lm_head", "kernel")]
    # dequantize restores every original key; non-quantized pass through
    dq = dequantize_frozen(q)
    assert set(dq) == set(flat)
    assert dq[("vit", "block_0", "mlp", "fc1", "kernel")].dtype == jnp.bfloat16


def test_roundtrip_idempotent_and_exact_on_grid():
    rng = np.random.default_rng(0)
    # values on the int8 grid with per-column absmax pinned to 127*2^-7:
    # quantization must be lossless (scale = 2^-7 exactly)
    ints = rng.integers(-127, 128, size=(64, 1024)).astype(np.float32)
    ints[0, :] = 127.0
    w = jnp.asarray(ints * 2.0**-7)
    flat = {("m", "kernel"): w}
    q = quantize_frozen(flat)
    assert q[("m", "kernel", "int8")].dtype == jnp.int8
    np.testing.assert_array_equal(np.asarray(q[("m", "kernel", "int8")]), ints)
    dq = dequantize_frozen(q, dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(dq[("m", "kernel")]), np.asarray(w))
    # idempotent: re-quantizing the dequantized tree gives identical codes
    q2 = quantize_frozen(dq)
    np.testing.assert_array_equal(
        np.asarray(q2[("m", "kernel", "int8")]),
        np.asarray(q[("m", "kernel", "int8")]),
    )


def _write_ann(tmp_path, name, n):
    path = str(tmp_path / name)
    with open(path, "w") as f:
        for i in range(n):
            f.write(json.dumps({
                "vid": f"v{i}", "qid": i, "query": f"action {i}",
                "duration": 150, "relevant_windows": [[5 * i, 5 * i + 10]],
            }) + "\n")
    return path


def _grid_params(model, seed=0):
    """init_params with every quant-eligible kernel snapped to the int8
    grid (absmax per output channel pinned), so quantization is exact."""
    params = model.init_params(jax.random.PRNGKey(seed))
    flat = traverse_util.flatten_dict(params)
    rng = np.random.default_rng(seed)
    for k, v in flat.items():
        if quant_tree._eligible(k, v):
            ints = rng.integers(-127, 128, size=v.shape).astype(np.float32)
            ints[0, ...] = 127.0
            flat[k] = jnp.asarray(ints * 2.0**-7, dtype=v.dtype)
    return traverse_util.unflatten_dict(flat)


@pytest.mark.parametrize("split", [True, False])
def test_trainer_quant_frozen_matches_unquantized(tmp_path, monkeypatch, split):
    """With grid weights, quant_frozen="int8" must train identically to
    the unquantized run (both split and fused step programs)."""
    # tiny-model kernels are below the production thresholds; lower them
    # so the test actually quantizes every kernel
    monkeypatch.setattr(quant_tree, "MIN_SIZE", 0)
    monkeypatch.setattr(quant_tree, "MIN_DIM0", 2)

    train_ann = _write_ann(tmp_path, "train.jsonl", 4)
    val_ann = _write_ann(tmp_path, "val.jsonl", 2)
    data_cfg = tiny_data_config(n_frms=4).replace(
        train_annotation_file=train_ann, val_annotation_file=val_ann
    )
    model = XInstructBLIP(tiny_model_config(), audio_cfg=data_cfg.audio)

    def run(quant):
        cfg = RunConfig(
            model=tiny_model_config(),
            data=data_cfg,
            train=TrainConfig(
                max_epoch=1, batch_size=2, warmup_steps=2, accum_grad_iters=1,
                output_dir=str(tmp_path / f"out_{quant}_{split}"),
                val_freq=5, save_freq=5, quant_frozen=quant,
                split_encode_step=split,
            ),
        )
        trainer = Trainer(cfg, model=model, params=_grid_params(model))
        if quant == "int8":
            # the frozen dict must actually hold int8 leaves
            assert any(k[-1] == "int8" for k in trainer.frozen)
        trainer.train()
        return jax.tree_util.tree_map(np.asarray, trainer.trainable)

    base = run("none")
    quant = run("int8")
    assert set(base) == set(quant)
    for k in base:
        np.testing.assert_allclose(
            quant[k], base[k], rtol=1e-5, atol=1e-7,
            err_msg=f"trainable {k} diverged under quant_frozen",
        )
