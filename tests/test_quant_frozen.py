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


def test_eval_quant_encoders_generate(tmp_path, monkeypatch):
    """RunConfig.quant_encoders: the eval graph consumes int8-stored
    encoder subtrees (dequant fused inside _encode_modality_tokens) and
    still produces well-formed records end-to-end.  Tiny kernels sit
    under the production eligibility floor, so the floor is lowered to
    force real quantized leaves through the jitted graph."""
    from mraudio_tpu.infer.evaluate import run_inference
    from mraudio_tpu.models import quant_tree
    from mraudio_tpu.models.quant_tree import QKEY, quantize_subtrees

    monkeypatch.setattr(quant_tree, "MIN_SIZE", 128)
    monkeypatch.setattr(quant_tree, "MIN_DIM0", 2)

    cfg = RunConfig(
        model=tiny_model_config(), data=tiny_data_config(n_frms=4),
        quant_encoders=True,
    )
    model = XInstructBLIP(cfg.model, audio_cfg=cfg.data.audio)
    params = model.init_params(jax.random.PRNGKey(0))
    # structure check: quantize_subtrees actually rewrote encoder kernels
    q = quantize_subtrees(params, model.ENCODER_PARAM_KEYS)
    flat = traverse_util.flatten_dict(q["vit"])
    assert any(p[-1] == QKEY for p in flat)
    # llm subtree untouched
    assert q["llm"] is params["llm"]

    anns = [
        {"vid": f"v{i}", "qid": i, "query": "a person waves",
         "duration": 60, "relevant_windows": [[5, 12]]}
        for i in range(2)
    ]
    result = run_inference(
        cfg, model=model, params=params, annotations=anns,
        batch_size=2, num_workers=0,
    )
    assert len(result["records"]) == 2
    for r in result["records"]:
        assert "pred_relevant_windows" in r


def test_quantize_subtrees_roundtrip_close():
    """dequantize(quantize(w)) is within the absmax/127 grid error."""
    from mraudio_tpu.models.quant_tree import (
        dequantize_subtrees, quantize_subtrees,
    )

    rng = np.random.default_rng(0)
    w = rng.standard_normal((64, 1024)).astype(np.float32)
    tree = {"vit": {"block": {"mlp": {"kernel": jnp.asarray(w)}}}}
    q = quantize_subtrees(tree, ("vit",))
    back = dequantize_subtrees(q, ("vit",), dtype=jnp.float32)
    got = np.asarray(back["vit"]["block"]["mlp"]["kernel"])
    step = np.abs(w).max(axis=0, keepdims=True) / 127.0
    assert np.all(np.abs(got - w) <= step * 0.51 + 1e-6)
    # non-quantized tree passes through dequantize_subtrees untouched
    plain = dequantize_subtrees(tree, ("vit",))
    assert plain["vit"]["block"]["mlp"]["kernel"] is tree["vit"]["block"]["mlp"]["kernel"]
