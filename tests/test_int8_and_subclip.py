"""int8-quantized LLM path + sub-clip dataset handling."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mraudio_tpu.config import tiny_data_config, tiny_model_config
from mraudio_tpu.data.dataset import MRDataset, collate
from mraudio_tpu.models.convert_weights import convert_llama_hf, quantize_llama_int8
from mraudio_tpu.models.llama import LlamaModel
from mraudio_tpu.models.layers import positions_from_mask
from mraudio_tpu.models.xinstructblip import XInstructBLIP


def test_int8_generate_runs(tmp_path):
    cfg = tiny_model_config(quantization="int8")
    model = XInstructBLIP(cfg, audio_cfg=tiny_data_config().audio)
    params = model.init_params(jax.random.PRNGKey(0))

    path = str(tmp_path / "ann.jsonl")
    with open(path, "w") as f:
        f.write(json.dumps({
            "vid": "v0", "qid": 0, "query": "something",
            "duration": 150, "relevant_windows": [[5, 20]],
        }) + "\n")
    ds = MRDataset(tiny_data_config(n_frms=4), annotation_path=path)
    batch = collate([ds.get(0)], 1)
    out = model.generate(params, batch)
    assert len(out) == 1


def test_int8_quantized_forward_close_to_float():
    """Quantize a random float Llama; logits should stay close."""
    cfg = tiny_model_config().llm.replace(dtype="float32")
    model_f = LlamaModel(cfg, None)
    b, s = 1, 6
    x = jax.random.normal(jax.random.PRNGKey(0), (b, s, cfg.hidden_size)) * 0.1
    mask01 = jnp.ones((b, s), jnp.int32)
    attend = jnp.tril(jnp.ones((s, s), bool))[None, None] & mask01[:, None, None, :].astype(bool)
    pos = positions_from_mask(mask01)
    params = model_f.init(jax.random.PRNGKey(1), x, attend, pos)["params"]
    logits_f, _ = model_f.apply({"params": params}, x, attend, pos)

    q_params = quantize_llama_int8(jax.tree_util.tree_map(np.asarray, params))
    model_q = LlamaModel(cfg.replace(quantization="int8"), None)
    logits_q, _ = model_q.apply({"params": q_params}, x, attend, pos)

    # int8 weight error ~0.4%; logits agree to a few percent relative
    f, qq = np.asarray(logits_f), np.asarray(logits_q)
    denom = np.abs(f).max()
    assert np.abs(f - qq).max() / denom < 0.1


def test_subclip_annotation_uses_window(tmp_path):
    from mraudio_tpu.data.video import SyntheticVideoSource

    cfg = tiny_data_config(n_frms=4)
    path = str(tmp_path / "ann.jsonl")
    with open(path, "w") as f:
        f.write(json.dumps({
            "vid": "v0", "qid": 0, "query": "q", "duration": 10,
            "relevant_windows": [[1, 4]], "start": 2.0, "end": 6.0,
        }) + "\n")

    captured = {}

    class SpySource(SyntheticVideoSource):
        def get_batch(self, path, indices, h, w, start=None, end=None):
            captured["start"], captured["end"] = start, end
            captured["indices"] = np.asarray(indices)
            return super().get_batch(path, indices, h, w)

    ds = MRDataset(cfg, annotation_path=path, video_source=SpySource(vlen=300, fps=25.0))
    sample = ds.get(0)
    assert captured["start"] == 2.0 and captured["end"] == 6.0
    # indices sampled within the 4s * 25fps = 100-frame sub-clip
    assert (captured["indices"] < 100).all()
    # timestamps relative to the clip origin
    assert sample.timestamps.max() <= 4


def test_inference_cast_is_output_identical(tmp_path):
    """Pre-casting weights to bf16 must be bit-identical to the per-matmul
    cast (the matmuls consumed bf16 either way)."""
    from mraudio_tpu.models.casting import cast_params_for_inference

    cfg = tiny_model_config()
    model = XInstructBLIP(cfg, audio_cfg=tiny_data_config().audio)
    params = model.init_params(jax.random.PRNGKey(0))

    path = str(tmp_path / "ann.jsonl")
    with open(path, "w") as f:
        f.write(json.dumps({
            "vid": "v0", "qid": 0, "query": "things happen",
            "duration": 150, "relevant_windows": [[5, 20]],
        }) + "\n")
    ds = MRDataset(tiny_data_config(n_frms=4), annotation_path=path)
    batch = collate([ds.get(0)], 1)

    out_fp32 = model.generate(params, batch)
    out_bf16 = model.generate(cast_params_for_inference(params), batch)
    assert out_fp32 == out_bf16
