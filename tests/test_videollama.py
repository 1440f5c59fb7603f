"""VideoLLaMA backbone tests (tiny config, CPU)."""

import json

import numpy as np
import pytest

import jax

from mraudio_tpu.config import tiny_data_config
from mraudio_tpu.data.dataset import MRDataset, collate
from mraudio_tpu.models.videollama import VideoLLaMA, tiny_videollama_config


def _make_batch(tmp_path, n=2, n_frms=4):
    path = str(tmp_path / "ann.jsonl")
    with open(path, "w") as f:
        for i in range(n):
            f.write(json.dumps({
                "vid": f"v{i}", "qid": i, "query": f"action {i}",
                "duration": 150, "relevant_windows": [[5, 25]],
            }) + "\n")
    cfg = tiny_data_config(n_frms=n_frms)
    ds = MRDataset(cfg, annotation_path=path)
    return cfg, collate([ds.get(i) for i in range(n)], n)


@pytest.fixture(scope="module")
def model_and_params():
    cfg = tiny_videollama_config()
    model = VideoLLaMA(cfg, audio_cfg=tiny_data_config().audio)
    return model, model.init_params(jax.random.PRNGKey(0))


def test_generate_full_batch(tmp_path, model_and_params):
    """Unlike the reference wrapper (batch element 0 only,
    models/videollama.py:13-14), every row generates."""
    model, params = model_and_params
    _, batch = _make_batch(tmp_path)
    out = model.generate(params, batch)
    assert len(out) == 2 and all(isinstance(o, str) for o in out)
    assert model.generate(params, batch) == out


def test_loss_trains(tmp_path, model_and_params):
    """The reference's VideoLLaMA train path crashes (not an nn.Module);
    ours computes a finite loss with gradients."""
    model, params = model_and_params
    _, batch = _make_batch(tmp_path)
    loss = model.loss(params, batch)
    assert np.isfinite(float(loss))

    grads = jax.grad(lambda p: model.loss(p, batch))(params)
    conn = sum(
        float(np.abs(np.asarray(g)).sum())
        for g in jax.tree_util.tree_leaves(grads["connector"])
    )
    assert conn > 0


def test_connector_token_count(model_and_params):
    model, params = model_and_params
    cfg = model.cfg
    import jax.numpy as jnp

    b, t, p = 2, 4, cfg.vit.num_patches
    tokens = model.connector.apply(
        {"params": params["connector"]},
        jnp.zeros((b, t, p, cfg.vit.width)),
    )
    expected = (t // cfg.temporal_stride) * (p // cfg.spatial_pool ** 2)
    assert tokens.shape == (b, expected, cfg.llm.hidden_size)
