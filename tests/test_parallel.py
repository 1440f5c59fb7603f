"""Sharding tests on the virtual 8-device CPU mesh (v5e-8 shaped)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from mraudio_tpu.config import MeshConfig, tiny_data_config, tiny_model_config
from mraudio_tpu.models.xinstructblip import XInstructBLIP
from mraudio_tpu.parallel import batch_sharding, make_mesh, param_shardings, shard_params


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_make_mesh_shapes():
    mesh = make_mesh(MeshConfig(data=2, model=4))
    assert mesh.shape == {"data": 2, "model": 4}
    mesh = make_mesh()
    assert mesh.shape == {"data": 8, "model": 1}
    with pytest.raises(ValueError):
        make_mesh(MeshConfig(data=4, model=4))


def test_llm_partition_rules():
    model = XInstructBLIP(tiny_model_config(), audio_cfg=tiny_data_config().audio)
    params = model.init_params(jax.random.PRNGKey(0))
    mesh = make_mesh(MeshConfig(data=2, model=4))
    shardings = param_shardings(params, mesh)

    def spec_of(*path_parts):
        node = shardings
        for p in path_parts:
            node = node[p]
        return node.spec

    assert spec_of("llm", "layer_0", "attn", "q_proj", "kernel") == P(None, "model")
    assert spec_of("llm", "layer_0", "attn", "o_proj", "kernel") == P("model", None)
    assert spec_of("llm", "layer_0", "mlp", "down_proj", "kernel") == P("model", None)
    assert spec_of("llm", "layer_0", "attn", "q_proj", "lora_b") == P(None, "model")
    assert spec_of("llm", "lm_head", "kernel") == P(None, "model")
    # frozen encoders: FSDP over the data axis (round 5) — the largest
    # evenly-tiling dim carries "data"; fsdp_encoders=False restores
    # full replication
    vit_q = spec_of("vit", "block_0", "attn", "q", "kernel")
    assert "data" in [a for a in vit_q if a is not None]
    assert "model" not in [a for a in vit_q if a is not None]
    repl = param_shardings(params, mesh, fsdp_encoders=False)
    assert repl["vit"]["block_0"]["attn"]["q"]["kernel"].spec == P()


def test_sharded_generate_matches_single_device(tmp_path):
    """The full generate pipeline must produce identical tokens under a
    2x4 (dp x tp) mesh and on a single device."""
    import json

    from mraudio_tpu.data.dataset import MRDataset, collate

    path = str(tmp_path / "ann.jsonl")
    with open(path, "w") as f:
        for i in range(2):
            f.write(json.dumps({
                "vid": f"v{i}", "qid": i, "query": f"thing {i}",
                "duration": 150, "relevant_windows": [[5, 20]],
            }) + "\n")
    data_cfg = tiny_data_config(n_frms=4)
    ds = MRDataset(data_cfg, annotation_path=path)
    batch = collate([ds.get(i) for i in range(2)], 2)

    model = XInstructBLIP(tiny_model_config(), audio_cfg=data_cfg.audio)
    params = model.init_params(jax.random.PRNGKey(0))
    out_single = model.generate(params, batch)

    mesh = make_mesh(MeshConfig(data=2, model=4))
    with jax.set_mesh(mesh):
        sharded = shard_params(params, mesh)
        out_sharded = model.generate(sharded, batch)
    assert out_single == out_sharded


def test_sharded_loss_matches_single_device(tmp_path):
    import json

    from mraudio_tpu.data.dataset import MRDataset, collate

    path = str(tmp_path / "ann.jsonl")
    with open(path, "w") as f:
        for i in range(2):
            f.write(json.dumps({
                "vid": f"v{i}", "qid": i, "query": f"thing {i}",
                "duration": 150, "relevant_windows": [[5, 20]],
            }) + "\n")
    data_cfg = tiny_data_config(n_frms=4)
    ds = MRDataset(data_cfg, annotation_path=path)
    batch = collate([ds.get(i) for i in range(2)], 2)

    model = XInstructBLIP(tiny_model_config(), audio_cfg=data_cfg.audio)
    params = model.init_params(jax.random.PRNGKey(0))
    loss_single = float(model.loss(params, batch))

    mesh = make_mesh(MeshConfig(data=2, model=4))
    with jax.set_mesh(mesh):
        sharded = shard_params(params, mesh)
        loss_sharded = float(model.loss(sharded, batch))
    assert loss_single == pytest.approx(loss_sharded, rel=2e-2)


def test_trainer_on_mesh(tmp_path):
    """Trainer trains with TP+DP sharded params on the virtual mesh."""
    import json

    from mraudio_tpu.config import RunConfig, TrainConfig
    from mraudio_tpu.train.trainer import Trainer

    ann = str(tmp_path / "ann.jsonl")
    with open(ann, "w") as f:
        for i in range(4):
            f.write(json.dumps({
                "vid": f"v{i}", "qid": i, "query": f"act {i}",
                "duration": 150, "relevant_windows": [[5, 25]],
            }) + "\n")
    cfg = RunConfig(
        model=tiny_model_config(),
        data=tiny_data_config(n_frms=4).replace(
            train_annotation_file=ann, val_annotation_file=ann
        ),
        train=TrainConfig(max_epoch=1, batch_size=2, warmup_steps=2,
                          accum_grad_iters=1, output_dir=str(tmp_path / "out"),
                          val_freq=1, save_freq=0),
        mesh=MeshConfig(data=2, model=4),
    )
    trainer = Trainer(cfg)
    assert trainer.mesh is not None
    summary = trainer.train()
    assert "best_epoch" in summary


def test_run_inference_on_mesh(tmp_path):
    import json

    from mraudio_tpu.config import RunConfig
    from mraudio_tpu.infer.evaluate import run_inference

    anns = [{"vid": f"v{i}", "qid": i, "query": f"q{i}", "duration": 150,
             "relevant_windows": [[5, 25]]} for i in range(4)]
    cfg = RunConfig(
        model=tiny_model_config(),
        data=tiny_data_config(n_frms=4),
        mesh=MeshConfig(data=2, model=4),
    )
    result = run_inference(cfg, annotations=anns, batch_size=2)
    assert len(result["records"]) == 4
