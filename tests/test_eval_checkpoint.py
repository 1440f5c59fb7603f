"""`--checkpoint` on the eval/serve CLIs: load a trained orbax
checkpoint (the trainable subtree finetune saves) over the assembled
params — the reference's finetuned `--model-path` semantics
(`/root/reference/evaluate.py:22` loads checkpoint_best.pth through
`XInstructBLIP.load_state_dict`, `models/xinstructblip.py:769-816`).
"""

import json

import numpy as np

from mraudio_tpu.config import (
    RunConfig,
    TrainConfig,
    tiny_data_config,
    tiny_model_config,
)
from mraudio_tpu.train.trainer import Trainer


def _ann_file(tmp_path, name, n):
    path = str(tmp_path / name)
    with open(path, "w") as f:
        for i in range(n):
            f.write(json.dumps({
                "vid": f"v{i}", "qid": i, "query": f"action {i}",
                "duration": 150, "relevant_windows": [[10, 30]],
            }) + "\n")
    return path


def test_eval_cli_loads_trained_checkpoint(tmp_path):
    ann = _ann_file(tmp_path, "ann.jsonl", 2)
    out_dir = str(tmp_path / "train_out")
    cfg = RunConfig(
        model=tiny_model_config(),
        data=tiny_data_config(n_frms=4).replace(
            train_annotation_file=ann, val_annotation_file=ann
        ),
        train=TrainConfig(max_epoch=1, batch_size=1, warmup_steps=2,
                          output_dir=out_dir, val_freq=5, save_freq=1,
                          num_workers=1),
    )
    trainer = Trainer(cfg)
    trainer.train_epoch(0)
    trainer._save_checkpoint(0, is_best=False)
    ckpt_dir = str(tmp_path / "train_out" / "checkpoint_0")

    # unit level: the overlay lands the trained leaves in the param tree
    from flax import traverse_util

    from mraudio_tpu.models.convert_weights import load_pretrained_params
    from mraudio_tpu.train.checkpoint import apply_trainable, load_checkpoint

    payload = load_checkpoint(ckpt_dir)
    assert payload["model"], "checkpoint stored no trainable leaves"
    params = load_pretrained_params(trainer.model, cfg)
    params = apply_trainable(params, payload["model"])
    flat = traverse_util.flatten_dict(params)
    for k, trained in trainer.trainable.items():
        np.testing.assert_array_equal(flat[k], np.asarray(trained))

    # CLI level: --checkpoint produces a submission end to end
    cfg_yaml = str(tmp_path / "cfg.yaml")
    cfg.to_yaml(cfg_yaml)
    out_file = str(tmp_path / "sub.jsonl")
    from mraudio_tpu.cli.evaluate import main

    main([
        "--config", cfg_yaml, "--annotation-file", ann,
        "--output-file", out_file, "--checkpoint", ckpt_dir,
        "--model-size", "tiny", "--video-source", "synthetic",
        "--batch-size", "1", "--num-workers", "1",
    ])
    records = [json.loads(l) for l in open(out_file)]
    assert len(records) == 2
    assert all("pred_relevant_windows" in r for r in records)
