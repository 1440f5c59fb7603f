"""Train-time RandomResizedCrop+flip wiring (TrainConfig.augment,
ops/image.py, model loss paths).

The reference's train processor applies RandomResizedCrop(scale 0.9-1.0)
+ horizontal flip before normalization (AlproVideoTrainProcessor,
``processors/alpro_processors.py:40-61``); the TPU build samples the
parameters host-side and applies them inside the jitted step.
"""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mraudio_tpu.config import tiny_data_config, tiny_model_config
from mraudio_tpu.data.dataset import MRDataset, collate
from mraudio_tpu.models.xinstructblip import XInstructBLIP
from mraudio_tpu.ops.image import sample_crop_params


def _make_batch(tmp_path, n=2, n_frms=4):
    path = str(tmp_path / "ann.jsonl")
    with open(path, "w") as f:
        for i in range(n):
            f.write(json.dumps({
                "vid": f"v{i}", "qid": i, "query": f"q {i}",
                "duration": 150, "relevant_windows": [[10, 30]],
            }) + "\n")
    ds = MRDataset(tiny_data_config(n_frms=n_frms), annotation_path=path)
    return collate([ds.get(i) for i in range(n)], n)


@pytest.fixture(scope="module")
def model_and_params():
    model = XInstructBLIP(tiny_model_config(), audio_cfg=tiny_data_config().audio)
    return model, model.init_params(jax.random.PRNGKey(0))


def test_identity_crop_matches_plain_loss(tmp_path, model_and_params):
    model, params = model_and_params
    batch = _make_batch(tmp_path)
    h, w = batch.video.shape[2], batch.video.shape[3]
    identity = np.array([[0, 0, h, w, 0]] * batch.video.shape[0], np.int32)
    plain = float(model.loss(params, batch))
    cropped = float(model.loss(params, batch, crop_params=jnp.asarray(identity)))
    assert abs(plain - cropped) < 0.02  # bilinear identity resample


def test_augment_changes_pixels_deterministically(tmp_path, model_and_params):
    model, params = model_and_params
    batch = _make_batch(tmp_path)
    h, w = batch.video.shape[2], batch.video.shape[3]

    crop_a = sample_crop_params(np.random.default_rng(5), 2, h, w)
    crop_b = sample_crop_params(np.random.default_rng(5), 2, h, w)
    np.testing.assert_array_equal(crop_a, crop_b)  # host sampling is seeded

    flipped = crop_a.copy()
    flipped[:, 4] = 1 - flipped[:, 4]
    l1 = float(model.loss(params, batch, crop_params=jnp.asarray(crop_a)))
    l2 = float(model.loss(params, batch, crop_params=jnp.asarray(flipped)))
    assert l1 != l2  # the flip is live in the loss


def test_trainer_samples_crops_when_enabled(tmp_path, model_and_params):
    from mraudio_tpu.config import RunConfig, TrainConfig

    model, params = model_and_params
    cfg = RunConfig(
        model=model.cfg,
        data=tiny_data_config(n_frms=4),
        train=TrainConfig(batch_size=2, max_epoch=1, output_dir=str(tmp_path)),
    )
    from mraudio_tpu.train.trainer import Trainer

    path = str(tmp_path / "ann.jsonl")
    with open(path, "w") as f:
        for i in range(2):
            f.write(json.dumps({
                "vid": f"v{i}", "qid": i, "query": f"q {i}",
                "duration": 150, "relevant_windows": [[10, 30]],
            }) + "\n")
    train_ds = MRDataset(cfg.data, annotation_path=path, split="train")
    val_ds = MRDataset(cfg.data, annotation_path=path, split="eval")

    tr = Trainer(cfg, model=model, params=params,
                 train_dataset=train_ds, val_dataset=val_ds)
    batch = _make_batch(tmp_path)
    crops = tr._sample_crops(batch)
    assert crops is not None and crops.shape == (2, 5)
    # scale range respected: crop areas within [0.9, 1.0] of the frame
    h, w = batch.video.shape[2], batch.video.shape[3]
    areas = np.asarray(crops[:, 2] * crops[:, 3]) / (h * w)
    assert (areas >= 0.8).all() and (areas <= 1.0).all()

    cfg_off = cfg.replace(train=cfg.train.replace(augment=False))
    tr_off = Trainer(cfg_off, model=model, params=params,
                     train_dataset=train_ds, val_dataset=val_ds)
    assert tr_off._sample_crops(batch) is None
