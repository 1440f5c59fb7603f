"""Whole-pipeline golden regression: fixed seed, tiny profile, synthetic
media → the generate outputs and train loss must not drift.

Module-level parity (HF oracles, reference scorer) and structural tests
don't catch a refactor that subtly changes the *composition* — e.g. an
interleave reordering or a mask off-by-one that still produces valid
shapes.  This pins the end-to-end numbers on the CPU platform.

Regenerate after an INTENTIONAL numerical change with:
    MRAUDIO_UPDATE_GOLDENS=1 python -m pytest tests/test_golden_pipeline.py
and include the golden diff in the commit that changes the numerics.
"""

import json
import os

import numpy as np
import pytest

import jax

from mraudio_tpu.config import RunConfig, tiny_data_config, tiny_model_config
from mraudio_tpu.data.dataset import MRDataset, collate
from mraudio_tpu.models.xinstructblip import XInstructBLIP

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden", "tiny_pipeline.json")


def _annotations():
    return [
        {
            "vid": f"v{i}", "qid": i, "query": f"a person does action {i}",
            "duration": 150, "relevant_windows": [[10 + i, 30 + i]],
        }
        for i in range(3)
    ]


def _run():
    cfg = RunConfig(model=tiny_model_config(), data=tiny_data_config(n_frms=4))
    model = XInstructBLIP(cfg.model, audio_cfg=cfg.data.audio)
    params = model.init_params(jax.random.PRNGKey(0))

    ds = MRDataset(cfg.data, annotations=_annotations(), split="eval")
    batch = collate([ds.get(i) for i in range(3)], 3)
    outputs = model.generate(params, batch)

    train_ds = MRDataset(cfg.data, annotations=_annotations(), split="train")
    tbatch = collate([train_ds.get(i) for i in range(3)], 3)
    arrays = model.loss_arrays(tbatch)
    loss = float(model._loss_fn(params, *arrays, n_frms=4))
    return {"outputs": list(outputs), "loss": loss}


def test_pipeline_outputs_match_golden():
    got = _run()
    if os.environ.get("MRAUDIO_UPDATE_GOLDENS"):
        os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
        with open(GOLDEN_PATH, "w") as f:
            json.dump(got, f, indent=2)
        pytest.skip(f"goldens regenerated at {GOLDEN_PATH}")
    assert os.path.exists(GOLDEN_PATH), (
        "golden file missing — run MRAUDIO_UPDATE_GOLDENS=1 pytest "
        "tests/test_golden_pipeline.py once and commit it"
    )
    with open(GOLDEN_PATH) as f:
        want = json.load(f)
    assert got["outputs"] == want["outputs"]
    # same platform + seed is deterministic; the loose tolerance only
    # absorbs cross-jax-version accumulation-order changes
    assert got["loss"] == pytest.approx(want["loss"], rel=1e-4), (
        "end-to-end loss drifted — if this change is intentional, "
        "regenerate goldens and say why in the commit"
    )
    assert np.isfinite(got["loss"])
