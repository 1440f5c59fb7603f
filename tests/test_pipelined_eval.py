"""The two-deep dispatch pipeline (generate_submit/generate_finalize)
must be a pure restructuring: token/record-identical to the blocking
one-shot generate path, on both models and through the eval driver's
fallback branch for models without generate_submit."""

import numpy as np

import jax

from mraudio_tpu.config import RunConfig, tiny_data_config, tiny_model_config
from mraudio_tpu.infer.evaluate import run_inference
from mraudio_tpu.models.xinstructblip import XInstructBLIP


def _annotations(n):
    return [
        {
            "vid": f"v{i}", "qid": i, "query": f"does thing {i}",
            "duration": 150, "relevant_windows": [[5 * i, 5 * i + 20]],
        }
        for i in range(n)
    ]


def _tiny():
    cfg = RunConfig(model=tiny_model_config(), data=tiny_data_config(n_frms=4))
    model = XInstructBLIP(cfg.model, audio_cfg=cfg.data.audio)
    params = model.init_params(jax.random.PRNGKey(0))
    return cfg, model, params


def test_submit_finalize_equals_generate():
    cfg, model, params = _tiny()
    from mraudio_tpu.data.dataset import MRDataset, collate

    ds = MRDataset(cfg.data, annotations=_annotations(2))
    batch = collate([ds.get(i) for i in range(2)], 2)

    direct = model.generate(params, batch)
    pending = model.generate_submit(params, batch)
    pipelined = model.generate_finalize(pending)
    assert direct == pipelined

    # two overlapping submissions stay independent (the driver keeps one
    # batch in flight while the next is dispatched)
    p1 = model.generate_submit(params, batch)
    p2 = model.generate_submit(params, batch)
    assert model.generate_finalize(p1) == direct
    assert model.generate_finalize(p2) == direct


def test_driver_fallback_matches_pipelined():
    """A model without generate_submit goes through the driver's one-shot
    fallback; records must match the pipelined run exactly."""
    cfg, model, params = _tiny()
    anns = _annotations(5)  # odd count: exercises the padded tail batch

    pipelined = run_inference(
        cfg, model=model, params=params, annotations=anns, batch_size=2
    )["records"]

    class Blocking:
        """Duck-typed wrapper hiding generate_submit from the driver."""

        def __init__(self, inner):
            self._inner = inner
            self.cfg = inner.cfg
            self.llm_tokenizer = inner.llm_tokenizer

        def prepare_text(self, *a, **k):
            return self._inner.prepare_text(*a, **k)

        def device_inputs(self, batch):
            return self._inner.device_inputs(batch)

        def generate(self, params, batch, device_inputs=None, **kw):
            return self._inner.generate(params, batch, device_inputs, **kw)

    blocking = run_inference(
        cfg, model=Blocking(model), params=params, annotations=anns,
        batch_size=2,
    )["records"]
    assert pipelined == blocking


def test_videollama_submit_finalize():
    from mraudio_tpu.data.dataset import MRDataset, collate
    from mraudio_tpu.models.videollama import VideoLLaMA, tiny_videollama_config

    cfg = RunConfig(model=tiny_model_config(), data=tiny_data_config(n_frms=4))
    vcfg = tiny_videollama_config()
    model = VideoLLaMA(vcfg, audio_cfg=cfg.data.audio)
    params = model.init_params(jax.random.PRNGKey(0))
    ds = MRDataset(cfg.data, annotations=_annotations(2))
    batch = collate([ds.get(i) for i in range(2)], 2)

    direct = model.generate(params, batch)
    assert model.generate_finalize(model.generate_submit(params, batch)) == direct
