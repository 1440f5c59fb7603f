"""Eval-driver OOM resilience (``batch_fallback``): a device
RESOURCE_EXHAUSTED during generate halves the batch size and restarts
the run instead of killing it.  Static shapes mean the failed program
never produced results, so the retry loses nothing; records must match
a clean run at the smaller batch exactly.

Counterpart behavior in the reference: none — a CUDA OOM kills
``evaluate.py`` (no try/except around the generate loop,
``/root/reference/evaluate.py:42-58``).
"""

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


class _OOMAbove:
    """Duck-typed model wrapper: generate raises a fake XLA
    RESOURCE_EXHAUSTED whenever the batch is wider than ``max_rows``
    (hiding generate_submit so the driver takes the one-shot branch —
    the retry wraps both branches identically)."""

    def __init__(self, inner, max_rows):
        self._inner = inner
        self._max_rows = max_rows
        self.n_oom = 0
        self.cfg = inner.cfg
        self.llm_tokenizer = inner.llm_tokenizer

    def prepare_text(self, *a, **k):
        return self._inner.prepare_text(*a, **k)

    def device_inputs(self, batch):
        return self._inner.device_inputs(batch)

    def generate(self, params, batch, device_inputs=None, **kw):
        if len(batch.qid) > self._max_rows:
            self.n_oom += 1
            raise jax.errors.JaxRuntimeError(
                "RESOURCE_EXHAUSTED: TPU backend error (ResourceExhausted)."
            )
        return self._inner.generate(params, batch, device_inputs, **kw)


def test_fallback_halves_batch_and_matches_clean_run():
    cfg, model, params = _tiny()
    anns = _annotations(5)

    clean = run_inference(
        cfg, model=model, params=params, annotations=anns, batch_size=1
    )

    wrapped = _OOMAbove(model, max_rows=1)
    result = run_inference(
        cfg, model=wrapped, params=params, annotations=anns, batch_size=4
    )
    assert wrapped.n_oom == 2  # 4 -> 2 -> 1
    assert result["batch_size"] == 1
    assert result["records"] == clean["records"]


def test_fallback_disabled_raises():
    cfg, model, params = _tiny()
    wrapped = _OOMAbove(model, max_rows=1)
    try:
        run_inference(
            cfg, model=wrapped, params=params, annotations=_annotations(3),
            batch_size=2, batch_fallback=False,
        )
    except jax.errors.JaxRuntimeError as e:
        assert "RESOURCE_EXHAUSTED" in str(e)
    else:
        raise AssertionError("expected the OOM to propagate")


def test_non_oom_errors_propagate():
    cfg, model, params = _tiny()

    class Boom(_OOMAbove):
        def generate(self, params, batch, device_inputs=None, **kw):
            raise ValueError("unrelated bug")

    try:
        run_inference(
            cfg, model=Boom(model, 1), params=params,
            annotations=_annotations(2), batch_size=2,
        )
    except ValueError as e:
        assert "unrelated bug" in str(e)
    else:
        raise AssertionError("expected the ValueError to propagate")
