"""Model factory: ``--model`` name → backbone instance.

The reference dispatches on ``args.model`` in both drivers
(``evaluate.py:27-31``, ``utils/trainer.py:50-56``); this is the single
TPU-side counterpart used by the CLIs, the trainer, and the eval driver.
"""

from __future__ import annotations

from mraudio_tpu.config import RunConfig


def canonical_model_name(name: str) -> str:
    key = name.lower().replace("-", "").replace("_", "").replace(" ", "")
    if key in ("xinstructblip", "instructblip", "x"):
        return "X-InstructBLIP"
    if key in ("videollama", "videollama2", "videollama2av"):
        return "VideoLLaMA"
    raise ValueError(
        f"unknown model {name!r} (expected X-InstructBLIP or VideoLLaMA)"
    )


def build_model(cfg: RunConfig, llm_tokenizer=None):
    """Build the backbone named by ``cfg.model_name``.

    Both backbones share the vit/beats/llm/lora size knobs from
    ``cfg.model``, so ``--model-size tiny`` / YAML overrides apply
    uniformly."""
    name = canonical_model_name(cfg.model_name)
    if name == "X-InstructBLIP":
        from mraudio_tpu.models.xinstructblip import XInstructBLIP

        return XInstructBLIP(
            cfg.model, audio_cfg=cfg.data.audio, llm_tokenizer=llm_tokenizer
        )
    from mraudio_tpu.models.videollama import VideoLLaMA, videollama_config_from

    vcfg = videollama_config_from(cfg.model, n_frms=cfg.data.n_frms)
    return VideoLLaMA(vcfg, audio_cfg=cfg.data.audio, llm_tokenizer=llm_tokenizer)
