import os

from mraudio_tpu.config import (
    DataConfig,
    RunConfig,
    tiny_data_config,
    tiny_model_config,
)


def test_defaults_match_reference_values():
    cfg = RunConfig()
    # models/xinstructblip.py:70-77,120
    assert tuple(cfg.model.modalities) == ("audio", "video")
    assert cfg.model.interleave_seconds is True
    assert cfg.model.max_txt_len == 128
    assert cfg.model.max_output_txt_len == 64
    assert cfg.model.qformer.num_query_tokens == 32
    # models/model_utils.py:4-27
    assert cfg.model.lora.rank == 8 and cfg.model.lora.alpha == 8
    # utils/trainer.py:31,59-66
    assert cfg.train.lr == 3e-4
    assert cfg.train.weight_decay == 0.05
    assert cfg.train.warmup_steps == 1000
    assert cfg.train.accum_grad_iters == 2
    # evaluate.py:15-16
    assert DataConfig.for_dataset("QVH").n_frms == 60
    assert DataConfig.for_dataset("Charades_STA").n_frms == 20


def test_yaml_roundtrip(tmp_path):
    cfg = RunConfig(model=tiny_model_config(), data=tiny_data_config())
    path = os.path.join(tmp_path, "cfg.yaml")
    cfg.to_yaml(path)
    loaded = RunConfig.from_yaml(path)
    assert loaded.model.vit.width == cfg.model.vit.width
    assert loaded.model.llm.num_layers == cfg.model.llm.num_layers
    assert loaded.data.audio.num_mel_bins == cfg.data.audio.num_mel_bins
    assert loaded.train.lr == cfg.train.lr


def test_replace_and_nested_override():
    cfg = RunConfig()
    cfg2 = cfg.replace(train=cfg.train.replace(lr=1e-5))
    assert cfg2.train.lr == 1e-5
    assert cfg.train.lr == 3e-4


def test_audio_frontend_geometry():
    cfg = DataConfig.for_dataset("QVH")
    assert cfg.audio.win_length == 400
    assert cfg.audio.hop_length == 160
    assert cfg.audio.mel_frames_per_chunk == 512


def test_modalities_schema_accepts_4_rejects_live_image_pc():
    """vicuna7b_v2.yaml documents image/pc modalities; the reference CODE
    binds only audio+video — config carries the schema, the model raises
    a clear error when a schema-only modality is enabled."""
    import pytest

    from mraudio_tpu.config import tiny_data_config, tiny_model_config
    from mraudio_tpu.models.xinstructblip import XInstructBLIP

    cfg = tiny_model_config().replace(modalities=("audio", "video", "image"))
    assert cfg.modalities == ("audio", "video", "image")  # schema accepts
    with pytest.raises(ValueError, match="no live code path"):
        XInstructBLIP(cfg, audio_cfg=tiny_data_config().audio)
    with pytest.raises(ValueError, match="unknown modalities"):
        XInstructBLIP(tiny_model_config().replace(modalities=("thermal",)),
                      audio_cfg=tiny_data_config().audio)
