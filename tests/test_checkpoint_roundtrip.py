"""On-disk checkpoint round-trip through the CLI surface (VERDICT #8).

Fabricates torch checkpoint *files* in the reference's exact key layouts
— ``{modality}_Qformer.`` / ``{modality}_llm_proj.`` prefixes with the
``{"model": ...}`` wrapper and the ``ln_vision`` routing of
``/root/reference/models/xinstructblip.py:614-655,694-735,769-816`` —
then loads them through the eval CLI's flag/config path and asserts the
loaded tree equals the converters' output.
"""

import json

import numpy as np
import pytest

import jax

from mraudio_tpu.cli.evaluate import build_config
from mraudio_tpu.config import RunConfig, tiny_data_config, tiny_model_config
from mraudio_tpu.models.convert_weights import (
    convert_beats,
    convert_eva_vit,
    convert_llama_hf,
    convert_qformer_bundle,
    load_pretrained_params,
)
from mraudio_tpu.models.xinstructblip import XInstructBLIP

from tests.test_beats_gates import synthetic_beats_sd
from tests.test_convert_weights import (
    _hf_tiny_llama_config,
    _synthetic_eva_sd,
    _synthetic_qformer_bundle_sd,
)

CFG = tiny_model_config()


def _flat(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flat(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = np.asarray(v)
    return out


def _save(path, sd, wrap_model=False):
    import torch

    payload = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}
    torch.save({"model": payload} if wrap_model else payload, str(path))
    return str(path)


@pytest.fixture(scope="module")
def fabricated(tmp_path_factory):
    """All six reference-format checkpoints on disk."""
    import torch
    from transformers import LlamaForCausalLM

    root = tmp_path_factory.mktemp("ckpts")

    video_sd = _synthetic_qformer_bundle_sd(CFG.qformer, "video", CFG.vit.width)
    # Salesforce video bundle stores its LN as ln_vision (reference
    # init_ln maps load_ln_type "vision" -> "ln_vision").
    video_sd["ln_vision.weight"] = video_sd.pop("video_ln.weight")
    video_sd["ln_vision.bias"] = video_sd.pop("video_ln.bias")
    audio_sd = _synthetic_qformer_bundle_sd(CFG.qformer, "audio", CFG.beats.width)
    vit_sd = _synthetic_eva_sd(CFG.vit)
    beats_sd = synthetic_beats_sd(CFG.beats)

    torch.manual_seed(0)
    hf = LlamaForCausalLM(_hf_tiny_llama_config()).eval()
    llama_sd = {k: v.numpy() for k, v in hf.state_dict().items()}

    return {
        # the reference wraps bundles in {"model": ...} (get_state_dict
        # unwraps, models/xinstructblip.py:748-752) — exercise both forms
        "video": _save(root / "video_qformer.pth", video_sd, wrap_model=True),
        "audio": _save(root / "audio_qformer_improved.pth", audio_sd),
        "vit": _save(root / "eva_vit_g.pth", vit_sd, wrap_model=True),
        "beats": _save(root / "BEATs_iter3_plus_AS2M.pt", beats_sd),
        "llm": _save(root / "vicuna_tiny.pth", llama_sd),
        "sds": {
            "video": video_sd, "audio": audio_sd, "vit": vit_sd,
            "beats": beats_sd, "llm": llama_sd,
        },
    }


def _cli_config(fabricated, tmp_path, ann):
    """Build the RunConfig exactly as the CLI does: YAML --config for the
    bundle paths + --model-path/--audio-encoder flags."""
    import argparse

    yaml_path = str(tmp_path / "run.yaml")
    RunConfig(
        model=CFG,
        data=tiny_data_config(n_frms=4),
        vit_weights=fabricated["vit"],
        video_qformer_weights=fabricated["video"],
        audio_qformer_weights=fabricated["audio"],
    ).to_yaml(yaml_path)

    args = argparse.Namespace(
        model="X-InstructBLIP",
        model_path=fabricated["llm"],
        audio_encoder=fabricated["beats"],
        video_folder="",
        annotation_file=ann,
        output_file=str(tmp_path / "out.jsonl"),
        num_chunks=1, chunk_idx=0,
        batch_size=1, num_workers=1,
        dataset="QVH",
        config=yaml_path,
        video_source="synthetic",
        model_size="tiny",
        n_frms=4,
    )
    return build_config(args)


def test_roundtrip_files_to_params(fabricated, tmp_path):
    ann = str(tmp_path / "ann.jsonl")
    with open(ann, "w") as f:
        f.write(json.dumps({
            "vid": "v0", "qid": 0, "query": "q", "duration": 100,
            "relevant_windows": [[1, 5]],
        }) + "\n")

    cfg = _cli_config(fabricated, tmp_path, ann)
    assert cfg.llm_weights == fabricated["llm"]
    assert cfg.beats_weights == fabricated["beats"]
    assert cfg.video_qformer_weights == fabricated["video"]

    model = XInstructBLIP(cfg.model, audio_cfg=cfg.data.audio)
    loaded = load_pretrained_params(model, cfg)

    sds = fabricated["sds"]
    expect = {}
    expect.update(_flat(convert_qformer_bundle(sds["video"], CFG.qformer, "video")))
    expect.update(_flat(convert_qformer_bundle(sds["audio"], CFG.qformer, "audio")))
    expect.update(_flat({"vit": convert_eva_vit(sds["vit"], CFG.vit)}))
    expect.update(_flat({"beats": convert_beats(sds["beats"], CFG.beats)}))
    expect.update(_flat({"llm": convert_llama_hf(sds["llm"], CFG.llm)}))

    flat_loaded = _flat(loaded)
    # ln_vision routed into video_ln
    assert ("video_ln", "ln", "LayerNorm_0", "scale") in expect
    for key, want in expect.items():
        got = flat_loaded[key]
        np.testing.assert_array_equal(
            got, want, err_msg=f"mismatch at {'/'.join(map(str, key))}"
        )

    # and everything NOT covered by a checkpoint stayed random-init
    base = model.init_params(jax.random.PRNGKey(cfg.train.seed))
    flat_base = _flat(base)
    lora_keys = [k for k in flat_loaded if "lora_a" in k]
    assert lora_keys
    for k in lora_keys:
        np.testing.assert_array_equal(flat_loaded[k], flat_base[k])


def test_cli_end_to_end_with_weight_files(fabricated, tmp_path):
    """The full CLI run consumes the fabricated files without error."""
    from mraudio_tpu.cli.evaluate import main

    ann = str(tmp_path / "ann.jsonl")
    with open(ann, "w") as f:
        f.write(json.dumps({
            "vid": "v0", "qid": 0, "query": "q", "duration": 100,
            "relevant_windows": [[1, 5]],
        }) + "\n")
    yaml_path = str(tmp_path / "run.yaml")
    RunConfig(
        model=CFG,
        data=tiny_data_config(n_frms=4),
        vit_weights=fabricated["vit"],
        video_qformer_weights=fabricated["video"],
        audio_qformer_weights=fabricated["audio"],
    ).to_yaml(yaml_path)
    out = str(tmp_path / "sub.jsonl")
    main([
        "--config", yaml_path,
        "--model-path", fabricated["llm"],
        "--audio-encoder", fabricated["beats"],
        "--annotation-file", ann,
        "--output-file", out,
        "--video-source", "synthetic",
        "--batch-size", "1",
    ])
    rows = [json.loads(l) for l in open(out)]
    assert len(rows) == 1 and "pred_relevant_windows" in rows[0]
