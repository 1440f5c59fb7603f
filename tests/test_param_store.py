"""`cli/convert.py`: one-time checkpoint conversion into a param store,
restored by `--params-store` on the other CLIs.

The reference re-runs its five-checkpoint load surgery every launch
(`/root/reference/models/xinstructblip.py:614-655,706-735`); the store
runs `load_pretrained_params` once and persists the finished tree.
"""

import json

import numpy as np
import pytest

from mraudio_tpu.config import RunConfig, tiny_data_config, tiny_model_config


def _ann_file(tmp_path, n=2):
    path = str(tmp_path / "ann.jsonl")
    with open(path, "w") as f:
        for i in range(n):
            f.write(json.dumps({
                "vid": f"v{i}", "qid": i, "query": f"action {i}",
                "duration": 150, "relevant_windows": [[10, 30]],
            }) + "\n")
    return path


def test_store_roundtrip_and_cli(tmp_path):
    cfg = RunConfig(model=tiny_model_config(), data=tiny_data_config(n_frms=4))
    cfg_yaml = str(tmp_path / "cfg.yaml")
    cfg.to_yaml(cfg_yaml)
    store = str(tmp_path / "store")

    from mraudio_tpu.cli.convert import main as convert_main

    convert_main(["--config", cfg_yaml, "--output", store])

    # the store round-trips the exact tree load_pretrained_params built
    from flax import traverse_util

    from mraudio_tpu.cli.convert import load_param_store, resolve_params
    from mraudio_tpu.models.convert_weights import load_pretrained_params
    from mraudio_tpu.models.factory import build_model

    model = build_model(cfg)
    fresh = traverse_util.flatten_dict(load_pretrained_params(model, cfg))
    stored = traverse_util.flatten_dict(load_param_store(store))
    assert set(fresh) == set(stored)
    for k in fresh:
        np.testing.assert_array_equal(np.asarray(fresh[k]), stored[k])

    # resolve_params(store) == resolve_params(convert-at-load)
    resolved = traverse_util.flatten_dict(resolve_params(model, cfg, store))
    for k in fresh:
        np.testing.assert_array_equal(np.asarray(fresh[k]), resolved[k])

    # CLI level: evaluate --params-store produces the same submission as
    # the convert-at-load path (same seed -> same random-init tree)
    ann = _ann_file(tmp_path)
    from mraudio_tpu.cli.evaluate import main as eval_main

    outs = {}
    for name, extra in (("direct", []), ("store", ["--params-store", store])):
        out = str(tmp_path / f"sub_{name}.jsonl")
        eval_main([
            "--config", cfg_yaml, "--annotation-file", ann,
            "--output-file", out, "--model-size", "tiny",
            "--video-source", "synthetic", "--batch-size", "1",
            "--num-workers", "1", *extra,
        ])
        outs[name] = [json.loads(l) for l in open(out)]
    assert outs["direct"] == outs["store"]


def test_store_meta_mismatch_raises(tmp_path):
    cfg = RunConfig(model=tiny_model_config(), data=tiny_data_config(n_frms=4))
    store = str(tmp_path / "store")

    from mraudio_tpu.cli.convert import resolve_params, save_param_store
    from mraudio_tpu.models.factory import build_model

    model = build_model(cfg)
    params = model.init_params(__import__("jax").random.PRNGKey(0))
    save_param_store(store, params, {"model_name": cfg.model_name,
                                     "quantization": "int8",
                                     "scan_layers": False})
    with pytest.raises(ValueError, match="quantization"):
        resolve_params(model, cfg, store)
