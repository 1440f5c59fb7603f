"""Sanity invariants for the analytic FLOP accounting behind bench.py's
MFU line (`utils/flops.py`).  The reference publishes no FLOPs/MFU at
all; these tests keep ours honest.
"""

import pytest

from mraudio_tpu.config import (
    DataConfig,
    full_model_config,
    tiny_model_config,
)
from mraudio_tpu.utils.flops import (
    peak_flops_for,
    pipeline_flops,
    transformer_flops,
)

QVH_PREFILL = 5353
DECODE = 64


def _full():
    return full_model_config(), DataConfig.for_dataset("QVH").audio


def test_linear_in_batch():
    cfg, audio = _full()
    one = pipeline_flops(cfg, audio, 60, 1, QVH_PREFILL, DECODE)
    two = pipeline_flops(cfg, audio, 60, 2, QVH_PREFILL, DECODE)
    for stage, v in one.items():
        assert two[stage] == pytest.approx(2 * v, rel=1e-9), stage


def test_llm_prefill_tracks_2_params_tokens():
    """The standard 2·N_params·tokens estimate (weights touched once per
    token) should be within ~25% of the counted prefill matmul FLOPs —
    attention adds the quadratic term on top, so counted ≥ estimate."""
    cfg, audio = _full()
    llm = cfg.llm
    n_params = llm.num_layers * (
        llm.hidden_size * llm.hidden_size * 2
        + llm.hidden_size * (llm.num_kv_heads * llm.head_dim) * 2
        + 3 * llm.hidden_size * llm.intermediate_size
    )
    estimate = 2 * n_params * QVH_PREFILL
    counted = pipeline_flops(cfg, audio, 60, 1, QVH_PREFILL, DECODE)["prefill"]
    assert counted >= estimate
    assert counted == pytest.approx(estimate, rel=0.25)


def test_prefill_lm_head_counts_last_position_only():
    """generate computes logits at hidden[:, -1:] only
    (infer/generate.py); the accounting must not bill the full (B, S, V)
    projection.  Doubling prefill_len must NOT add a 2·S·h·V term."""
    cfg, audio = _full()
    llm = cfg.llm
    a = pipeline_flops(cfg, audio, 60, 1, 1000, DECODE)["prefill"]
    b = pipeline_flops(cfg, audio, 60, 1, 2000, DECODE)["prefill"]
    full_lm_head_delta = 2 * 1000 * llm.hidden_size * llm.vocab_size
    # the S-linear + S^2 attention growth, minus any per-sequence lm_head
    growth = b - a
    no_lm_head_growth = (
        transformer_flops(2000, llm.hidden_size, llm.num_layers,
                          llm.intermediate_size, kv_len=1000,
                          kv_width=llm.num_kv_heads * llm.head_dim,
                          n_mlp_mats=3)
        - transformer_flops(1000, llm.hidden_size, llm.num_layers,
                            llm.intermediate_size, kv_len=500,
                            kv_width=llm.num_kv_heads * llm.head_dim,
                            n_mlp_mats=3)
    )
    assert growth == pytest.approx(no_lm_head_growth, rel=1e-9)
    assert abs(growth - (no_lm_head_growth + full_lm_head_delta)) > 1e9


def test_monotonic_in_frames_and_decode():
    cfg, audio = _full()
    base = pipeline_flops(cfg, audio, 20, 1, QVH_PREFILL, DECODE)["total"]
    more_frames = pipeline_flops(cfg, audio, 60, 1, QVH_PREFILL, DECODE)["total"]
    more_decode = pipeline_flops(cfg, audio, 20, 1, QVH_PREFILL, 128)["total"]
    assert more_frames > base and more_decode > base


def test_peak_lookup():
    assert peak_flops_for("TPU v5 lite") == 197e12
    assert peak_flops_for("TPU v6 lite") == 918e12
    assert peak_flops_for("unknown accelerator") == 197e12


def test_tiny_config_runs():
    cfg = tiny_model_config()
    audio = DataConfig.for_dataset("QVH").audio.__class__(
        num_mel_bins=16, mel_frames_per_chunk=32
    )
    out = pipeline_flops(cfg, audio, 4, 2, 256, 8)
    assert out["total"] > 0 and all(v >= 0 for v in out.values())
