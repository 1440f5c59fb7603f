"""Tokenizer-budget hardening (round-1 VERDICT #5).

The reference pads timestamp/duration tokenizations to longest and can
never truncate them (``models/xinstructblip.py:327-333,368-374``).  Our
static budgets must therefore be *proven* sufficient: silent truncation
is impossible (prepare_text raises), and ``validate_time_budgets``
sweeps the value range up front for any tokenizer implementing the
protocol.
"""

import numpy as np
import pytest

from mraudio_tpu.config import tiny_data_config, tiny_model_config
from mraudio_tpu.models.xinstructblip import XInstructBLIP
from mraudio_tpu.text.tokenizer import (
    ByteTokenizer,
    required_token_budget,
    validate_time_budgets,
)


class WordyTokenizer(ByteTokenizer):
    """Pathological protocol-conforming tokenizer: every char is two
    tokens — models a vocab that splits digits worse than expected."""

    def encode(self, text, add_special_tokens=False):
        ids = super().encode(text, add_special_tokens=False)
        ids = [t for t in ids for _ in range(2)]
        if add_special_tokens:
            ids = [self.bos_token_id] + ids
        return ids


def test_required_budget_monotone_in_digits():
    tok = ByteTokenizer()
    assert required_token_budget(tok, [5]) == 3          # " 5 "
    assert required_token_budget(tok, [150]) == 5
    assert required_token_budget(tok, [10_000]) == 7
    assert required_token_budget(tok, range(0, 151)) == 5


def test_validate_budgets_default_ok_for_qvh_range():
    cfg = tiny_model_config()  # tokens_per_timestamp=5, per_duration=5
    validate_time_budgets(ByteTokenizer(), cfg, max_seconds=150)


def test_validate_budgets_raises_for_long_videos():
    cfg = tiny_model_config()
    with pytest.raises(ValueError, match="tokens_per_timestamp"):
        validate_time_budgets(ByteTokenizer(), cfg, max_seconds=10_000)
    # raised budgets pass the same sweep
    ok = cfg.replace(tokens_per_timestamp=7, tokens_per_duration=7)
    validate_time_budgets(ByteTokenizer(), ok, max_seconds=10_000)


def test_validate_budgets_any_protocol_tokenizer():
    """The sweep works against an arbitrary (worse) tokenizer."""
    cfg = tiny_model_config().replace(tokens_per_timestamp=9, tokens_per_duration=9)
    with pytest.raises(ValueError):
        validate_time_budgets(WordyTokenizer(), cfg, max_seconds=150)
    ok = cfg.replace(tokens_per_timestamp=10, tokens_per_duration=8)
    validate_time_budgets(WordyTokenizer(), ok, max_seconds=150)


def test_prepare_text_raises_instead_of_truncating():
    """A timestamp rendering over budget is a hard error at use time."""
    model = XInstructBLIP(tiny_model_config(), audio_cfg=tiny_data_config().audio)
    stamps = np.array([[0, 2, 4, 123456]], np.int32)  # " 123456 " = 8 byte-tokens
    with pytest.raises(ValueError, match="tokens_per_timestamp"):
        model.prepare_text(["Query: q\n"], stamps, [200000])

    # duration overflow too
    stamps_ok = np.array([[0, 2, 4, 6]], np.int32)
    with pytest.raises(ValueError, match="tokens_per_duration"):
        model.prepare_text(["Query: q\n"], stamps_ok, [1234567])


def test_prepare_text_in_budget_unchanged():
    """QVH-scale values flow through untouched (no spurious errors)."""
    cfg = tiny_model_config()
    model = XInstructBLIP(cfg, audio_cfg=tiny_data_config().audio)
    stamps = np.array([[0, 50, 100, 149]], np.int32)
    text = model.prepare_text(["Query: q\n"], stamps, [150])
    assert text.ts_ids.shape == (1, 4, cfg.tokens_per_timestamp)
    # last frame " 149 " uses exactly 5 byte tokens, all unmasked
    assert text.ts_mask[0, 3].sum() == 5
