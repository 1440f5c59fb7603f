"""Exercise the text path with a REAL HF tokenizer (VERDICT missing #3).

No weights can be downloaded here, but the HF ``tokenizers`` (Rust)
library is present — so we *train* a Llama-convention Unigram tokenizer
locally (metaspace ``▁`` prefix, single-digit tokens, byte-ish fallback,
``<unk>/<s>/</s>`` = 0/1/2), save its ``tokenizer.json``, and drive
``load_llama_tokenizer`` + the reference's special-token surgery +
``prepare_text`` budgets + a full generate through it.  This is the
sentencepiece-shaped segmentation the static budgets were never
validated against in round 1.
"""

import json

import numpy as np
import pytest

from mraudio_tpu.config import tiny_data_config, tiny_model_config
from mraudio_tpu.text.tokenizer import (
    load_llama_tokenizer,
    required_token_budget,
    validate_time_budgets,
)


@pytest.fixture(scope="module")
def llama_like_tokenizer(tmp_path_factory):
    """Train a tiny Unigram tokenizer with Llama conventions and load it
    through the real ``load_llama_tokenizer`` path."""
    from tokenizers import (
        Tokenizer, decoders, models, pre_tokenizers, processors, trainers,
    )

    corpus = tmp_path_factory.mktemp("tok") / "corpus.txt"
    rng = np.random.default_rng(0)
    lines = []
    words = ("query", "video", "audio", "person", "waves", "relevant",
             "windows", "given", "find", "the", "and", "a", "scene")
    for _ in range(2000):
        n = rng.integers(3, 10)
        sent = " ".join(rng.choice(words, n))
        t0, t1 = sorted(rng.integers(0, 9999, 2))
        lines.append(f"{sent} [[{t0}, {t1}]]")
    corpus.write_text("\n".join(lines))

    tok = Tokenizer(models.Unigram())
    tok.pre_tokenizer = pre_tokenizers.Metaspace(replacement="▁")
    tok.decoder = decoders.Metaspace(replacement="▁")
    trainer = trainers.UnigramTrainer(
        vocab_size=256,
        special_tokens=["<unk>", "<s>", "</s>"],
        unk_token="<unk>",
        initial_alphabet=list("0123456789[], :.▁"),
    )
    tok.train([str(corpus)], trainer)
    # Llama's tokenizer.json prepends BOS under add_special_tokens=True
    tok.post_processor = processors.TemplateProcessing(
        single="<s> $A", pair="<s> $A <s> $B",
        special_tokens=[("<s>", tok.token_to_id("<s>"))],
    )
    path = str(tmp_path_factory.mktemp("tok2") / "tokenizer.json")
    tok.save(path)
    return load_llama_tokenizer(path)


def test_surgery_applied(llama_like_tokenizer):
    tok = llama_like_tokenizer
    # bos/eos/unk forced to </s>; [PAD] appended as a fresh id
    assert tok.eos_token == "</s>"
    assert tok.bos_token_id == tok.eos_token_id
    assert tok.pad_token_id == tok.vocab_size - 1
    assert tok.pad_token_id not in tok.encode("query video 123")


def test_budget_validation_with_real_segmentation(llama_like_tokenizer):
    tok = llama_like_tokenizer
    need = required_token_budget(tok, range(0, 151), " {} ")
    cfg = tiny_model_config()
    if need <= cfg.tokens_per_timestamp:
        validate_time_budgets(tok, cfg, max_seconds=150)
    else:
        with pytest.raises(ValueError):
            validate_time_budgets(tok, cfg, max_seconds=150)
        validate_time_budgets(
            tok, cfg.replace(tokens_per_timestamp=need,
                             tokens_per_duration=need),
            max_seconds=150,
        )


def test_prepare_text_and_generate_with_real_tokenizer(llama_like_tokenizer):
    """The full generate path runs on real-HF-tokenizer ids: vocab-sized
    embedding table, surgery ids, static budgets, decode round-trip."""
    import jax

    from mraudio_tpu.data.dataset import Batch
    from mraudio_tpu.models.xinstructblip import XInstructBLIP

    tok = llama_like_tokenizer
    need = required_token_budget(tok, range(0, 151), " {} ")
    cfg = tiny_model_config().replace(tokens_per_timestamp=max(need, 6),
                                      tokens_per_duration=max(need, 6))
    cfg = cfg.replace(llm=cfg.llm.replace(vocab_size=tok.vocab_size))
    model = XInstructBLIP(cfg, audio_cfg=tiny_data_config().audio,
                          llm_tokenizer=tok)
    # cues tokenized with specials: remapped BOS (</s>) leads each cue
    assert model.cue_ids["video"][0] == tok.bos_token_id

    params = model.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    b, t = 2, 4
    batch = Batch(
        video=rng.integers(0, 256, (b, t, 28, 28, 3), dtype=np.uint8),
        audio=rng.integers(-2000, 2000, (b, 8000), dtype=np.int16),
        timestamps=np.tile(np.array([0, 40, 90, 140], np.int32), (b, 1)),
        duration=[150] * b,
        text_input=["Query: a person waves\nGiven the video and the query, "
                    "find the relevant windows.\nRelevant windows: "] * b,
        text_output=["[[10, 30]]"] * b,
        qid=[0, 1], query=["a person waves"] * b, vid=["v0", "v1"],
        valid=np.ones(b, bool),
    )
    outs = model.generate(params, batch)
    assert len(outs) == b and all(isinstance(o, str) for o in outs)

    loss = model.loss(params, batch)
    assert np.isfinite(float(loss))


def test_decode_roundtrip_and_eos_repair(llama_like_tokenizer):
    tok = llama_like_tokenizer
    text = "[[12, 35]]"
    ids = tok.encode(text, add_special_tokens=False)
    assert tok.decode(ids).strip() == text
    # id-0 -> eos repair semantics: decoding skips the repaired specials
    arr = np.array(ids + [0, 0])
    arr[arr == 0] = tok.eos_token_id
    assert tok.decode(arr, skip_special_tokens=True).strip() == text
