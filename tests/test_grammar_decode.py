"""Grammar-constrained + speculative decoding (text/grammar.py,
infer/generate.py::grammar_generate).

Oracles: the char-level DFA is checked against Python's own rendering
``str([[a, b], ...])`` (exactly what the reference trains on,
``utils/mr_dataset.py:103``); the constrained decode loop is checked
against a pure-Python full-forward reference (no KV cache, numpy
masking); the speculative path must be token-identical to spec_width=1.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mraudio_tpu.config import tiny_data_config, tiny_model_config
from mraudio_tpu.infer.generate import grammar_generate, greedy_generate
from mraudio_tpu.models.layers import positions_from_mask
from mraudio_tpu.models.llama import LlamaModel
from mraudio_tpu.text.grammar import START, char_accepts, compile_grammar
from mraudio_tpu.text.postprocess import moment_str_to_list, post_process
from mraudio_tpu.text.tokenizer import ByteTokenizer


# ---------------------------------------------------------------------------
# character-level DFA
# ---------------------------------------------------------------------------

def test_char_dfa_accepts_python_rendered_windows():
    rng = np.random.default_rng(0)
    for _ in range(50):
        n = int(rng.integers(1, 4))
        wins = [
            [int(rng.integers(0, 10_000)), int(rng.integers(0, 10_000))]
            for _ in range(n)
        ]
        assert char_accepts(str(wins), allow_float=False), str(wins)
        fwins = [[round(a + 0.25, 2), round(b + 0.5, 2)] for a, b in wins]
        assert char_accepts(str(fwins)), str(fwins)
    assert char_accepts(" [[0, 10]]")  # sentencepiece leading space


@pytest.mark.parametrize(
    "bad",
    [
        "", "[[]]", "[[1 2]]", "[[1,2]]", "[[1, 2]", "[[1, 2]]]",
        "[1, 2]", "[[1, 2],[3, 4]]", "[[1, 2], ]", "[[-1, -1]]",
        "[[1., 2]]", "[[1, 2]] ", "hello", "[[a, b]]",
        "[[01, 2]]",  # leading zero: ast.literal_eval would reject it
    ],
)
def test_char_dfa_rejects_malformed(bad):
    assert not char_accepts(bad)


def test_char_dfa_int_only_mode():
    assert not char_accepts("[[1.5, 2]]", allow_float=False)
    assert char_accepts("[[1, 2]]", allow_float=False)
    assert char_accepts("[[0.5, 2.75]]", allow_float=True)


def test_char_dfa_digit_cap():
    # default cap: 6 digits per number — a weak model cannot burn the
    # whole budget extending one number forever
    assert char_accepts("[[123456, 999999]]")
    assert not char_accepts("[[1234567, 2]]")
    assert not char_accepts("[[1, 2.1234567]]")
    assert char_accepts("[[1234567, 2]]", max_digits=8)


# ---------------------------------------------------------------------------
# token-level compilation (ByteTokenizer: 1 char = 1 token)
# ---------------------------------------------------------------------------

def _sample_with_tables(tables, rng, max_tokens=64):
    """Follow the token DFA with random free choices; return the id list."""
    state = tables.start_state
    out = []
    for _ in range(max_tokens):
        ids = np.nonzero(tables.allowed[state])[0]
        tok = int(rng.choice(ids))
        out.append(tok)
        state = int(tables.next_state[state, tok])
        if tok == tables.eos_id and state == tables.done_state:
            break
    return out, state


def test_byte_tokenizer_tables_only_produce_parseable_strings():
    tok = ByteTokenizer()
    # int-only: the live QVH format; floats are coerced to -1 by the
    # reference's parser (text/postprocess.py:97-99)
    tables = compile_grammar(tok, allow_float=False)
    rng = np.random.default_rng(1)
    done = 0
    for _ in range(30):
        ids, state = _sample_with_tables(tables, rng)
        text = tok.decode(ids).strip()
        if state == tables.done_state:
            done += 1
            assert char_accepts(text, allow_float=False), text
            windows = moment_str_to_list(post_process(text))
            assert all(len(w) == 2 for w in windows)
            assert [-1, -1] not in windows, text
    assert done >= 10  # the grammar terminates often under random choice


def test_byte_tokenizer_forced_states():
    tok = ByteTokenizer()
    tables = compile_grammar(tok)
    lb = tok.encode("[")[0]
    sp = tok.encode(" ")[0]
    # after the opening '[': only '[' — a forced continuation
    st = int(tables.next_state[START, lb])
    assert tables.forced[st] == lb
    # after ',' inside a window: only ' '
    ids = [tok.encode(c)[0] for c in "[[1,"]
    state = START
    for t in ids:
        assert tables.allowed[state, t]
        state = int(tables.next_state[state, t])
    assert tables.forced[state] == sp
    # terminal: only EOS, absorbing afterwards
    term, fin = tables.terminal_state, tables.done_state
    assert tables.forced[term] == tok.eos_token_id
    assert int(tables.next_state[term, tok.eos_token_id]) == fin
    assert tables.forced[fin] == tok.eos_token_id


def test_digit_cap_blocks_runaway_digits():
    tok = ByteTokenizer()
    tables = compile_grammar(tok, allow_float=False, max_digits=6)
    digits = [tok.encode(d)[0] for d in "123456"]
    state = START
    for t in [tok.encode("[")[0]] * 2 + digits:
        assert tables.allowed[state, t]
        state = int(tables.next_state[state, t])
    # 7th digit disallowed; the number must terminate
    for d in "0123456789":
        assert not tables.allowed[state, tok.encode(d)[0]]
    assert tables.allowed[state, tok.encode(",")[0]]


def test_specials_never_allowed_outside_terminal():
    tok = ByteTokenizer()
    tables = compile_grammar(tok)
    for state in range(tables.allowed.shape[0]):
        if state in (tables.terminal_state, tables.done_state):
            continue
        assert not tables.allowed[state, tok.eos_token_id]
        assert not tables.allowed[state, tok.pad_token_id]


# ---------------------------------------------------------------------------
# constrained decode vs full-forward numpy oracle
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def llm_setup():
    cfg = tiny_model_config().llm
    # vocab must cover the byte tokenizer
    cfg = cfg.replace(vocab_size=260)
    model = LlamaModel(cfg, None)
    s, d = 10, cfg.hidden_size
    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, (2, s, d))
    mask01 = np.ones((2, s), np.int32)
    mask01[1, :2] = 0  # left padding on row 1
    mask01 = jnp.asarray(mask01)
    causal = jnp.tril(jnp.ones((s, s), bool))[None, None] & mask01[:, None, None, :].astype(bool)
    ids = jnp.zeros((2, s), jnp.int32)
    params = {
        "params": model.init(
            key, x, causal, positions_from_mask(mask01), ids,
            method=LlamaModel.init_all,
        )["params"]
    }
    tables = compile_grammar(ByteTokenizer(vocab_size=260))
    return model, params, x, mask01, tables


def _oracle_constrained(model, params, prefix, mask01, tables, max_new, eos):
    """Full-forward (no cache) constrained greedy decode in Python."""
    b = prefix.shape[0]
    emb = prefix
    m = np.asarray(mask01)
    states = [tables.start_state] * b
    out = [[] for _ in range(b)]
    done = [False] * b
    for _ in range(max_new):
        mask01_j = jnp.asarray(m)
        s = emb.shape[1]
        causal = jnp.tril(jnp.ones((s, s), bool))[None, None]
        attend = causal & mask01_j[:, None, None, :].astype(bool)
        logits, _ = model.apply(
            params, emb, attend, positions_from_mask(mask01_j)
        )
        last = np.asarray(logits[:, -1], np.float32)
        ids = []
        for r in range(b):
            remaining = max_new - len(out[r])
            allowed = tables.allowed[states[r]]
            ok = allowed & (tables.dist_next[states[r]] <= remaining - 1)
            if not ok.any():  # budget can't finish: grammar-only fallback
                ok = allowed
            masked = np.where(ok, last[r], -1e9)
            t = int(masked.argmax())
            if done[r]:
                t = eos
            else:
                states[r] = int(tables.next_state[states[r], t])
                out[r].append(t)
                if t == eos:
                    done[r] = True
            ids.append(t)
        if all(done):
            break
        step_emb = model.apply(
            params, method=lambda mo, i: mo.embed(i),
            i=jnp.asarray(ids, jnp.int32)[:, None],
        )
        emb = jnp.concatenate([emb, step_emb], axis=1)
        m = np.concatenate([m, np.ones((b, 1), np.int32)], axis=1)
    for r in range(b):  # eos-fill to fixed width like grammar_generate
        out[r] += [eos] * (max_new - len(out[r]))
    return np.asarray(out)


def _tables_jnp(tables):
    return (
        jnp.asarray(tables.allowed),
        jnp.asarray(tables.next_state),
        jnp.asarray(tables.forced),
        jnp.asarray(tables.dist_next),
    )


def test_grammar_generate_matches_full_forward_oracle(llm_setup):
    model, params, x, mask01, tables = llm_setup
    max_new = 24
    allowed, nxt, forced, dn = _tables_jnp(tables)
    got = np.asarray(
        grammar_generate(
            model, params, x, mask01, max_new, 2, allowed, nxt, forced, dn,
            spec_width=1,
        )
    )
    want = _oracle_constrained(model, params, x, mask01, tables, max_new, 2)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("w", [2, 4, 8])
def test_speculative_width_token_identical(llm_setup, w):
    model, params, x, mask01, tables = llm_setup
    max_new = 24
    allowed, nxt, forced, dn = _tables_jnp(tables)
    base = np.asarray(
        grammar_generate(
            model, params, x, mask01, max_new, 2, allowed, nxt, forced, dn,
            spec_width=1,
        )
    )
    spec = np.asarray(
        grammar_generate(
            model, params, x, mask01, max_new, 2, allowed, nxt, forced, dn,
            spec_width=w,
        )
    )
    np.testing.assert_array_equal(base, spec)


def test_speculative_with_int8_kv_cache(llm_setup):
    model, params, x, mask01, tables = llm_setup
    cfg_q = model.cfg.replace(kv_quant="int8")
    model_q = LlamaModel(cfg_q, None)
    allowed, nxt, forced, dn = _tables_jnp(tables)
    base = np.asarray(
        grammar_generate(
            model_q, params, x, mask01, 16, 2, allowed, nxt, forced, dn,
            spec_width=1,
        )
    )
    spec = np.asarray(
        grammar_generate(
            model_q, params, x, mask01, 16, 2, allowed, nxt, forced, dn,
            spec_width=4,
        )
    )
    np.testing.assert_array_equal(base, spec)


def test_grammar_outputs_always_parse(llm_setup):
    model, params, x, mask01, _ = llm_setup
    tok = ByteTokenizer(vocab_size=260)
    tables = compile_grammar(tok, allow_float=False)
    allowed, nxt, forced, dn = _tables_jnp(tables)
    tokens = np.asarray(
        grammar_generate(
            model, params, x, mask01, 48, 2, allowed, nxt, forced, dn,
            spec_width=4,
        )
    )
    for row in tokens:
        text = tok.decode(row).strip()
        windows = moment_str_to_list(post_process(text))
        assert all(len(w) == 2 for w in windows)
        # complete generations carry no -1 repair markers
        if char_accepts(text, allow_float=False):
            assert [-1, -1] not in windows


def test_tight_budget_still_completes(llm_setup):
    """With budget >= the grammar's minimum completion length, the
    distance mask steers generation to *finish* inside the budget —
    never an unparseable truncation."""
    model, params, x, mask01, tables = llm_setup
    tok = ByteTokenizer(vocab_size=260)
    allowed, nxt, forced, dn = _tables_jnp(tables)
    for budget in (10, 12, 16):
        toks = np.asarray(
            grammar_generate(
                model, params, x, mask01, budget, 2, allowed, nxt, forced,
                dn, spec_width=4,
            )
        )
        assert toks.shape == (2, budget)
        for row in toks:
            text = tok.decode(row).strip()
            assert char_accepts(text), (budget, text)


def test_budget_below_minimum_is_safe(llm_setup):
    """A budget too small to finish anything falls back to best-effort
    grammar-masked output with fixed shapes (no crash, legal tokens)."""
    model, params, x, mask01, tables = llm_setup
    allowed, nxt, forced, dn = _tables_jnp(tables)
    short = np.asarray(
        grammar_generate(
            model, params, x, mask01, 5, 2, allowed, nxt, forced, dn,
            spec_width=4,
        )
    )
    assert short.shape == (2, 5)
    # every emitted token is grammar-legal from its state
    for row in short:
        state = tables.start_state
        for t in row:
            assert tables.allowed[state, t] or t == 2
            state = int(tables.next_state[state, t])


# ---------------------------------------------------------------------------
# end-to-end through the assembly
# ---------------------------------------------------------------------------

def _make_batch(tmp_path, n=2, n_frms=4):
    import json

    from mraudio_tpu.data.dataset import MRDataset, collate

    path = str(tmp_path / "ann.jsonl")
    with open(path, "w") as f:
        for i in range(n):
            f.write(
                json.dumps(
                    {
                        "vid": f"v{i}", "qid": i, "query": f"query {i}",
                        "duration": 150, "relevant_windows": [[10, 30]],
                    }
                )
                + "\n"
            )
    cfg = tiny_data_config(n_frms=n_frms)
    ds = MRDataset(cfg, annotation_path=path)
    return collate([ds.get(i) for i in range(n)], n)


def test_xinstructblip_constrained_end_to_end(tmp_path):
    from mraudio_tpu.models.xinstructblip import XInstructBLIP

    cfg = tiny_model_config().replace(
        constrained_decoding=True, spec_width=4, max_new_tokens=48
    )
    model = XInstructBLIP(cfg, audio_cfg=tiny_data_config().audio)
    params = model.init_params(jax.random.PRNGKey(0))
    batch = _make_batch(tmp_path)
    out = model.generate(params, batch)
    assert len(out) == 2
    for text in out:
        windows = moment_str_to_list(post_process(text))
        assert all(len(w) == 2 for w in windows)
        if char_accepts(text):
            assert [-1, -1] not in windows
