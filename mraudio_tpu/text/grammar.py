"""Span-grammar compilation for constrained/speculative decoding.

The reference's live output format is the rigid grammar
``[[start, end], [start, end], ...]`` — ``text_output =
str(ann["relevant_windows"])`` at training time
(``/root/reference/utils/mr_dataset.py:103``) and regex repair +
``ast.literal_eval`` at parse time
(``/root/reference/utils/utils.py:66-132,364-415``).  The reference can
only *repair* malformed generations after the fact (fallback
``"[[-1, -1]]"`` → counted as ``invalid_pred_num`` by the scorer); a
TPU-first decoder can instead **mask the decode logits to the grammar**
so every generation parses by construction, and — because many grammar
states admit exactly one token — commit those *forced* tokens
speculatively, several per model call (``infer/generate.py::
grammar_generate``).

This module builds the token-level tables both features need from a
character-level DFA of the span grammar:

* ``allowed[s, t]``   — token ``t`` may be emitted in DFA state ``s``;
* ``next_state[s, t]``— the state after emitting it;
* ``forced[s]``       — the single allowed token id in ``s`` (or -1).

The compilation is tokenizer-agnostic: any tokenizer exposing
``token_strings()`` (ByteTokenizer, HFTokenizerWrapper) works, so the
tables are exact for the real Llama sentencepiece vocabulary and for the
test-time byte fallback alike.  Multi-character tokens are handled by
simulating their full character path (e.g. a single ``"]]"`` token is
legal exactly where ``"]"`` then ``"]"`` would be).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

# --- character-level DFA ---------------------------------------------------
#
# Regex it encodes, with NUM = (0|[1-9]\d{0,max_digits-1})(\.\d{1,max_digits})?
# (the fraction only with allow_float):
#   " *\[\[NUM, NUM\](, \[NUM, NUM\])*\]" EOS
#
# Matches exactly the strings ``str([[a, b], ...])`` produces for int or
# float windows (Python renders ", " between items), optionally preceded
# by spaces (sentencepiece pieces carry their leading space).  Two
# restrictions are deliberate:
#   * no leading zeros — ``ast.literal_eval`` (the reference parser,
#     ``utils/utils.py:385``) rejects them, and ``str(int)`` never emits
#     them;
#   * digit runs are capped at ``max_digits`` (default 6: beyond any
#     plausible timestamp — ``validate_time_budgets`` sweeps to 10^4 s).
#     Without the cap a weak model can argmax the same digit forever and
#     burn the whole token budget on one unterminated number.

_DIGITS = "0123456789"

START = 0        # optional spaces, then '[' (always state 0)


def _char_transitions(
    allow_float: bool, max_digits: int = 6
) -> tuple[list[dict], int, int]:
    """Build the character DFA; returns (transitions, TERMINAL, DONE).
    State 0 is START; TERMINAL admits only EOS; DONE is absorbing."""
    trans: list[dict] = []

    def new_state() -> int:
        trans.append({})
        return len(trans) - 1

    start = new_state()
    assert start == START
    lb1 = new_state()
    trans[start][" "] = start
    trans[start]["["] = lb1

    def build_number(entry: int, terminators: dict) -> None:
        """Wire NUM transitions out of ``entry``; each terminator char
        maps to its successor state."""

        def finishable(state: int) -> None:
            trans[state].update(terminators)

        zero = new_state()                     # bare '0'
        trans[entry]["0"] = zero
        finishable(zero)
        cur = None
        for i in range(max_digits):
            nxt = new_state()
            if i == 0:
                for d in _DIGITS[1:]:
                    trans[entry][d] = nxt
            else:
                for d in _DIGITS:
                    trans[cur][d] = nxt
            finishable(nxt)
            cur = nxt
        if allow_float:
            frac0 = new_state()                # after '.', need >=1 digit
            trans[zero]["."] = frac0
            # every integer-digit state may start a fraction
            for s in range(frac0 - max_digits, frac0):
                trans[s]["."] = frac0
            fcur = frac0
            for _ in range(max_digits):
                fnxt = new_state()
                for d in _DIGITS:
                    trans[fcur][d] = fnxt
                finishable(fnxt)
                fcur = fnxt

    # first '[' of a window; shared by the opening "[[" and ", ["
    w_start = new_state()
    trans[lb1]["["] = w_start
    comma1 = new_state()
    w_end = new_state()
    trans[comma1][" "] = w_end
    w_close = new_state()
    sep = new_state()
    next_w = new_state()
    terminal = new_state()
    done = new_state()
    trans[w_close][","] = sep
    trans[w_close]["]"] = terminal
    trans[sep][" "] = next_w
    trans[next_w]["["] = w_start
    build_number(w_start, {",": comma1})
    build_number(w_end, {"]": w_close})
    return trans, terminal, done


def char_accepts(
    text: str, allow_float: bool = True, max_digits: int = 6
) -> bool:
    """True iff ``text`` is a complete span string under the DFA
    (reaches TERMINAL) — the pure-character oracle used by tests."""
    trans, terminal, _ = _char_transitions(allow_float, max_digits)
    state = START
    for ch in text:
        state = trans[state].get(ch, -1)
        if state < 0:
            return False
    return state == terminal


@dataclass(frozen=True)
class GrammarTables:
    """Token-level DFA tables (numpy; callers move them to device).

    ``dist_next[s, t]`` is the minimum number of *further* tokens needed
    to finish the grammar (reach the absorbing post-EOS state) after
    emitting ``t`` in state ``s`` — the decode loop masks any token that
    cannot complete within the remaining budget, so generations always
    parse instead of truncating mid-window (disallowed entries hold a
    large sentinel)."""

    allowed: np.ndarray       # (num_states, vocab) bool
    next_state: np.ndarray    # (num_states, vocab) int32
    forced: np.ndarray        # (num_states,) int32; -1 = free choice
    dist_next: np.ndarray     # (num_states, vocab) int32
    eos_id: int
    terminal_state: int       # list closed; only EOS allowed
    done_state: int           # absorbing post-EOS state
    start_state: int = START


def token_strings(tokenizer) -> list[str]:
    """Per-id surface strings for a protocol tokenizer.  Special ids
    (pad/bos/eos/unk and any HF added specials) map to "" so they never
    match grammar characters — EOS is wired explicitly by the compiler."""
    if hasattr(tokenizer, "token_strings"):
        return tokenizer.token_strings()
    raise TypeError(
        f"tokenizer {type(tokenizer).__name__} does not expose token_strings()"
    )


def compile_grammar(
    tokenizer, allow_float: bool = True, max_digits: int = 6
) -> GrammarTables:
    """Compile the span grammar against ``tokenizer``'s vocabulary.

    For every (state, token) pair the token's full character path is
    simulated; the pair is allowed iff every character transition exists.
    EOS is allowed exactly in the terminal state and the absorbing done
    state."""
    strings = token_strings(tokenizer)
    vocab = len(strings)
    eos_id = int(tokenizer.eos_token_id)
    trans, terminal, done = _char_transitions(allow_float, max_digits)
    num_states = len(trans)

    allowed = np.zeros((num_states, vocab), dtype=bool)
    next_state = np.zeros((num_states, vocab), dtype=np.int32)

    # Group tokens by string: the simulation cost is states x distinct
    # strings (a 32k sentencepiece vocab compiles in well under a second).
    by_string: dict[str, list[int]] = {}
    for tid, s in enumerate(strings):
        if s:
            by_string.setdefault(s, []).append(tid)

    for s_str, tids in by_string.items():
        for state in range(num_states):
            cur = state
            for ch in s_str:
                cur = trans[cur].get(ch, -1)
                if cur < 0:
                    break
            if cur >= 0:
                for tid in tids:
                    allowed[state, tid] = True
                    next_state[state, tid] = cur

    allowed[terminal, :] = False
    allowed[done, :] = False
    allowed[terminal, eos_id] = True
    allowed[done, eos_id] = True
    next_state[terminal, eos_id] = done
    next_state[done, eos_id] = done

    counts = allowed.sum(axis=1)
    if not counts.all():
        dead = np.nonzero(counts == 0)[0].tolist()
        raise ValueError(
            f"grammar states {dead} admit no token under this vocabulary — "
            "the tokenizer cannot spell the span format"
        )
    forced = np.where(counts == 1, allowed.argmax(axis=1), -1).astype(np.int32)

    # Min tokens from each state to completion (value iteration over the
    # token graph; the EOS itself counts, matching HF max_new_tokens
    # semantics).  Grammar-forced tokens are always budget-safe: at a
    # forced state dist(s) = 1 + dist(next), so remaining >= dist(s)
    # implies the forced successor still fits.
    INF = 1 << 30
    dist = np.full(num_states, INF, dtype=np.int64)
    dist[done] = 0
    for _ in range(num_states + 1):
        cand = np.where(allowed, 1 + np.minimum(dist, INF - 1)[next_state], INF)
        new = np.minimum(dist, cand.min(axis=1))
        new[done] = 0
        if (new == dist).all():
            break
        dist = new
    if (dist >= INF).any():
        stuck = np.nonzero(dist >= INF)[0].tolist()
        raise ValueError(f"grammar states {stuck} cannot reach completion")
    dist_next = np.where(allowed, dist[next_state], INF).astype(np.int32)

    return GrammarTables(
        allowed=allowed, next_state=next_state, forced=forced,
        dist_next=dist_next, eos_id=eos_id,
        terminal_state=terminal, done_state=done,
    )
