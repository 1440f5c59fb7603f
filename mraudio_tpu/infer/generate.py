"""Batched greedy decoding over a static KV cache.

The decode loop the reference delegates to HF ``generate``
(``models/xinstructblip.py:387-392``: greedy, ``max_new_tokens=64``)
expressed TPU-first: prefill writes the whole multimodal prefix into a
preallocated cache in one pass, then a ``lax.while_loop`` steps the
decoder until every row has emitted EOS or the ``max_new_tokens``
budget is reached — the static output buffer keeps shapes fixed while
the early exit skips most of the budget on real spans (~10 tokens).
Rows that finish keep emitting EOS (HF pads finished rows and the
reference then rewrites pad→eos at ``models/xinstructblip.py:393``;
emitting EOS directly is the same observable string after decode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from mraudio_tpu.models.layers import NEG_INF
from mraudio_tpu.models.llama import LlamaModel, compact_cache, init_cache


def prefill_cache(model, params, prefix_embeds, positions, full_mask,
                  alloc_len: int):
    """Run the prefix through the decoder, writing the KV cache; returns
    ``(hidden_tail, cache)`` where ``hidden_tail`` covers at least the
    last prefix position (all the decode seed needs).

    With ``cfg.prefill_chunk`` the pass runs in static segments: segment
    ``i`` writes cache columns ``[o, o+c)`` and attends everything
    written so far via a static ``q_offset`` — bit-identical to the
    one-shot pass (same cache values, same attention tile sequence) while
    the per-layer (B, S, ...) prefill temps shrink to (B, chunk, ...).
    ``return_hidden`` + last-position lm_head stays the caller's job (a
    full-sequence vocab projection is never materialized)."""
    b, s, _ = prefix_embeds.shape
    chunk = model.cfg.prefill_chunk
    cache = init_cache(model.cfg, b, alloc_len)
    k_idx = jnp.arange(alloc_len)[None, :]
    pad = full_mask[:, None, None, :].astype(bool)
    if not chunk or s <= chunk:
        starts = [0]
    else:
        starts = list(range(0, s, chunk))
    # SnapKV observation window for kv_keep: the last kv_keep_obs queries
    # of the FULL prefix.  Chunks accumulate their window-resident
    # queries' scores (models/llama.py), so chunked == one-shot exactly.
    obs_start = (
        s - min(model.cfg.kv_keep_obs, s) if model.cfg.kv_keep > 0 else None
    )
    hidden = None
    for o in starts:
        c = min(chunk, s - o) if chunk else s
        emb_c = jax.lax.slice_in_dim(prefix_embeds, o, o + c, axis=1)
        pos_c = jax.lax.slice_in_dim(positions, o, o + c, axis=1)
        q_idx = (o + jnp.arange(c))[:, None]
        # absolute causal + padding; columns past this segment are
        # unwritten and masked out of kv_valid too
        attend = ((k_idx <= q_idx)[None, None]) & pad
        written = full_mask * (k_idx < o + c).astype(full_mask.dtype)
        hidden, cache = model.apply(
            params, emb_c, attend, pos_c, cache=cache, cache_index=o,
            kv_valid=written, causal=True, return_hidden=True,
            obs_start=obs_start,
        )
    return hidden, cache


@functools.partial(
    jax.jit,
    static_argnames=("model", "max_new_tokens", "eos_id"),
)
def greedy_generate(
    model: LlamaModel,
    params,
    prefix_embeds: jax.Array,   # (B, S, D)
    prefix_mask: jax.Array,     # (B, S) {0,1}
    max_new_tokens: int,
    eos_id: int,
) -> jax.Array:
    """Returns generated ids (B, max_new_tokens)."""
    b, s, _ = prefix_embeds.shape
    cfg = model.cfg
    # With cfg.kv_keep the prefill cache covers exactly the prefix; the
    # decode loop then runs over the compacted (keep + budget) cache.
    kv_keep = min(cfg.kv_keep, s) if cfg.kv_keep else 0
    alloc_len = s if kv_keep else s + max_new_tokens

    # Positions: mask-cumsum over the prefix, then +1 per generated token.
    positions = jnp.cumsum(prefix_mask.astype(jnp.int32), axis=-1) - 1
    positions = jnp.maximum(positions, 0)
    last_pos = positions[:, -1]

    # Validity over cache slots: prefix mask then ones as steps land.
    full_mask = jnp.zeros((b, alloc_len), jnp.int32).at[:, :s].set(prefix_mask)

    # Prefill (segmented when cfg.prefill_chunk).  return_hidden: the
    # full-sequence lm_head would materialize a (B, S, 32001) logits
    # buffer (657 MB at QVH shape) and burn ~2.8 TFLOP — only the last
    # position seeds the decode.
    hidden, cache = prefill_cache(
        model, params, prefix_embeds, positions, full_mask, alloc_len
    )
    last_logits = model.apply(
        params, method=lambda m, h: m.logits(h), h=hidden[:, -1:]
    ).astype(jnp.float32)
    next_id = jnp.argmax(last_logits[:, -1], axis=-1).astype(jnp.int32)  # (B,)

    if kv_keep:
        # Keep the top-scoring prefix columns per layer (per-layer
        # `valid` rides in the cache); the loop's shared mask covers the
        # kept region, each layer refines it.
        cache = compact_cache(cfg, cache, full_mask, s, max_new_tokens)
        s = kv_keep
        full_mask = jnp.zeros(
            (b, kv_keep + max_new_tokens), jnp.int32
        ).at[:, :kv_keep].set(1)

    # while_loop so the whole batch stops as soon as every row has hit
    # EOS — real spans are ~10 tokens against a 64-token budget, so the
    # early exit saves most decode steps (the reference's HF generate
    # stops early the same way).
    tokens0 = jnp.full((b, max_new_tokens), eos_id, jnp.int32)

    def cond(state):
        t, _, _, _, _, done, _ = state
        return (t < max_new_tokens) & ~jnp.all(done)

    def body(state):
        t, cache, cur_id, cur_pos, mask, done, tokens = state
        tokens = jax.lax.dynamic_update_slice(
            tokens, jnp.where(done, eos_id, cur_id)[:, None], (0, t)
        )
        mask = jax.lax.dynamic_update_slice(
            mask, jnp.ones((b, 1), jnp.int32), (0, s + t)
        )
        embeds = model.apply(params, method=lambda m, ids: m.embed(ids), ids=cur_id[:, None])
        attend = mask[:, None, None, :].astype(bool)
        # kv_valid lets the quantized decode read the int8 cache
        # directly through the chunked kernel (models/llama.py).
        logits, cache = model.apply(
            params, embeds, attend, (cur_pos + 1)[:, None],
            cache=cache, cache_index=s + t, kv_valid=mask,
        )
        nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
        done = done | (cur_id == eos_id)
        nxt = jnp.where(done, eos_id, nxt)
        return (t + 1, cache, nxt, cur_pos + 1, mask, done, tokens)

    state = (
        jnp.array(0), cache, next_id, last_pos, full_mask,
        jnp.zeros((b,), bool), tokens0,
    )
    state = jax.lax.while_loop(cond, body, state)
    return state[-1]  # (B, max_new_tokens), eos-filled tail


def lookup_draft(tokens, emitted, cur_id, spec_width: int,
                 hint_ids=None, hint_mask=None):
    """(B, W-1) draft guesses for exact self-speculation.

    Primary source: the continuation after the most recent prior
    occurrence of ``cur_id`` among the already-committed generated
    tokens.  Fallback source: the most recent occurrence in the per-row
    ``hint_ids`` stream — prompt-lookup drafting (PLD): moment-retrieval
    outputs echo timestamp/duration digits that already appear verbatim
    in the prompt's interleave text, so early in the generation (before
    any history exists) the prompt predicts the continuation.  Final
    fallback: repeat ``cur_id`` (harmless — every draft is verified).

    ``tokens``: (B, L) committed-token buffer; ``emitted``: (B,) count of
    committed tokens per row; ``hint_ids``/``hint_mask``: (B, H) prompt
    token ids + validity (mask optional).  Draft quality affects speed
    only, never output: the verify pass commits exactly the prefix the
    model's own argmax agrees with."""
    W = spec_width
    b, L = tokens.shape
    rows = jnp.arange(b)[:, None]
    hpos = jnp.arange(L)[None, :]
    offs_w = 1 + jnp.arange(W - 1)[None, :]

    committed = hpos < emitted[:, None]                        # (B, L)
    hit = committed & (tokens == cur_id[:, None])              # (B, L)
    any_hist = jnp.any(hit, axis=-1)
    j = jnp.argmax(jnp.where(hit, hpos, -1), axis=-1)          # (B,)
    offs = j[:, None] + offs_w                                 # (B, W-1)
    cont = tokens[rows, jnp.minimum(offs, L - 1)]
    # guesses past the committed region are stale buffer: fall back
    usable = (offs < emitted[:, None]) & any_hist[:, None]
    guesses = jnp.where(usable, cont, cur_id[:, None])

    if hint_ids is not None:
        H = hint_ids.shape[1]
        xpos = jnp.arange(H)[None, :]
        valid = (hint_mask > 0 if hint_mask is not None
                 else jnp.ones(hint_ids.shape, bool))
        xhit = valid & (hint_ids == cur_id[:, None])           # (B, H)
        any_hint = jnp.any(xhit, axis=-1)
        xj = jnp.argmax(jnp.where(xhit, xpos, -1), axis=-1)
        xoffs = xj[:, None] + offs_w
        xcol = jnp.minimum(xoffs, H - 1)
        xcont = hint_ids[rows, xcol]
        xusable = (xoffs < H) & valid[rows, xcol] & any_hint[:, None]
        xguess = jnp.where(xusable, xcont, cur_id[:, None])
        # per-row preference: generated history (adjacent context) wins
        # over the prompt when it has any match at all
        guesses = jnp.where(any_hist[:, None], guesses, xguess)
    return guesses


@functools.partial(
    jax.jit,
    static_argnames=("model", "max_new_tokens", "eos_id", "spec_width"),
)
def lookup_generate(
    model: LlamaModel,
    params,
    prefix_embeds: jax.Array,   # (B, S, D)
    prefix_mask: jax.Array,     # (B, S) {0,1}
    max_new_tokens: int,
    eos_id: int,
    spec_width: int = 4,
    hint_ids: jax.Array = None,     # (B, H) optional prompt-lookup stream
    hint_mask: jax.Array = None,    # (B, H)
) -> jax.Array:
    """Greedy decoding with self-speculation from n-gram lookup —
    bit-identical tokens to :func:`greedy_generate`, fewer decode steps.

    Decode is HBM-bound: every step streams the full weights + KV cache
    whether it scores 1 position or 8, so a W-position verify pass costs
    ~the same wall time as a 1-position step.  Each iteration drafts
    ``W-1`` continuation tokens via n-gram lookup (:func:`lookup_draft`:
    most recent prior occurrence of the current token in the generated
    sequence, falling back to the ``hint_ids`` prompt stream — span
    outputs like ``[[12, 35], [40, 52]]`` repeat their delimiter/digit
    structure heavily AND echo timestamp digits from the prompt), runs
    ONE model pass over all W draft positions (reusing the per-row
    ragged-column machinery of :func:`grammar_generate`), and commits
    the draft prefix the model's own argmax agrees with, plus the
    model's next token.  Worst case
    (nothing accepted) commits 1 token/step — plain greedy throughput;
    anything accepted is pure speedup.  Exactness does not depend on the
    draft: every committed token is either the model's argmax at its
    position or a draft token verified equal to it.

    Counterpart of the reference's second hot loop — HF greedy
    ``generate`` (``models/xinstructblip.py:387-392``) — which has no
    speculation.
    """
    b, s, _ = prefix_embeds.shape
    W = spec_width
    assert 2 <= W <= 16, "spec_width: 2..16 (one attention tile)"
    cfg = model.cfg
    kv_keep = min(cfg.kv_keep, s) if cfg.kv_keep else 0
    alloc_len = s if kv_keep else s + max_new_tokens + W

    positions = jnp.cumsum(prefix_mask.astype(jnp.int32), axis=-1) - 1
    positions = jnp.maximum(positions, 0)
    last_pos = positions[:, -1]

    full_mask = jnp.zeros((b, alloc_len), jnp.int32).at[:, :s].set(prefix_mask)
    hidden, cache = prefill_cache(
        model, params, prefix_embeds, positions, full_mask, alloc_len
    )
    last_logits = model.apply(
        params, method=lambda m, h: m.logits(h), h=hidden[:, -1:]
    ).astype(jnp.float32)[:, -1]                                   # (B, V)
    first = jnp.argmax(last_logits, axis=-1).astype(jnp.int32)     # (B,)

    if kv_keep:
        cache = compact_cache(cfg, cache, full_mask, s, max_new_tokens + W)
        s = kv_keep
        full_mask = jnp.zeros(
            (b, kv_keep + max_new_tokens + W), jnp.int32
        ).at[:, :kv_keep].set(1)
    max_len = s + max_new_tokens + W

    L = max_new_tokens + W
    tokens0 = jnp.full((b, L), eos_id, jnp.int32)
    rows = jnp.arange(b)[:, None]
    jpos = jnp.arange(W)[None, :]
    kcols = jnp.arange(max_len)[None, :]

    def cond(state):
        it, _, _, _, _, _, done, _ = state
        return (it < max_new_tokens) & ~jnp.all(done)

    def body(state):
        it, cache, cur_id, cur_pos, emitted, mask, done, tokens = state

        # 1. Draft: current token + W-1 lookup guesses (generated
        #    history first, prompt hints as the cold-start fallback).
        guesses = lookup_draft(tokens, emitted, cur_id, W,
                               hint_ids, hint_mask)                # (B, W-1)
        draft_ids = jnp.concatenate([cur_id[:, None], guesses], axis=1)

        # 2. One model pass over the W draft positions (per-row columns).
        start_col = s + emitted                                    # (B,)
        cols = start_col[:, None] + jpos                           # (B, W)
        pos_w = (cur_pos + 1)[:, None] + jpos                      # (B, W)
        draft_window = (kcols >= start_col[:, None]) & (
            kcols < (start_col + W)[:, None]
        )
        attend_valid = (mask > 0) | draft_window                   # (B, max_len)
        mask4 = attend_valid[:, None, None, :] & (
            kcols[:, None, None, :] <= cols[:, None, :, None]
        )
        embeds = model.apply(
            params, method=lambda m, ids: m.embed(ids), ids=draft_ids
        )
        logits, new_cache = model.apply(
            params, embeds, mask4, pos_w, cache=cache,
            cache_index=start_col, kv_valid=attend_valid.astype(jnp.int32),
            causal=True,
        )                                                          # (B, W, V)
        model_next = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # (B, W)

        # 3. Verify: draft[i+1] commits iff it equals the model's argmax
        #    after draft[i] and everything before it committed.
        agree = model_next[:, : W - 1] == draft_ids[:, 1:]         # (B, W-1)
        n_agree = jnp.sum(jnp.cumprod(agree.astype(jnp.int32), axis=1), axis=1)
        budget = jnp.maximum(max_new_tokens - emitted, 0)
        accept = jnp.where(done, 0, jnp.minimum(1 + n_agree, budget))

        # Stop committing past the first EOS inside the accepted prefix.
        is_eos = draft_ids == eos_id                               # (B, W)
        eos_seen = jnp.cumsum(is_eos.astype(jnp.int32), axis=1)
        first_eos_len = jnp.sum((eos_seen == 0).astype(jnp.int32), axis=1) + 1
        accept = jnp.minimum(accept, first_eos_len)

        commit = jpos < accept[:, None]                            # (B, W)
        out_col = jnp.where(commit, emitted[:, None] + jpos, L - 1)
        tokens = tokens.at[rows, out_col].set(
            jnp.where(commit, draft_ids, eos_id)
        )
        mask = mask.at[rows, cols].max(commit.astype(mask.dtype))

        last = jnp.maximum(accept - 1, 0)
        nxt = jnp.take_along_axis(model_next, last[:, None], axis=1)[:, 0]
        emitted = emitted + accept
        done = (
            done
            | jnp.any(commit & is_eos, axis=1)
            | (emitted >= max_new_tokens)
        )
        nxt = jnp.where(done, eos_id, nxt)
        return (it + 1, new_cache, nxt, cur_pos + accept, emitted,
                mask, done, tokens)

    state = (
        jnp.array(0), cache, first, last_pos,
        jnp.zeros((b,), jnp.int32), full_mask, jnp.zeros((b,), bool), tokens0,
    )
    state = jax.lax.while_loop(cond, body, state)
    return state[-1][:, :max_new_tokens]


@functools.partial(
    jax.jit,
    static_argnames=("model", "max_new_tokens", "eos_id", "spec_width"),
)
def grammar_generate(
    model: LlamaModel,
    params,
    prefix_embeds: jax.Array,   # (B, S, D)
    prefix_mask: jax.Array,     # (B, S) {0,1}
    max_new_tokens: int,
    eos_id: int,
    allowed: jax.Array,         # (NS, V) bool — grammar token mask per state
    next_state: jax.Array,      # (NS, V) int32 — DFA transition
    forced: jax.Array,          # (NS,) int32 — single allowed token or -1
    dist_next: jax.Array,       # (NS, V) int32 — min tokens to finish after t
    spec_width: int = 4,
) -> jax.Array:
    """Grammar-constrained greedy decoding with forced-token speculation.

    Every emitted token is masked to the span grammar compiled in
    ``text/grammar.py`` — the output *always* parses (the reference can
    only regex-repair after the fact, ``utils/utils.py:66-132``).  Decode
    is HBM-bound (each step streams the full weights + KV cache), so
    steps, not tokens, are what cost time: whenever the grammar state
    admits exactly one token, that token needs no model choice — each
    iteration therefore commits 1 free-choice token plus up to
    ``spec_width - 1`` grammar-forced continuation tokens, and runs ONE
    model pass over all of them (computing their KV and the logits that
    pick the next free token).  Identical output to ``spec_width=1``,
    token for token; rows advance raggedly (per-row cache columns).

    Budget-aware: tokens whose grammar continuation cannot finish within
    the remaining ``max_new_tokens`` budget are masked out
    (``dist_next``), so a generation *completes* — shorter windows/lists
    near the budget edge instead of an unparseable truncation.  If the
    budget is already too small to finish at all, the distance mask is
    dropped (best-effort prefix).

    Returns generated ids (B, max_new_tokens), eos-filled after each
    row's end.
    """
    b, s, _ = prefix_embeds.shape
    W = spec_width
    assert 1 <= W <= 16, "spec_width: 1..16 (one attention tile)"
    cfg = model.cfg
    num_states, vocab = allowed.shape
    # + W slack: a draft may overhang the budget; overhanging columns are
    # never committed (the accept count is capped) so they are attention-
    # invisible, but the write itself needs allocated columns.
    kv_keep = min(cfg.kv_keep, s) if cfg.kv_keep else 0
    alloc_len = s if kv_keep else s + max_new_tokens + W

    positions = jnp.cumsum(prefix_mask.astype(jnp.int32), axis=-1) - 1
    positions = jnp.maximum(positions, 0)
    last_pos = positions[:, -1]

    full_mask = jnp.zeros((b, alloc_len), jnp.int32).at[:, :s].set(prefix_mask)
    hidden, cache = prefill_cache(
        model, params, prefix_embeds, positions, full_mask, alloc_len
    )
    last_logits = model.apply(
        params, method=lambda m, h: m.logits(h), h=hidden[:, -1:]
    ).astype(jnp.float32)[:, -1]                                   # (B, V)

    if kv_keep:
        cache = compact_cache(cfg, cache, full_mask, s, max_new_tokens + W)
        s = kv_keep
        full_mask = jnp.zeros(
            (b, kv_keep + max_new_tokens + W), jnp.int32
        ).at[:, :kv_keep].set(1)
    max_len = s + max_new_tokens + W

    def masked_pick(states, logits_bv, remaining):
        """Grammar + budget mask, then argmax.  ``remaining``: (B,)
        tokens of budget left for the pick and its continuation."""
        al = allowed[states]                             # (B, V)
        fits = dist_next[states] <= (remaining - 1)[:, None]
        ok = al & fits
        # budget smaller than any completion: fall back to grammar-only
        ok = jnp.where(jnp.any(ok, axis=-1, keepdims=True), ok, al)
        return jnp.argmax(
            jnp.where(ok, logits_bv, NEG_INF), axis=-1
        ).astype(jnp.int32)

    start = jnp.zeros((b,), jnp.int32)                  # DFA start state
    first = masked_pick(
        start, last_logits, jnp.full((b,), max_new_tokens, jnp.int32)
    )
    g0 = next_state[start, first]

    tokens0 = jnp.full((b, max_new_tokens + W), eos_id, jnp.int32)
    rows = jnp.arange(b)[:, None]
    jpos = jnp.arange(W)[None, :]
    kcols = jnp.arange(max_len)[None, :]

    def cond(state):
        it, _, _, _, _, _, _, done, _ = state
        return (it < max_new_tokens) & ~jnp.all(done)

    def body(state):
        it, cache, cur_id, g, cur_pos, emitted, mask, done, tokens = state

        # 1. Extend the draft with grammar-forced tokens (static unroll).
        draft = [cur_id]
        states = [g]
        ok = ~done
        cur_g = g
        n_valid = ok.astype(jnp.int32)
        for _ in range(W - 1):
            f = forced[cur_g]                                    # (B,)
            ok = ok & (f >= 0)
            draft.append(jnp.where(ok, f, eos_id))
            cur_g = jnp.where(ok, next_state[cur_g, jnp.maximum(f, 0)], cur_g)
            states.append(cur_g)
            n_valid = n_valid + ok.astype(jnp.int32)
        draft_ids = jnp.stack(draft, axis=1)                     # (B, W)
        states_arr = jnp.stack(states, axis=1)                   # (B, W)
        accept = jnp.clip(n_valid, 0, max_new_tokens - emitted)  # (B,)

        # 2. One model pass over the W draft positions (per-row columns).
        start_col = s + emitted                                  # (B,)
        cols = start_col[:, None] + jpos                         # (B, W)
        pos_w = (cur_pos + 1)[:, None] + jpos                    # (B, W)
        draft_window = (kcols >= start_col[:, None]) & (
            kcols < (start_col + W)[:, None]
        )
        attend_valid = (mask > 0) | draft_window                 # (B, max_len)
        # dense-path mask: per-row causal against absolute columns (the
        # chunked kernel gets the same via kv_valid + q_abs)
        mask4 = attend_valid[:, None, None, :] & (
            kcols[:, None, None, :] <= cols[:, None, :, None]
        )
        embeds = model.apply(
            params, method=lambda m, ids: m.embed(ids), ids=draft_ids
        )
        logits, new_cache = model.apply(
            params, embeds, mask4, pos_w, cache=cache,
            cache_index=start_col, kv_valid=attend_valid.astype(jnp.int32),
            causal=True,
        )                                                        # (B, W, V)

        # 3. Commit the accepted prefix; pick the next free-choice token
        #    from the logits at the last accepted position.
        commit = jpos < accept[:, None]                          # (B, W)
        out_col = jnp.where(commit, emitted[:, None] + jpos,
                            max_new_tokens + W - 1)              # dummy tail
        tokens = tokens.at[rows, out_col].set(
            jnp.where(commit, draft_ids, eos_id)
        )
        mask = mask.at[rows, cols].max(commit.astype(mask.dtype))

        last = jnp.maximum(accept - 1, 0)
        g_last = jnp.take_along_axis(states_arr, last[:, None], axis=1)[:, 0]
        logit_last = jnp.take_along_axis(
            logits, last[:, None, None], axis=1
        )[:, 0]                                                  # (B, V)
        emitted = emitted + accept
        nxt = masked_pick(g_last, logit_last, max_new_tokens - emitted)
        done = (
            done
            | jnp.any(commit & (draft_ids == eos_id), axis=1)
            | (emitted >= max_new_tokens)
        )
        nxt = jnp.where(done, eos_id, nxt)
        g = jnp.where(done, g_last, next_state[g_last, nxt])
        return (it + 1, new_cache, nxt, g, cur_pos + accept, emitted,
                mask, done, tokens)

    state = (
        jnp.array(0), cache, first, g0, last_pos,
        jnp.zeros((b,), jnp.int32), full_mask, jnp.zeros((b,), bool), tokens0,
    )
    state = jax.lax.while_loop(cond, body, state)
    return state[-1][:, :max_new_tokens]
