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

from mraudio_tpu.models.llama import LlamaModel, init_cache


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
    max_len = s + max_new_tokens
    cfg = model.cfg

    # Positions: mask-cumsum over the prefix, then +1 per generated token.
    positions = jnp.cumsum(prefix_mask.astype(jnp.int32), axis=-1) - 1
    positions = jnp.maximum(positions, 0)
    last_pos = positions[:, -1]

    # Validity over cache slots: prefix mask then ones as steps land.
    full_mask = jnp.zeros((b, max_len), jnp.int32).at[:, :s].set(prefix_mask)

    cache = init_cache(cfg, b, max_len)

    # Prefill: causal within the prefix, restricted to valid slots.
    q_idx = jnp.arange(s)[:, None]
    k_idx = jnp.arange(max_len)[None, :]
    causal = (k_idx <= q_idx)[None, None]                      # (1,1,S,max)
    pad = full_mask[:, None, None, :].astype(bool)             # (B,1,1,max)
    # return_hidden: the full-sequence lm_head would materialize a
    # (B, S, 32001) logits buffer (657 MB at QVH shape) and burn ~2.8
    # TFLOP — only the last position seeds the decode.
    hidden, cache = model.apply(
        params, prefix_embeds, causal & pad, positions, cache=cache, cache_index=0,
        kv_valid=full_mask, causal=True, return_hidden=True,
    )
    last_logits = model.apply(
        params, method=lambda m, h: m.lm_head(h), h=hidden[:, -1:]
    ).astype(jnp.float32)
    next_id = jnp.argmax(last_logits[:, -1], axis=-1).astype(jnp.int32)  # (B,)

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
