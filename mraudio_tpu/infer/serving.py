"""Slot-based continuous batching for moment-retrieval serving.

The batched eval driver (``infer/evaluate.py``) processes uniform
batches; a *serving* deployment receives requests at arbitrary times.
This engine keeps ``max_slots`` decode lanes live on the chip:

* new requests prefill in one jitted batched call (``submit_many`` —
  simultaneous arrivals share the prefill matmuls instead of running
  batch-of-1 each) and their KV slices are scattered into free slots of
  the shared cache while other slots keep decoding;
* every engine step advances ALL active slots by one token in a single
  jitted call — slots may sit at different sequence lengths, handled by
  per-slot cache write columns (one-hot scatter inside the attention);
* a slot frees the moment its row hits EOS or the token budget, so a
  short answer never waits on the longest request in flight — the
  continuous-batching win over static batching.

Everything on device is fixed-shape: slot count, prefix length, and
token budget are compile-time constants; occupancy lives in host masks.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from mraudio_tpu.infer.generate import prefill_cache
from mraudio_tpu.models.llama import LlamaModel, compact_cache, init_cache


@dataclasses.dataclass
class Request:
    request_id: int
    prefix_embeds: np.ndarray   # (S, D)
    prefix_mask: np.ndarray     # (S,)


@dataclasses.dataclass
class Completion:
    request_id: int
    token_ids: list


class ContinuousBatcher:
    def __init__(
        self,
        model: LlamaModel,
        params,
        prefix_len: int,
        max_new_tokens: int,
        eos_id: int,
        max_slots: int = 4,
        max_prefill_batch: int = 0,
        steps_per_dispatch: int = 1,
        spec_width: int = 1,
    ):
        self.model = model
        self.params = params
        self.prefix_len = prefix_len
        self.max_new_tokens = max_new_tokens
        self.eos_id = eos_id
        self.max_slots = max_slots
        # Cap the batched-admission prefill width (0 = up to max_slots).
        # The prefill graph's temps are O(B·S): at QVH full size a 16 GB
        # chip holds 4 decode slots but not a 4-wide prefill next to
        # them, so slots and admission width are independent knobs.
        self.max_prefill_batch = max_prefill_batch or max_slots
        # Decode micro-steps per jitted dispatch.  Every engine step costs
        # a host->device round trip; over a remote/tunneled link (or any
        # host-driven deployment) that latency, not the decode matmuls,
        # dominates per-token time.  K>1 runs a lax.scan of K steps in one
        # dispatch — token-identical up to EOS (each row's math never
        # depends on the others); a row that finishes mid-window holds its
        # slot until the window ends, so K trades admission granularity
        # for dispatch amortization.
        self.steps_per_dispatch = max(1, steps_per_dispatch)
        # cfg.kv_keep: each request's prefill cache is compacted to the
        # top-keep columns before it enters a slot, so a slot's
        # steady-state region is (keep + budget) columns — at QVH full
        # size (5.3k -> ~1.5k) that is ~3.5x the slot count in the same
        # HBM, and every decode step reads ~3.5x less KV.
        self.kv_keep = (
            min(model.cfg.kv_keep, prefix_len) if model.cfg.kv_keep else 0
        )
        # Self-speculative decode (the engine twin of
        # infer/generate.py::lookup_generate): each dispatch scores W
        # draft positions per slot — the current token plus W-1 host-side
        # bigram-lookup guesses from that slot's own emitted tokens — and
        # commits the verified prefix.  Decode is HBM-bound, so the
        # W-wide pass costs ~one 1-wide step; every accepted guess
        # removes a whole dispatch.  Token-identical to spec_width=1.
        self.spec_width = max(1, spec_width)
        self.slot_prefix = self.kv_keep or prefix_len
        # +W slack columns: a draft may overhang the budget; overhanging
        # writes are never marked valid and get overwritten.
        self.max_len = self.slot_prefix + max_new_tokens + (
            self.spec_width - 1 if self.spec_width > 1 else 0
        )

        self.cache = init_cache(model.cfg, max_slots, self.max_len)
        if self.kv_keep:
            # compacted slot caches carry a per-layer `valid` leaf — the
            # shared cache needs the same tree structure for _write_slot
            vshape = (max_slots, self.max_len)
            if model.cfg.scan_layers:
                self.cache["valid"] = jnp.zeros(
                    (model.cfg.num_layers,) + vshape, jnp.int32
                )
            else:
                for layer in self.cache:
                    layer["valid"] = jnp.zeros(vshape, jnp.int32)
        self.valid = np.zeros((max_slots, self.max_len), np.int32)
        self.positions = np.zeros((max_slots,), np.int32)  # last RoPE position
        self.lengths = np.full((max_slots,), prefix_len, np.int32)  # next write col
        self.cur_ids = np.zeros((max_slots,), np.int32)
        self.emitted: list[list[int]] = [[] for _ in range(max_slots)]
        self.slot_request: list[Optional[int]] = [None] * max_slots
        self.active = np.zeros((max_slots,), bool)

        self._prefill = jax.jit(self._prefill_fn)
        self._decode = jax.jit(self._decode_fn, donate_argnums=(1,))
        self._decode_window = jax.jit(self._decode_window_fn, donate_argnums=(1,))
        self._decode_spec = jax.jit(self._decode_spec_fn, donate_argnums=(1,))
        self._write_slots = jax.jit(self._write_slots_fn, donate_argnums=(0,))

    # ------------------------------------------------------------------

    def _prefill_fn(self, params, embeds, prefix_mask):
        """Batched prefill of N requests over caches sized to one slot's
        region.  N is a compile-time shape — ``submit_many`` buckets the
        arrival count to powers of two so the jit compiles O(log slots)
        variants, not one per count."""
        b = embeds.shape[0]
        s = self.prefix_len
        alloc = s if self.kv_keep else self.max_len
        positions = jnp.maximum(jnp.cumsum(prefix_mask, axis=-1) - 1, 0)
        pmask_full = jnp.zeros((b, alloc), jnp.int32).at[:, :s].set(prefix_mask)
        # segmented when cfg.prefill_chunk; return_hidden + last-position
        # lm_head: the full-sequence vocab logits are never read past
        # [:, -1] (see infer/generate.py).
        hidden, cache = prefill_cache(
            self.model, params, embeds, positions, pmask_full, alloc
        )
        last_logits = self.model.apply(
            params, method=lambda m, h: m.lm_head(h), h=hidden[:, -1:]
        ).astype(jnp.float32)
        next_ids = jnp.argmax(last_logits[:, -1], axis=-1).astype(jnp.int32)
        if self.kv_keep:
            cache = compact_cache(
                self.model.cfg, cache, pmask_full, s, self.max_new_tokens
            )
        return cache, next_ids, positions[:, -1]

    def _write_slots_fn(self, cache, batch_cache, slots):
        # scatters every cache leaf (k/v, plus scales under kv_quant, plus
        # per-layer `valid` under kv_keep) for the first len(slots)
        # prefilled rows into their slots in one call — padded bucket rows
        # are trimmed here, inside the jit, so the trim+scatter is one
        # dispatch; the slot axis is 0 in the per-layer-list layout and 1
        # under cfg.scan_layers (leaves carry a leading num_layers axis)
        n = slots.shape[0]
        if self.model.cfg.scan_layers:
            upd = lambda dst, src: dst.at[:, slots].set(
                src[:, :n].astype(dst.dtype)
            )
        else:
            upd = lambda dst, src: dst.at[slots].set(src[:n].astype(dst.dtype))
        return jax.tree_util.tree_map(upd, cache, batch_cache)

    def _decode_window_fn(self, params, cache, cur_ids, positions, valid,
                          lengths, active):
        """``steps_per_dispatch`` decode micro-steps in one dispatch.

        Emits the token written at each micro-step (``cur_ids`` at entry,
        then each argmax) — identical, row-wise, to repeated ``_decode``
        calls: rows never read each other's state.  Inactive rows are
        frozen (no valid/position/length advance); their KV writes land
        on a never-valid column and are overwritten at admission, exactly
        as in the single-step path."""
        rows = jnp.arange(self.max_slots)
        a_i32 = active.astype(jnp.int32)

        def micro(carry, _):
            cache, cur_ids, positions, valid, lengths = carry
            col = jnp.minimum(lengths, self.max_len - 1)
            valid = valid.at[rows, col].max(a_i32)
            embeds = self.model.apply(
                params, method=lambda m, ids: m.embed(ids), ids=cur_ids[:, None]
            )
            attend = valid[:, None, None, :].astype(bool)
            logits, cache = self.model.apply(
                params, embeds, attend, (positions + 1)[:, None],
                cache=cache, cache_index=col, kv_valid=valid,
            )
            nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
            emitted = cur_ids
            cur_ids = jnp.where(active, nxt, cur_ids)
            return (cache, cur_ids, positions + a_i32, valid, lengths + a_i32), emitted

        carry, toks = jax.lax.scan(
            micro, (cache, cur_ids, positions, valid, lengths),
            None, length=self.steps_per_dispatch,
        )
        return carry + (toks,)

    def _decode_spec_fn(self, params, cache, draft_ids, positions, valid,
                        lengths, active):
        """One W-position verify pass over every slot's draft.

        Row b's draft occupies cache columns [lengths[b], lengths[b]+W)
        (per-row ragged, exactly the multi-position machinery of
        ``lookup_generate``).  Returns the model's argmax after each
        draft position; the HOST decides the accepted prefix and updates
        valid/lengths/positions — unaccepted draft columns stay invalid
        and are overwritten by the next dispatch's writes."""
        W = self.spec_width
        jpos = jnp.arange(W)[None, :]
        kcols = jnp.arange(self.max_len)[None, :]
        start = jnp.minimum(lengths, self.max_len - W)
        cols = start[:, None] + jpos                               # (B, W)
        draft_window = (kcols >= start[:, None]) & (kcols < (start + W)[:, None])
        attend_valid = (valid > 0) | (draft_window & active[:, None])
        mask4 = attend_valid[:, None, None, :] & (
            kcols[:, None, None, :] <= cols[:, None, :, None]
        )
        embeds = self.model.apply(
            params, method=lambda m, ids: m.embed(ids), ids=draft_ids
        )
        pos_w = (positions + 1)[:, None] + jpos
        logits, cache = self.model.apply(
            params, embeds, mask4, pos_w, cache=cache,
            cache_index=start, kv_valid=attend_valid.astype(jnp.int32),
            causal=True,
        )
        return jnp.argmax(logits, axis=-1).astype(jnp.int32), cache  # (B, W)

    def _decode_fn(self, params, cache, cur_ids, positions, valid, write_cols):
        embeds = self.model.apply(
            params, method=lambda m, ids: m.embed(ids), ids=cur_ids[:, None]
        )
        attend = valid[:, None, None, :].astype(bool)
        logits, cache = self.model.apply(
            params, embeds, attend, (positions + 1)[:, None],
            cache=cache, cache_index=write_cols, kv_valid=valid,
        )
        return jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32), cache

    # ------------------------------------------------------------------

    def free_slots(self) -> int:
        return int((~self.active).sum())

    def submit(self, request: Request) -> bool:
        """Prefill a request into a free slot.  False if no slot free."""
        return self.submit_many([request]) == 1

    def submit_many(self, requests: list) -> int:
        """Prefill up to ``free_slots()`` of ``requests`` in ONE batched
        jitted call and scatter their KV into free slots.  Returns how
        many were admitted (a prefix of the list); the rest stay the
        caller's to resubmit.

        The batch is padded up to the next power of two (by repeating the
        last row — an all-zero mask row would NaN the softmax) so the
        prefill jit compiles at most log2(max_slots)+1 shapes; padded
        rows' outputs are discarded and never touch the slot cache."""
        free = np.where(~self.active)[0]
        n = min(len(requests), len(free), self.max_prefill_batch)
        if n == 0:
            return 0
        take, slots = requests[:n], free[:n]

        bucket = 1
        while bucket < n:
            bucket *= 2
        embeds = np.stack(
            [r.prefix_embeds for r in take]
            + [take[-1].prefix_embeds] * (bucket - n)
        )
        masks = np.stack(
            [r.prefix_mask for r in take] + [take[-1].prefix_mask] * (bucket - n)
        )
        batch_cache, first_ids, last_pos = self._prefill(
            self.params, jnp.asarray(embeds), jnp.asarray(masks)
        )
        self.cache = self._write_slots(
            self.cache, batch_cache, jnp.asarray(slots)
        )
        first_ids = np.asarray(first_ids)
        last_pos = np.asarray(last_pos)
        for i, (request, slot) in enumerate(zip(take, slots)):
            slot = int(slot)
            self.valid[slot] = 0
            if self.kv_keep:
                # kept columns: the shared mask covers the region; each
                # layer's own `valid` leaf (in the cache) refines it
                self.valid[slot, : self.slot_prefix] = 1
            else:
                self.valid[slot, : self.prefix_len] = np.asarray(request.prefix_mask)
            self.positions[slot] = int(last_pos[i])
            self.lengths[slot] = self.slot_prefix
            self.cur_ids[slot] = int(first_ids[i])
            self.emitted[slot] = []
            self.slot_request[slot] = request.request_id
            self.active[slot] = True
        return n

    def step(self) -> list[Completion]:
        """Advance every active slot by one token (``steps_per_dispatch``
        tokens per call when configured)."""
        if not self.active.any():
            return []
        if self.spec_width > 1:
            return self._step_spec()
        if self.steps_per_dispatch > 1:
            return self._step_window()

        active_idx = np.where(self.active)[0]
        # the token being written becomes attendable this step
        for i in active_idx:
            self.valid[i, self.lengths[i]] = 1

        nxt, self.cache = self._decode(
            self.params,
            self.cache,
            jnp.asarray(self.cur_ids),
            jnp.asarray(self.positions),
            jnp.asarray(self.valid),
            jnp.asarray(self.lengths),
        )
        nxt = np.asarray(nxt)

        completions = []
        for i in active_idx:
            token = int(self.cur_ids[i])
            self.emitted[i].append(token)
            done = token == self.eos_id or len(self.emitted[i]) >= self.max_new_tokens
            if done:
                completions.append(Completion(self.slot_request[i], self.emitted[i]))
                self.active[i] = False
                self.slot_request[i] = None
                self.valid[i] = 0
            else:
                self.cur_ids[i] = int(nxt[i])
                self.positions[i] += 1
                self.lengths[i] += 1
        return completions

    def _draft_for_slot(self, i: int) -> list[int]:
        """(W,) draft: the pending token plus W-1 bigram-lookup guesses
        from this slot's emitted history (fallback: repeat — harmless,
        drafts are verified)."""
        W = self.spec_width
        cur = int(self.cur_ids[i])
        hist = self.emitted[i]
        guesses = []
        for j in range(len(hist) - 1, -1, -1):
            if hist[j] == cur:
                guesses = hist[j + 1 : j + W]
                break
        draft = [cur] + list(guesses)
        draft += [cur] * (W - len(draft))
        return draft

    def _step_spec(self) -> list[Completion]:
        W = self.spec_width
        drafts = np.zeros((self.max_slots, W), np.int32)
        for i in np.where(self.active)[0]:
            drafts[i] = self._draft_for_slot(i)

        model_next, self.cache = self._decode_spec(
            self.params,
            self.cache,
            jnp.asarray(drafts),
            jnp.asarray(self.positions),
            jnp.asarray(self.valid),
            jnp.asarray(self.lengths),
            jnp.asarray(self.active),
        )
        model_next = np.asarray(model_next)          # (max_slots, W)

        completions = []
        for i in np.where(self.active)[0]:
            budget = self.max_new_tokens - len(self.emitted[i])
            accept = 1
            while (
                accept < W
                and accept < budget
                and drafts[i, accept] == model_next[i, accept - 1]
                and drafts[i, accept - 1] != self.eos_id
            ):
                accept += 1
            finished = False
            start = int(self.lengths[i])
            for k in range(accept):
                token = int(drafts[i, k])
                self.emitted[i].append(token)
                self.valid[i, min(start + k, self.max_len - 1)] = 1
                if token == self.eos_id or len(self.emitted[i]) >= self.max_new_tokens:
                    accept = k + 1
                    completions.append(
                        Completion(self.slot_request[i], self.emitted[i])
                    )
                    self.active[i] = False
                    self.slot_request[i] = None
                    self.valid[i] = 0
                    finished = True
                    break
            if not finished:
                self.cur_ids[i] = int(model_next[i, accept - 1])
                self.positions[i] += accept
                self.lengths[i] += accept
        return completions

    def _step_window(self) -> list[Completion]:
        (self.cache, cur_ids, positions, valid, lengths, toks) = (
            self._decode_window(
                self.params,
                self.cache,
                jnp.asarray(self.cur_ids),
                jnp.asarray(self.positions),
                jnp.asarray(self.valid),
                jnp.asarray(self.lengths),
                jnp.asarray(self.active),
            )
        )
        toks = np.asarray(toks)                     # (K, max_slots)
        cur_ids, positions = np.asarray(cur_ids), np.asarray(positions)
        valid, lengths = np.array(valid), np.asarray(lengths)  # valid: writable copy

        completions = []
        for i in np.where(self.active)[0]:
            finished = False
            for k in range(self.steps_per_dispatch):
                token = int(toks[k, i])
                self.emitted[i].append(token)
                if token == self.eos_id or len(self.emitted[i]) >= self.max_new_tokens:
                    completions.append(
                        Completion(self.slot_request[i], self.emitted[i])
                    )
                    self.active[i] = False
                    self.slot_request[i] = None
                    finished = True
                    break
            if not finished:
                self.cur_ids[i] = int(cur_ids[i])
                self.positions[i] = int(positions[i])
                self.lengths[i] = int(lengths[i])
        self.valid = valid
        self.valid[~self.active] = 0
        return completions

    def run_to_completion(self) -> list[Completion]:
        out = []
        while self.active.any():
            out.extend(self.step())
        return out
