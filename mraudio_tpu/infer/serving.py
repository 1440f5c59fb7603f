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
  decode state stays device-resident and dispatches are pipelined two
  deep, so the host round trip per token overlaps device compute;
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

from mraudio_tpu.models.llama import LlamaModel, compact_cache, init_cache


@dataclasses.dataclass
class Request:
    request_id: int
    # (S, D).  May be a jax.Array: device-resident embeds are stacked on
    # device at admission, so a request produced by an on-device encoder
    # pass never round-trips through the host.  On a remote-attached
    # device that round trip (~44 MB bf16 at QVH full size, D2H then H2D
    # again at admission) costs multiple seconds per request — more than
    # the encoder pass itself.
    prefix_embeds: np.ndarray
    prefix_mask: np.ndarray     # (S,) — small; stays host-side
    # Optional (H,) prompt-lookup hint stream (valid token ids only):
    # spec_width>1 drafting falls back to these before any history
    # exists — moment-retrieval outputs echo timestamp/duration digits
    # already present in the prompt text.  Drafts are always verified.
    hint_ids: Optional[np.ndarray] = None


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
        pipeline_depth: int = 2,
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
        # The spec path is host-in-the-loop (drafts come from each slot's
        # emitted history), so it can neither window micro-steps nor
        # pipeline dispatches: reject the contradictory ask instead of
        # silently running a config the stats would then misreport.
        if self.spec_width > 1 and self.steps_per_dispatch > 1:
            raise ValueError(
                "spec_width > 1 and steps_per_dispatch > 1 are mutually "
                "exclusive: speculative verify is itself the multi-"
                "position dispatch"
            )
        if self.spec_width > 1:
            pipeline_depth = 1  # reported depth = what actually runs
        # Decode-dispatch pipelining (greedy/window path): all decode row
        # state (cur token, positions, valid mask, write columns) lives ON
        # DEVICE, so dispatch k+1 chains directly off dispatch k's
        # device-resident outputs and the host reads back dispatch k's
        # tokens while k+1 computes.  On a remote-attached device the
        # host round trip per token (dispatch RPC + token readback) is
        # what dominates decode time; with depth 2 it fully overlaps
        # device compute.  Token-exact: host bookkeeping (EOS, budget,
        # slot freeing) lags one dispatch — a freed row's in-flight ghost
        # step computes one extra (discarded) token, and admission
        # overwrites the row's device state wholesale, so outputs are
        # identical to depth 1.  depth 1 = process each dispatch's tokens
        # synchronously (the pre-pipelining engine).
        self.pipeline_depth = max(1, pipeline_depth)
        self._inflight: list[tuple] = []
        self.slot_prefix = self.kv_keep or prefix_len
        # +W slack columns: a draft may overhang the budget; overhanging
        # writes are never marked valid and get overwritten.
        self.max_len = self.slot_prefix + max_new_tokens + (
            self.spec_width - 1 if self.spec_width > 1 else 0
        )
        # Incremental (chunked) admission: the prefill runs as one
        # dispatch PER cfg.prefill_chunk segment (``admission_step``),
        # against a per-admission batch cache that only touches the
        # shared slot cache at the final scatter — so the serve loop can
        # interleave decode dispatches between segments and active slots
        # never stall behind a whole 5k-token prefill (the r3 artifact's
        # 50 s p95 was exactly that stall: every decode dispatch's cache
        # input data-depended on the in-flight admission scatter).
        chunk = model.cfg.prefill_chunk
        if not chunk or prefix_len <= chunk:
            self._chunk_starts = [(0, prefix_len)]
        else:
            self._chunk_starts = [
                (o, min(chunk, prefix_len - o))
                for o in range(0, prefix_len, chunk)
            ]
        # SnapKV observation window start (absolute column) — identical
        # to infer/generate.py::prefill_cache so engine tokens match the
        # offline path bit for bit.
        self._obs_start = (
            prefix_len - min(model.cfg.kv_keep_obs, prefix_len)
            if model.cfg.kv_keep > 0 else None
        )
        self._admission: Optional[dict] = None
        self._reserved = np.zeros((max_slots,), bool)
        self._chunk_jits: dict = {}
        # request ids cancelled while their admission was in flight; the
        # admission epilogue frees their slots the moment it lands
        self._cancelled: set = set()

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
        # Host row state drives the spec path (drafts come from each
        # slot's emitted history, inherently host-in-the-loop); the
        # greedy/window path keeps the same state on device (below) and
        # never syncs it back.
        self.valid = np.zeros((max_slots, self.max_len), np.int32)
        self.positions = np.zeros((max_slots,), np.int32)  # last RoPE position
        self.lengths = np.full((max_slots,), prefix_len, np.int32)  # next write col
        self.cur_ids = np.zeros((max_slots,), np.int32)
        # Device row state for the pipelined greedy/window path.
        self.dvalid = jnp.zeros((max_slots, self.max_len), jnp.int32)
        self.dpos = jnp.zeros((max_slots,), jnp.int32)
        self.dlen = jnp.full((max_slots,), self.slot_prefix, jnp.int32)
        self.dcur = jnp.zeros((max_slots,), jnp.int32)
        self.emitted: list[list[int]] = [[] for _ in range(max_slots)]
        self.hints: list[Optional[np.ndarray]] = [None] * max_slots
        self.slot_request: list[Optional[int]] = [None] * max_slots
        self.active = np.zeros((max_slots,), bool)

        # donate the admission cache through the epilogue only when it
        # passes through same-shape; compaction changes leaf shapes, so
        # the donated buffers would be unusable (warning, no benefit)
        self._finish = jax.jit(
            self._finish_fn, donate_argnums=() if self.kv_keep else (1,)
        )
        self._decode_window = jax.jit(
            self._decode_window_fn, donate_argnums=(1, 2, 3, 4, 5)
        )
        self._decode_spec = jax.jit(self._decode_spec_fn, donate_argnums=(1,))
        self._write_slots = jax.jit(self._write_slots_fn, donate_argnums=(0,))
        self._admit_rows = jax.jit(
            self._admit_rows_fn, donate_argnums=(0, 1, 2, 3)
        )

    # ------------------------------------------------------------------

    def _chunk_fn(self, o: int, c: int):
        """Jitted prefill of ONE static segment [o, o+c) — the dispatch
        unit of incremental admission.  The segment math mirrors
        ``infer/generate.py::prefill_cache`` exactly (same attend mask,
        same ``kv_valid`` frontier, same static ``obs_start``), so the
        chunk sequence writes the identical cache the one-shot jit did;
        the per-admission cache is donated through the chain.  Bucketed
        batch widths x len(starts) offsets bound the compiled variants
        to O(log slots * ceil(S/chunk))."""
        key = (o, c)
        if key not in self._chunk_jits:
            alloc = self.prefix_len if self.kv_keep else self.max_len

            def fn(params, cache, embeds, positions, pmask_full):
                emb_c = jax.lax.slice_in_dim(embeds, o, o + c, axis=1)
                pos_c = jax.lax.slice_in_dim(positions, o, o + c, axis=1)
                k_idx = jnp.arange(alloc)[None, :]
                pad = pmask_full[:, None, None, :].astype(bool)
                q_idx = (o + jnp.arange(c))[:, None]
                attend = ((k_idx <= q_idx)[None, None]) & pad
                written = pmask_full * (k_idx < o + c).astype(pmask_full.dtype)
                return self.model.apply(
                    params, emb_c, attend, pos_c, cache=cache, cache_index=o,
                    kv_valid=written, causal=True, return_hidden=True,
                    obs_start=self._obs_start,
                )

            self._chunk_jits[key] = jax.jit(fn, donate_argnums=(1,))
        return self._chunk_jits[key]

    def _finish_fn(self, params, cache, hidden, pmask_full):
        """Admission epilogue: last-position lm_head seeds each row's
        first token; under ``kv_keep`` the per-request cache compacts to
        the top-keep columns before the slot scatter."""
        last_logits = self.model.apply(
            params, method=lambda m, h: m.logits(h), h=hidden[:, -1:]
        ).astype(jnp.float32)
        next_ids = jnp.argmax(last_logits[:, -1], axis=-1).astype(jnp.int32)
        if self.kv_keep:
            # extra_cols must cover the whole slot decode region — the
            # token budget PLUS the spec-draft slack columns — so the
            # compacted per-request cache scatters 1:1 into the slot
            # cache (max_len = slot_prefix + budget + W-1 slack).
            cache = compact_cache(
                self.model.cfg, cache, pmask_full, self.prefix_len,
                self.max_len - self.slot_prefix,
            )
        return cache, next_ids

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
        then each argmax) — identical, row-wise, to K single-step
        dispatches: rows never read each other's state.  Inactive rows are
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

    def _admit_rows_fn(self, dcur, dpos, dvalid, dlen, slots, first_ids,
                       last_pos, valid_rows):
        """Scatter freshly-prefilled row state into the device decode
        state — the pipelined twin of the host-array writes in
        ``submit_many``.  ``first_ids``/``last_pos`` come straight from
        the prefill dispatch (never synced to host), so admission is a
        fully async device-side chain: prefill → KV scatter → row-state
        scatter, overlapping any in-flight decode readback."""
        n = slots.shape[0]
        dcur = dcur.at[slots].set(first_ids[:n])
        dpos = dpos.at[slots].set(last_pos[:n])
        dvalid = dvalid.at[slots].set(valid_rows)
        dlen = dlen.at[slots].set(self.slot_prefix)
        return dcur, dpos, dvalid, dlen

    # ------------------------------------------------------------------

    def free_slots(self) -> int:
        return int((~self.active & ~self._reserved).sum())

    def submit(self, request: Request) -> bool:
        """Prefill a request into a free slot.  False if no slot free."""
        return self.submit_many([request]) == 1

    def submit_many(self, requests: list) -> int:
        """Prefill up to ``free_slots()`` of ``requests`` (batched, one
        admission) and scatter their KV into free slots, draining every
        chunk dispatch synchronously.  Returns how many were admitted (a
        prefix of the list); the rest stay the caller's to resubmit.
        The incremental twin is ``begin_admission`` + ``admission_step``,
        which lets the caller interleave decode dispatches between
        prefill chunks — token-identical (same dispatches, same order
        within the admission)."""
        n = self.begin_admission(requests)
        while self._admission is not None:
            self.admission_step()
        return n

    def admission_pending(self) -> bool:
        return self._admission is not None

    def begin_admission(self, requests: list) -> int:
        """Reserve slots + stack embeds for up to ``max_prefill_batch``
        requests; returns the admitted count (0 if an admission is
        already in flight).  The prefill itself runs via
        ``admission_step`` — one chunk dispatch per call — so the serve
        loop keeps decode lanes flowing during admission.

        The batch is padded up to the next power of two (by repeating the
        last row — an all-zero mask row would NaN the softmax) so the
        prefill jits compile at most log2(max_slots)+1 widths; padded
        rows' outputs are discarded and never touch the slot cache."""
        if self._admission is not None:
            return 0
        free = np.where(~self.active & ~self._reserved)[0]
        n = min(len(requests), len(free), self.max_prefill_batch)
        if n == 0:
            return 0
        take, slots = requests[:n], free[:n]

        bucket = 1
        while bucket < n:
            bucket *= 2
        # jnp.stack keeps device-resident embeds on device (np inputs are
        # uploaded exactly as before); masks are tiny and stay host-math.
        embeds = jnp.stack(
            [r.prefix_embeds for r in take]
            + [take[-1].prefix_embeds] * (bucket - n)
        )
        masks = np.stack(
            [np.asarray(r.prefix_mask) for r in take]
            + [np.asarray(take[-1].prefix_mask)] * (bucket - n)
        ).astype(np.int32)
        s = self.prefix_len
        alloc = s if self.kv_keep else self.max_len
        positions = np.maximum(np.cumsum(masks, axis=-1) - 1, 0).astype(
            np.int32
        )
        pmask_full = np.zeros((bucket, alloc), np.int32)
        pmask_full[:, :s] = masks
        self._admission = {
            "take": take,
            "slots": slots,
            "n": n,
            "cache": init_cache(self.model.cfg, bucket, alloc),
            "embeds": embeds,
            "positions": jnp.asarray(positions),
            "pmask": jnp.asarray(pmask_full),
            "masks": masks,
            "last_pos": positions[:, -1],
            "hidden": None,
            "chunk": 0,
        }
        self._reserved[slots] = True
        return n

    def admission_step(self) -> bool:
        """Dispatch the next admission stage: one prefill chunk, or (all
        chunks done) the epilogue — lm_head seed + optional compaction +
        slot scatter + row-state scatter — after which the admitted rows
        are live.  Returns True when the admission completed."""
        ad = self._admission
        assert ad is not None, "no admission in flight"
        if ad["chunk"] < len(self._chunk_starts):
            o, c = self._chunk_starts[ad["chunk"]]
            hidden, cache = self._chunk_fn(o, c)(
                self.params, ad["cache"], ad["embeds"], ad["positions"],
                ad["pmask"],
            )
            ad["cache"], ad["hidden"] = cache, hidden
            ad["chunk"] += 1
            return False
        batch_cache, first_ids = self._finish(
            self.params, ad["cache"], ad["hidden"], ad["pmask"]
        )
        take, slots, n = ad["take"], ad["slots"], ad["n"]
        last_pos = ad["last_pos"]
        self.cache = self._write_slots(
            self.cache, batch_cache, jnp.asarray(slots)
        )
        self._finish_bookkeeping(take, slots, n, first_ids, last_pos)
        self._reserved[slots] = False
        self._admission = None
        return True

    def _finish_bookkeeping(self, take, slots, n, first_ids, last_pos):
        if self.spec_width > 1:
            # host row state (drafting reads it every step)
            first_ids_h = np.asarray(first_ids)
            last_pos_h = np.asarray(last_pos)
            for i, (request, slot) in enumerate(zip(take, slots)):
                slot = int(slot)
                self.valid[slot] = 0
                if self.kv_keep:
                    # kept columns: the shared mask covers the region;
                    # each layer's own `valid` leaf (in the cache)
                    # refines it
                    self.valid[slot, : self.slot_prefix] = 1
                else:
                    self.valid[slot, : self.prefix_len] = np.asarray(
                        request.prefix_mask
                    )
                self.positions[slot] = int(last_pos_h[i])
                self.lengths[slot] = self.slot_prefix
                self.cur_ids[slot] = int(first_ids_h[i])
        else:
            # device row state: no host sync anywhere in admission
            valid_rows = np.zeros((n, self.max_len), np.int32)
            if self.kv_keep:
                valid_rows[:, : self.slot_prefix] = 1
            else:
                for i, request in enumerate(take):
                    valid_rows[i, : self.prefix_len] = np.asarray(
                        request.prefix_mask
                    )
            self.dcur, self.dpos, self.dvalid, self.dlen = self._admit_rows(
                self.dcur, self.dpos, self.dvalid, self.dlen,
                jnp.asarray(slots), first_ids, last_pos,
                jnp.asarray(valid_rows),
            )
        for request, slot in zip(take, slots):
            slot = int(slot)
            self.emitted[slot] = []
            self.hints[slot] = (
                np.asarray(request.hint_ids)
                if request.hint_ids is not None else None
            )
            self.slot_request[slot] = request.request_id
            self.active[slot] = True
            if request.request_id in self._cancelled:
                # cancelled mid-admission: free the slot immediately
                # (the prefill work is sunk; nothing decodes)
                self._cancelled.discard(request.request_id)
                self.active[slot] = False
                self.slot_request[slot] = None

    def cancel(self, request_id: int) -> bool:
        """Free ``request_id``'s slot immediately (deadline expiry /
        client disconnect) — the reference has no serving path at all,
        so this is engine-native behavior.  Safe at any point in the
        request's life: active mid-decode (the slot stops dispatching at
        the next step; tokens from dispatches already in flight are
        dropped by the snapshot guard in ``_process_readback``), queued
        inside an in-flight admission (freed right after the admission
        epilogue lands), or unknown (returns False).  Every OTHER slot's
        token stream is bit-identical to a run without the cancellation
        — rows never read each other's state
        (tests/test_serving_load.py)."""
        for i in range(self.max_slots):
            if self.active[i] and self.slot_request[i] == request_id:
                self.active[i] = False
                self.slot_request[i] = None
                self.emitted[i] = []
                self.hints[i] = None
                return True
        ad = self._admission
        if ad is not None and any(
            r.request_id == request_id for r in ad["take"]
        ):
            self._cancelled.add(request_id)
            return True
        return False

    def step(self) -> list[Completion]:
        """Advance every active slot by ``steps_per_dispatch`` tokens.

        Greedy/window path: dispatches chain off device-resident state;
        with ``pipeline_depth`` 2 the tokens returned are those of the
        PREVIOUS dispatch (read back while the new one computes), so the
        first call after admission returns [] and completions surface one
        dispatch later — same tokens, same order per request."""
        if not self.active.any() and not self._inflight:
            return []
        if self.spec_width > 1:
            return self._step_spec()
        return self._step_pipelined()

    def _step_pipelined(self) -> list[Completion]:
        if self.active.any():
            (self.cache, self.dcur, self.dpos, self.dvalid, self.dlen,
             toks) = self._decode_window(
                self.params, self.cache, self.dcur, self.dpos, self.dvalid,
                self.dlen, jnp.asarray(self.active),
            )
            # snapshot request ids: a slot freed+readmitted before this
            # dispatch's readback must not absorb its ghost tokens
            self._inflight.append(
                (toks, self.active.copy(), list(self.slot_request))
            )
        completions: list[Completion] = []
        while self._inflight and (
            len(self._inflight) >= self.pipeline_depth
            or not self.active.any()
        ):
            completions.extend(self._process_readback())
        return completions

    def _process_readback(self) -> list[Completion]:
        toks, snap_active, snap_req = self._inflight.pop(0)
        toks = np.asarray(toks)                      # (K, max_slots) sync
        completions = []
        for i in np.where(snap_active)[0]:
            if not self.active[i] or self.slot_request[i] != snap_req[i]:
                continue                             # ghost: freed/readmitted
            for k in range(toks.shape[0]):
                token = int(toks[k, i])
                self.emitted[i].append(token)
                if (token == self.eos_id
                        or len(self.emitted[i]) >= self.max_new_tokens):
                    completions.append(
                        Completion(self.slot_request[i], self.emitted[i])
                    )
                    self.active[i] = False
                    self.slot_request[i] = None
                    break
        if not self.active.any():
            # everything left in flight is ghost work for freed slots
            self._inflight.clear()
        return completions

    def _draft_for_slot(self, i: int) -> list[int]:
        """(W,) draft: the pending token plus W-1 lookup guesses — from
        this slot's emitted history first, then the request's prompt-
        lookup hint stream (outputs echo timestamp digits already in the
        prompt), then repeat (harmless: drafts are verified)."""
        W = self.spec_width
        cur = int(self.cur_ids[i])
        hist = self.emitted[i]
        guesses = []
        for j in range(len(hist) - 1, -1, -1):
            if hist[j] == cur:
                guesses = hist[j + 1 : j + W]
                break
        if not guesses and self.hints[i] is not None:
            hints = self.hints[i]
            hits = np.where(hints[:-1] == cur)[0]
            if len(hits):
                j = int(hits[-1])
                guesses = hints[j + 1 : j + W].tolist()
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

    def reset(self):
        """Return the engine to an idle, empty state WITHOUT dropping the
        jit wrappers or reallocating the slot cache.

        A production serving process keeps ONE engine alive for its
        lifetime; a driver that tears the engine down per measurement run
        re-pays the per-instance jit re-trace plus compilation-cache
        deserialization every run (~1-4 s per jitted callable through a
        remote runtime — measured as ~20 s of a 45 s serve-bench run).
        Slot KV needs no zeroing: admission overwrites an admitted slot's
        cache rows and row state wholesale, and inactive slots are never
        read (their columns sit behind ``valid``/``active`` masks)."""
        self._inflight.clear()
        self._admission = None
        self._cancelled.clear()
        self._reserved[:] = False
        self.valid[:] = 0
        self.positions[:] = 0
        self.lengths[:] = self.prefix_len
        self.cur_ids[:] = 0
        self.emitted = [[] for _ in range(self.max_slots)]
        self.hints = [None] * self.max_slots
        self.slot_request = [None] * self.max_slots
        self.active[:] = False

    def close(self):
        """Release device state NOW — slot cache, decode row state, any
        in-flight admission — and drop the jit wrappers.

        The jitted callables close over bound methods of ``self``, so an
        engine instance is a reference CYCLE: dropping the last external
        reference does not free it until a cyclic-GC pass, and until
        then the multi-GB slot cache stays resident.  A driver that
        builds engines back-to-back (serve sweeps, bench repeats) OOMs
        the next engine's first encode against the previous engine's
        ghost cache (measured at the full-size deployable config, where
        the chip runs within tens of MB of the 16 GB line).  The engine
        is unusable after ``close``."""
        self._inflight.clear()
        self._chunk_jits.clear()
        self._admission = None
        for name in ("cache", "dvalid", "dpos", "dlen", "dcur", "_finish",
                     "_decode_window", "_decode_spec", "_write_slots",
                     "_admit_rows"):
            setattr(self, name, None)

    def run_to_completion(self) -> list[Completion]:
        out = []
        while self._admission is not None:
            self.admission_step()
        while self.active.any() or self._inflight:
            out.extend(self.step())
        return out
