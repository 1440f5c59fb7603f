"""X-InstructBLIP assembly: frozen encoders → Q-Formers → interleaved
LLM sequence → span text.

Functional re-creation of the reference's core model
(``models/xinstructblip.py``), redesigned for XLA:

* Frames/audio-chunks fold into the batch dimension: one jitted pass
  replaces the reference's 60-iteration Python encoder loop
  (``models/xinstructblip.py:262-275``) and its frame-major reorder +
  repeated Q-Former calls (``:280-294``).
* The interleaved sequence — per frame ``[" video: "][32 video tokens]
  [" audio: "][32 audio tokens][" t "]`` then ``[duration][prompt]``
  (``:342-385``) — is built with static per-segment token budgets;
  variable-length text chunks are right-padded inside their budget and
  masked, which the mask-derived position ids make equivalent to the
  reference's dynamic "longest" padding.
* Preprocessing (uint8→normalized frames, waveform→fbank chunks) runs
  on-device in the same jit so the host ships only uint8 frames and raw
  waveforms.

Weight porting from the reference's checkpoints (the key surgery of
``models/xinstructblip.py:614-655,694-735,769-816``) lives in
``mraudio_tpu.models.convert_weights``.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from mraudio_tpu.config import AudioFrontendConfig, XInstructBLIPConfig
from mraudio_tpu.models.beats import BeatsEncoder
from mraudio_tpu.models.eva_vit import EvaViT
from mraudio_tpu.models.layers import LayerNormFp32, gelu_exact, positions_from_mask
from mraudio_tpu.models.llama import LlamaModel
from mraudio_tpu.models.qformer import QFormer
from mraudio_tpu.ops.fbank import beats_frontend
from mraudio_tpu.ops.image import (
    augment_and_normalize,
    normalize_frames,
    rgb_to_yuv420,
    yuv420_to_rgb,
)
from mraudio_tpu.text.prompts import MODALITY_CUES
from mraudio_tpu.text.tokenizer import ByteTokenizer
from mraudio_tpu.infer.generate import (
    grammar_generate,
    greedy_generate,
    lookup_generate,
)


class _Ln(nn.Module):
    """Post-encoder fp32 LayerNorm (``video_ln``/``audio_ln``,
    reference ``models/xinstructblip.py:664,674,822-828``)."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        return LayerNormFp32(epsilon=self.epsilon, name="ln")(x)


class _SaliencyHead(nn.Module):
    """Per-frame saliency scores from the 32 video query tokens."""

    @nn.compact
    def __call__(self, video_tokens: jax.Array) -> jax.Array:
        """(B, T, Q, D) → (B, T) scores."""
        pooled = video_tokens.mean(axis=2).astype(jnp.float32)
        h = nn.Dense(256, param_dtype=jnp.float32, name="fc1")(pooled)
        h = gelu_exact(h)
        return nn.Dense(1, param_dtype=jnp.float32, name="fc2")(h)[..., 0]


class _Proj(nn.Module):
    """Q-Former → LLM projection (``{modality}_llm_proj``,
    reference ``models/xinstructblip.py:706-735``)."""

    features: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        return nn.Dense(
            self.features, dtype=self.dtype, param_dtype=jnp.float32, name="proj"
        )(x)


def _render_timestamps(row, duration, time_format: str) -> list:
    """Per-frame timestamp values under the configured format
    (reference ``utils/utils.py:462-603``); the live path is plain
    integer seconds."""
    if time_format == "seconds_integers":
        return [int(ts) for ts in row]
    if time_format == "relative_integers":
        return [int(round(float(ts) / duration, 2) * 100) for ts in row]
    if time_format == "seconds_floats":
        return [round(float(ts), 2) for ts in row]
    if time_format == "relative_floats":
        return [round(float(ts) / duration, 2) for ts in row]
    if time_format == "framenumbers":
        return list(range(len(row)))
    raise ValueError(f"unknown time_format {time_format!r}")


@dataclasses.dataclass
class TextBatch:
    """Host-tokenized text chunks with static shapes."""

    qformer_ids: np.ndarray       # (B, Lq) instruction for Q-Former conditioning
    qformer_mask: np.ndarray
    ts_ids: np.ndarray            # (B, T, Kts) per-frame timestamp strings
    ts_mask: np.ndarray
    dur_ids: np.ndarray           # (B, Kd)
    dur_mask: np.ndarray
    prompt_ids: np.ndarray        # (B, Lp) left-padded at generate
    prompt_mask: np.ndarray
    concat_ids: Optional[np.ndarray] = None    # (B, Lc) train: input+output splice
    concat_mask: Optional[np.ndarray] = None
    labels: Optional[np.ndarray] = None        # (B, Lc) -100 masked


class XInstructBLIP:
    """Owns the module set + host tokenization; exposes jitted
    ``generate`` / ``loss`` with explicit params (trainer-friendly)."""

    # Reference parity: only LoRA adapters train
    # (models/xinstructblip.py:90-204); the saliency head (a capability
    # addition) trains with them when enabled.
    TRAINABLE_PATTERN = r"(lora_a|lora_b|saliency_head)"

    def __init__(
        self,
        cfg: XInstructBLIPConfig,
        audio_cfg: AudioFrontendConfig | None = None,
        llm_tokenizer=None,
        qformer_tokenizer=None,
    ):
        self.cfg = cfg
        known = {"audio", "video", "image", "pc"}
        schema_only = [m for m in cfg.modalities if m in ("image", "pc")]
        unknown = [m for m in cfg.modalities if m not in known]
        if unknown:
            raise ValueError(f"unknown modalities {unknown}; schema covers "
                             f"{sorted(known)}")
        if schema_only:
            # vicuna7b_v2.yaml documents image/pc entries, but the
            # reference CODE binds only audio+video (MODALITY_TO_CUE,
            # models/xinstructblip.py:206-209) and the MR data path never
            # produces them — schema accepted, behavior absent upstream.
            raise ValueError(
                f"modalities {schema_only} exist in the reference's YAML "
                "schema but have no live code path in the reference (or "
                "here); use audio/video"
            )
        self.audio_cfg = audio_cfg or AudioFrontendConfig()
        self.llm_tokenizer = llm_tokenizer or ByteTokenizer(cfg.llm.vocab_size)
        # fallback tokenizer ids must stay inside the Q-Former embed table
        self.qformer_tokenizer = qformer_tokenizer or ByteTokenizer(cfg.qformer.vocab_size)

        self.vit = EvaViT(cfg.vit)
        self.beats = BeatsEncoder(cfg.beats)
        self.qformer = QFormer(cfg.qformer)
        self.llm = LlamaModel(cfg.llm, cfg.lora if cfg.lora.enabled else None)
        self.video_ln = _Ln()
        self.audio_ln = _Ln()
        self.video_proj = _Proj(cfg.llm.hidden_size)
        self.audio_proj = _Proj(cfg.llm.hidden_size)
        self.saliency_head = _SaliencyHead()

        # Modality cue token ids (reference pre-embeds these once,
        # models/xinstructblip.py:206-217).  The reference call uses the
        # tokenizer default add_special_tokens=True, so every per-frame
        # cue starts with the remapped BOS (</s>, id 2) — reproduced.
        self.cue_ids = {
            m: np.asarray(
                self.llm_tokenizer.encode(MODALITY_CUES[m], add_special_tokens=True),
                np.int32,
            )
            for m in ("video", "audio")
        }

    # ------------------------------------------------------------------
    # Params
    # ------------------------------------------------------------------

    def init_params(self, rng: jax.Array, jit: bool | None = None) -> dict:
        """Random-init the full param tree.

        Production-size stacks run the whole init inside one ``jax.jit``
        dispatch: eager flax init issues thousands of tiny ops, which
        through a remote-dispatch tunnel costs minutes (measured 225 s
        for the full profile; single-dispatch is seconds).  Tiny test
        configs stay eager — a compile would cost more than it saves."""
        if jit is None:
            jit = self.cfg.llm.hidden_size >= 2048
        if jit:
            return jax.jit(self._init_params_eager)(rng)
        return self._init_params_eager(rng)

    def _init_params_eager(self, rng: jax.Array) -> dict:
        cfg = self.cfg
        keys = jax.random.split(rng, 12)
        t_mel = self.audio_cfg.mel_frames_per_chunk
        params = {}
        params["vit"] = self.vit.init(
            keys[0], jnp.zeros((1, cfg.vit.image_size, cfg.vit.image_size, 3), jnp.bfloat16)
        )["params"]
        params["beats"] = self.beats.init(
            keys[1], jnp.zeros((1, t_mel, cfg.beats.num_mel_bins), jnp.float32)
        )["params"]
        params["video_ln"] = self.video_ln.init(
            keys[2], jnp.zeros((1, 1, cfg.vit.width))
        )["params"]
        params["audio_ln"] = self.audio_ln.init(
            keys[3], jnp.zeros((1, 1, cfg.beats.width))
        )["params"]

        q = cfg.qformer.num_query_tokens
        h = cfg.qformer.hidden_size
        for i, (mod, width) in enumerate(
            [("video", cfg.vit.width), ("audio", cfg.beats.width)]
        ):
            params[f"{mod}_qformer"] = self.qformer.init(
                keys[4 + i],
                jnp.zeros((1, q, h)),
                jnp.zeros((1, 4), jnp.int32),
                jnp.ones((1, 4), jnp.int32),
                jnp.zeros((1, 5, width)),
            )["params"]
            params[f"{mod}_query_tokens"] = (
                jax.random.normal(keys[6 + i], (1, q, h)) * cfg.qformer.initializer_range
            )
        params["video_proj"] = self.video_proj.init(keys[8], jnp.zeros((1, h)))["params"]
        params["audio_proj"] = self.audio_proj.init(keys[9], jnp.zeros((1, h)))["params"]
        if cfg.saliency_head:
            params["saliency_head"] = self.saliency_head.init(
                keys[11], jnp.zeros((1, 2, q, cfg.llm.hidden_size))
            )["params"]

        d = cfg.llm.hidden_size
        dummy = jnp.zeros((1, 4, d))
        mask = jnp.ones((1, 1, 4, 4), bool)
        pos = jnp.zeros((1, 4), jnp.int32)
        ids = jnp.zeros((1, 4), jnp.int32)
        params["llm"] = self.llm.init(
            keys[10], dummy, mask, pos, ids, method=LlamaModel.init_all
        )["params"]
        return params

    # ------------------------------------------------------------------
    # Host tokenization
    # ------------------------------------------------------------------

    def prepare_text(
        self,
        text_input: list[str],
        timestamps: np.ndarray,     # (B, T) ints
        duration: list,
        text_output: Optional[list[str]] = None,
    ) -> TextBatch:
        cfg = self.cfg
        b, t = timestamps.shape

        # Reference BertTokenizer call uses default special tokens
        # ([CLS]...[SEP], models/xinstructblip.py:233-238).
        q_enc = self.qformer_tokenizer(
            text_input, max_length=cfg.max_txt_len,
            padding_side="right", truncation_side="left",
            add_special_tokens=True,
        )

        flat_ts = [
            f" {ts} "
            for row, dur in zip(timestamps, duration)
            for ts in _render_timestamps(row, dur, cfg.time_format)
        ]
        ts_enc = self.llm_tokenizer(
            flat_ts, max_length=cfg.tokens_per_timestamp,
            padding_side="right", truncation_side="right",
        )
        # The reference pads timestamps/durations to longest and can never
        # truncate them (models/xinstructblip.py:327-333,368-374); a static
        # budget that clips one would silently corrupt the interleave, so
        # overflow is a hard error (raise the tokens_per_* config).
        if ts_enc.num_truncated:
            worst = flat_ts[int(np.argmax(ts_enc.lengths))]
            raise ValueError(
                f"{ts_enc.num_truncated} timestamp renderings exceed "
                f"tokens_per_timestamp={cfg.tokens_per_timestamp} "
                f"(e.g. {worst!r} -> {int(ts_enc.lengths.max())} tokens); "
                "raise XInstructBLIPConfig.tokens_per_timestamp"
            )
        ts_ids = ts_enc.input_ids.reshape(b, t, cfg.tokens_per_timestamp)
        ts_mask = ts_enc.attention_mask.reshape(b, t, cfg.tokens_per_timestamp)

        dur_enc = self.llm_tokenizer(
            [f"{dur} " for dur in duration], max_length=cfg.tokens_per_duration,
            padding_side="right", truncation_side="right",
        )
        if dur_enc.num_truncated:
            raise ValueError(
                f"{dur_enc.num_truncated} duration renderings exceed "
                f"tokens_per_duration={cfg.tokens_per_duration} "
                f"(max {int(dur_enc.lengths.max())} tokens); raise "
                "XInstructBLIPConfig.tokens_per_duration"
            )

        if text_output is None:
            # Generate: stripped prompt, left padding, no specials
            # (models/xinstructblip.py:223,310-317).
            prompt_enc = self.llm_tokenizer(
                [p.strip() for p in text_input], max_length=cfg.max_txt_len,
                padding_side="left", truncation_side="left",
            )
            return TextBatch(
                qformer_ids=q_enc.input_ids, qformer_mask=q_enc.attention_mask,
                ts_ids=ts_ids, ts_mask=ts_mask,
                dur_ids=dur_enc.input_ids, dur_mask=dur_enc.attention_mask,
                prompt_ids=prompt_enc.input_ids, prompt_mask=prompt_enc.attention_mask,
            )

        # Train: splice [input_real, output_real(+eos, no bos), pad]
        # (concat_text_input_output, models/xinstructblip.py:26-48,484-507)
        # with labels masking pads and the input part (:510-516).
        tok = self.llm_tokenizer
        total = cfg.max_txt_len + cfg.max_output_txt_len
        concat_ids = np.full((b, total), tok.pad_token_id, np.int32)
        concat_mask = np.zeros((b, total), np.int32)
        labels = np.full((b, total), -100, np.int32)
        prompt_ids = np.full((b, cfg.max_txt_len), tok.pad_token_id, np.int32)
        prompt_mask = np.zeros((b, cfg.max_txt_len), np.int32)

        for i, (inp, out) in enumerate(zip(text_input, text_output)):
            in_ids = tok.encode(inp, add_special_tokens=True)[-cfg.max_txt_len :]
            # output carries eos, no bos (the reference tokenizes with bos
            # then splices it off, models/xinstructblip.py:494-507).  The
            # reference's right-truncation to max_output_txt_len happens
            # BEFORE the bos strip, so the effective output budget is
            # max_output_txt_len - 1 tokens — reproduced exactly (the
            # edge only bites when an output hits the budget).
            out_ids = tok.encode(out, add_special_tokens=False) + [tok.eos_token_id]
            out_ids = out_ids[: cfg.max_output_txt_len - 1]
            seq = (in_ids + out_ids)[:total]
            concat_ids[i, : len(seq)] = seq
            concat_mask[i, : len(seq)] = 1
            labels[i, : len(seq)] = seq
            labels[i, : min(len(in_ids), total)] = -100
            prompt_ids[i, : len(in_ids)] = in_ids
            prompt_mask[i, : len(in_ids)] = 1

        return TextBatch(
            qformer_ids=q_enc.input_ids, qformer_mask=q_enc.attention_mask,
            ts_ids=ts_ids, ts_mask=ts_mask,
            dur_ids=dur_enc.input_ids, dur_mask=dur_enc.attention_mask,
            prompt_ids=prompt_ids, prompt_mask=prompt_mask,
            concat_ids=concat_ids, concat_mask=concat_mask, labels=labels,
        )

    # ------------------------------------------------------------------
    # Device computation
    # ------------------------------------------------------------------

    def _encode_modality_tokens(self, params, video_u8, audio_wave, qformer_ids,
                                qformer_mask, n_frms, crop_params=None):
        """uint8 video + waveform → per-frame LLM token embeds.

        ``crop_params`` (B, 5) enables train-time RandomResizedCrop+flip
        on device (the reference's AlproVideoTrainProcessor transform,
        ``processors/alpro_processors.py:40-61``); None = eval preprocessing.

        Returns dict modality → (B, T, Q, D_llm)."""
        cfg = self.cfg
        # Opt-in eval-side encoder int8 (quant_tree.quantize_subtrees):
        # restore bf16 views here, inside the jitted program, where the
        # convert×scale fuses into each matmul's weight read.  A
        # no-quantized-leaves tree passes through at trace time for free.
        from mraudio_tpu.models.quant_tree import dequantize_subtrees

        params = dequantize_subtrees(params, self.ENCODER_PARAM_KEYS)
        out = {}
        b = None

        if "video" in cfg.modalities:
            b, t = video_u8.shape[:2]
            if cfg.video_wire == "yuv420":
                # wire carries I420 planes; RGB reconstruction fuses into
                # the normalize that follows
                video_u8 = yuv420_to_rgb(video_u8)
            if crop_params is not None:
                frames = augment_and_normalize(
                    video_u8, crop_params, cfg.vit.image_size,
                    dtype=jnp.dtype(cfg.vit.dtype),
                )
            else:
                frames = normalize_frames(video_u8, dtype=jnp.dtype(cfg.vit.dtype))
            gsize = cfg.encode_clips_per_pass
            fpp = cfg.encode_frames_per_pass
            if (fpp and b * t > fpp and (b * t) % fpp == 0
                    and cfg.vit.keyframe_interval == 1):
                # Frame-level chunking (also effective at B=1): caps the
                # ViT's fp32 logits temp at fpp frames per pass.
                folded = frames.reshape((b * t,) + frames.shape[2:])
                groups = folded.reshape((b * t // fpp, fpp) + folded.shape[1:])
                feats = jax.lax.map(
                    lambda g: self.vit.apply({"params": params["vit"]}, g),
                    groups,
                )
                feats = feats.reshape((b * t,) + feats.shape[2:])
            elif gsize and b > gsize and b % gsize == 0:
                # One ViT pass per clip group (lax.map): bounds the
                # encoder's fp32 logits temp to gsize*t frames instead of
                # the whole fold (see config.encode_clips_per_pass).
                groups = frames.reshape((b // gsize, gsize * t) + frames.shape[2:])
                feats = jax.lax.map(
                    lambda g: self.vit.apply(
                        {"params": params["vit"]}, g, n_frms=t
                    ),
                    groups,
                )
                feats = feats.reshape((b * t,) + feats.shape[2:])
            else:
                folded = frames.reshape((b * t,) + frames.shape[2:])
                feats = self.vit.apply({"params": params["vit"]}, folded, n_frms=t)
            feats = self.video_ln.apply({"params": params["video_ln"]}, feats)
            out["video"] = self._qformer_project(
                params, "video", feats, b, t, qformer_ids, qformer_mask
            )

        if "audio" in cfg.modalities:
            fbank = beats_frontend(audio_wave, self.audio_cfg, n_frms)
            b, t = fbank.shape[:2]
            gsize = cfg.encode_clips_per_pass
            fpp = cfg.encode_frames_per_pass
            if fpp and b * t > fpp and (b * t) % fpp == 0:
                folded = fbank.reshape((b * t,) + fbank.shape[2:])
                groups = folded.reshape((b * t // fpp, fpp) + folded.shape[1:])
                feats = jax.lax.map(
                    lambda g: self.beats.apply({"params": params["beats"]}, g),
                    groups,
                )
                feats = feats.reshape((b * t,) + feats.shape[2:])
            elif gsize and b > gsize and b % gsize == 0:
                # Same per-clip-group folding as the video branch: the
                # BEATs fold's (B*T, 12, 256, 256) fp32 logits are the
                # next-largest temp after the ViT's.
                groups = fbank.reshape((b // gsize, gsize * t) + fbank.shape[2:])
                feats = jax.lax.map(
                    lambda g: self.beats.apply({"params": params["beats"]}, g),
                    groups,
                )
                feats = feats.reshape((b * t,) + feats.shape[2:])
            else:
                folded = fbank.reshape((b * t,) + fbank.shape[2:])
                feats = self.beats.apply({"params": params["beats"]}, folded)
            feats = self.audio_ln.apply({"params": params["audio_ln"]}, feats)
            out["audio"] = self._qformer_project(
                params, "audio", feats, b, t, qformer_ids, qformer_mask
            )
        return out

    def _qformer_project(self, params, modality, feats, b, t, qformer_ids, qformer_mask):
        cfg = self.cfg
        q = cfg.qformer.num_query_tokens
        query = jnp.broadcast_to(
            params[f"{modality}_query_tokens"], (b * t, q, cfg.qformer.hidden_size)
        )
        ids = jnp.repeat(qformer_ids, t, axis=0)
        mask = jnp.repeat(qformer_mask, t, axis=0)
        hidden = self.qformer.apply(
            {"params": params[f"{modality}_qformer"]}, query, ids, mask, feats
        )
        proj = getattr(self, f"{modality}_proj")
        tokens = proj.apply({"params": params[f"{modality}_proj"]}, hidden[:, :q])
        return tokens.reshape(b, t, q, cfg.llm.hidden_size)

    def _embed_ids(self, params, ids):
        return self.llm.apply(
            {"params": params["llm"]}, method=lambda m, i: m.embed(i), i=ids
        )

    def _build_prefix(self, params, modal_tokens, ts_ids, ts_mask, dur_ids, dur_mask):
        """Interleave per-frame segments + duration → (B, S_prefix, D), mask."""
        cfg = self.cfg
        some = next(iter(modal_tokens.values()))
        b, t, q, d = some.shape

        segs, seg_masks = [], []
        for modality in ("video", "audio"):
            if modality not in modal_tokens:
                continue
            cue = jnp.asarray(self.cue_ids[modality])
            cue_emb = self._embed_ids(params, cue[None])  # (1, Lc, D)
            cue_emb = jnp.broadcast_to(cue_emb[:, None], (b, t, cue.shape[0], d))
            segs += [cue_emb, modal_tokens[modality]]
            seg_masks += [
                jnp.ones((b, t, cue.shape[0]), jnp.int32),
                jnp.ones((b, t, q), jnp.int32),
            ]
        if cfg.interleave_seconds:
            ts_emb = self._embed_ids(params, ts_ids.reshape(b, -1)).reshape(
                b, t, ts_ids.shape[-1], d
            )
            segs.append(ts_emb)
            seg_masks.append(ts_mask)

        frame_block = jnp.concatenate(segs, axis=2).reshape(b, -1, d)
        frame_mask = jnp.concatenate(seg_masks, axis=2).reshape(b, -1)

        dur_emb = self._embed_ids(params, dur_ids)
        prefix = jnp.concatenate([frame_block, dur_emb], axis=1)
        prefix_mask = jnp.concatenate([frame_mask, dur_mask], axis=1)
        return prefix, prefix_mask

    def prefix_mask_host(self, text, n_frms: int) -> np.ndarray:
        """Host-side twin of the mask ``_prefix_and_prompt`` returns.

        The interleave mask is fully determined by the text masks plus
        static token counts (cue lengths, query-token count), so a
        caller that only needs the mask (the serving encode stage) can
        compute it without syncing on the device dispatch — removing
        the one host<->device sync in the encode path."""
        cfg = self.cfg
        b = text.prompt_mask.shape[0]
        t = n_frms
        parts = []
        for m in ("video", "audio"):
            if m in cfg.modalities:
                parts += [
                    np.ones((b, t, len(self.cue_ids[m])), np.int32),
                    np.ones((b, t, cfg.qformer.num_query_tokens), np.int32),
                ]
        if cfg.interleave_seconds:
            parts.append(np.asarray(text.ts_mask, np.int32))
        frame = np.concatenate(parts, axis=2).reshape(b, -1)
        return np.concatenate(
            [frame, np.asarray(text.dur_mask, np.int32),
             np.asarray(text.prompt_mask, np.int32)], axis=1,
        )

    # ------------------------------------------------------------------
    # Public entry points
    # ------------------------------------------------------------------

    @functools.partial(jax.jit, static_argnames=("self", "n_frms"))
    def _prefix_and_prompt(
        self, params, video_u8, audio_wave, qformer_ids, qformer_mask,
        ts_ids, ts_mask, dur_ids, dur_mask, prompt_ids, prompt_mask, n_frms,
    ):
        modal = self._encode_modality_tokens(
            params, video_u8, audio_wave, qformer_ids, qformer_mask, n_frms
        )
        prefix, pmask = self._build_prefix(
            params, modal, ts_ids, ts_mask, dur_ids, dur_mask
        )
        prompt_emb = self._embed_ids(params, prompt_ids)
        embeds = jnp.concatenate([prefix, prompt_emb], axis=1)
        mask = jnp.concatenate([pmask, prompt_mask], axis=1)
        return embeds, mask

    @functools.partial(jax.jit, static_argnames=("self", "n_frms"))
    def _saliency_fn(self, params, video_u8, audio_wave, qformer_ids,
                     qformer_mask, n_frms):
        modal = self._encode_modality_tokens(
            params, video_u8, audio_wave, qformer_ids, qformer_mask, n_frms
        )
        return self.saliency_head.apply(
            {"params": params["saliency_head"]}, modal["video"]
        )

    def saliency_scores(self, params, batch) -> np.ndarray:
        """(B, T) per-frame saliency (requires ``cfg.saliency_head``).

        Standalone path that re-runs the encoders; batched inference
        should use ``generate(..., return_saliency=True)`` instead, which
        reuses the generate pass's modal tokens."""
        n_frms = batch.timestamps.shape[1]
        text = self.prepare_text(
            batch.text_input, np.asarray(batch.timestamps), batch.duration
        )
        return np.asarray(self._saliency_fn(
            params, jnp.asarray(self._wire_video(batch.video)),
            jnp.asarray(batch.audio),
            jnp.asarray(text.qformer_ids), jnp.asarray(text.qformer_mask),
            n_frms=n_frms,
        ))

    def _grammar_arrays(self):
        """Span-grammar tables for constrained decoding, compiled once
        against the LLM tokenizer (text/grammar.py); None when
        ``cfg.constrained_decoding`` is off."""
        if not self.cfg.constrained_decoding:
            return None
        if getattr(self, "_grammar_cache", None) is None:
            from mraudio_tpu.text.grammar import compile_grammar

            # Float windows only for float time formats; the live
            # integer formats keep the int-only grammar (the reference
            # parser coerces float members to -1, text/postprocess.py).
            tables = compile_grammar(
                self.llm_tokenizer,
                allow_float=self.cfg.time_format
                in ("seconds_floats", "relative_floats"),
            )
            allowed, next_state, dist_next = (
                tables.allowed, tables.next_state, tables.dist_next,
            )
            pv = self.cfg.llm.padded_vocab_size
            if pv > allowed.shape[1]:
                # vocab padding (config.vocab_pad_multiple): widen the
                # tables to the padded logits; pad ids are never allowed
                pad = ((0, 0), (0, pv - allowed.shape[1]))
                allowed = np.pad(allowed, pad)  # False
                next_state = np.pad(next_state, pad)
                dist_next = np.pad(dist_next, pad,
                                   constant_values=np.iinfo(np.int32).max // 2)
            self._grammar_cache = {
                "allowed": jnp.asarray(allowed),
                "next_state": jnp.asarray(next_state),
                "forced": jnp.asarray(tables.forced),
                "dist_next": jnp.asarray(dist_next),
            }
        return self._grammar_cache

    @functools.partial(jax.jit, static_argnames=("self", "n_frms"))
    def _generate_tokens(
        self, params, video_u8, audio_wave, qformer_ids, qformer_mask,
        ts_ids, ts_mask, dur_ids, dur_mask, prompt_ids, prompt_mask,
        grammar, n_frms,
    ):
        """Whole inference graph — preprocess, encoders, interleave,
        prefill, decode (+ saliency off the same modal tokens) — in ONE
        jit (one dispatch per batch)."""
        modal = self._encode_modality_tokens(
            params, video_u8, audio_wave, qformer_ids, qformer_mask, n_frms
        )
        prefix, pmask = self._build_prefix(
            params, modal, ts_ids, ts_mask, dur_ids, dur_mask
        )
        prompt_emb = self._embed_ids(params, prompt_ids)
        embeds = jnp.concatenate([prefix, prompt_emb], axis=1)
        mask = jnp.concatenate([pmask, prompt_mask], axis=1)
        if self.cfg.constrained_decoding:
            tokens = grammar_generate(
                self.llm, {"params": params["llm"]}, embeds, mask,
                self.cfg.max_new_tokens, self.llm_tokenizer.eos_token_id,
                grammar["allowed"], grammar["next_state"], grammar["forced"],
                grammar["dist_next"], spec_width=self.cfg.spec_width,
            )
        elif self.cfg.lookup_spec >= 2:
            # Prompt-lookup hint stream: the timestamp/duration/query
            # token ids already in this batch's text plane — real span
            # outputs echo their digits, so drafts hit before any
            # generated history exists (exactness never depends on it).
            b = prompt_ids.shape[0]
            hint_ids = jnp.concatenate(
                [ts_ids.reshape(b, -1), dur_ids, prompt_ids], axis=1
            )
            hint_mask = jnp.concatenate(
                [ts_mask.reshape(b, -1), dur_mask, prompt_mask], axis=1
            )
            tokens = lookup_generate(
                self.llm, {"params": params["llm"]}, embeds, mask,
                self.cfg.max_new_tokens, self.llm_tokenizer.eos_token_id,
                spec_width=self.cfg.lookup_spec,
                hint_ids=hint_ids, hint_mask=hint_mask,
            )
        else:
            tokens = greedy_generate(
                self.llm, {"params": params["llm"]}, embeds, mask,
                self.cfg.max_new_tokens, self.llm_tokenizer.eos_token_id,
            )
        saliency = None
        if self.cfg.saliency_head:
            # reuse the generate pass's video tokens — no second encode
            saliency = self.saliency_head.apply(
                {"params": params["saliency_head"]}, modal["video"]
            )
        return tokens, saliency

    def _wire_video(self, video: np.ndarray) -> np.ndarray:
        """Apply the configured host→device wire format.  A 4-D array is
        already packed I420 (the dataset's ``data.video_wire="yuv420"``
        fast path — the native decoder emits codec planes directly);
        5-D RGB is packed here."""
        video = np.asarray(video)
        if self.cfg.video_wire == "yuv420" and video.ndim == 5:
            return rgb_to_yuv420(video)
        return video

    def device_inputs(self, batch) -> tuple:
        """Start async host->device transfer of the heavy batch arrays;
        call one batch ahead to overlap the transfer with compute."""
        import jax

        return (
            jax.device_put(self._wire_video(batch.video)),
            jax.device_put(batch.audio),
        )

    def generate_submit(self, params, batch, device_inputs=None):
        """Dispatch the whole generate graph WITHOUT blocking on the
        result.  JAX dispatch is asynchronous, so the returned device
        arrays are futures: the caller can submit the next batch (keeping
        the device queue non-empty across the token readback + span-parse
        gap — a real stall through a high-latency dispatch link) and
        collect strings later via :meth:`generate_finalize`."""
        n_frms = batch.timestamps.shape[1]
        text = self.prepare_text(
            batch.text_input, np.asarray(batch.timestamps), batch.duration
        )
        if device_inputs is None:
            device_inputs = self.device_inputs(batch)
        video_dev, audio_dev = device_inputs
        return self._generate_tokens(
            params,
            video_dev,
            audio_dev,
            jnp.asarray(text.qformer_ids), jnp.asarray(text.qformer_mask),
            jnp.asarray(text.ts_ids), jnp.asarray(text.ts_mask),
            jnp.asarray(text.dur_ids), jnp.asarray(text.dur_mask),
            jnp.asarray(text.prompt_ids), jnp.asarray(text.prompt_mask),
            self._grammar_arrays(),
            n_frms=n_frms,
        )

    def generate_finalize(self, pending, return_saliency: bool = False):
        """Block on a :meth:`generate_submit` result and decode strings."""
        tokens, saliency = pending
        tokens = np.array(tokens)
        # id-0 → eos repair before decode (models/xinstructblip.py:393).
        tokens[tokens == 0] = self.llm_tokenizer.eos_token_id
        texts = self.llm_tokenizer.batch_decode(tokens, skip_special_tokens=True)
        texts = [t.strip() for t in texts]
        if return_saliency:
            return texts, (np.asarray(saliency) if saliency is not None else None)
        return texts

    def generate(self, params, batch, device_inputs=None,
                 return_saliency: bool = False):
        """Batched greedy span generation → decoded strings
        (reference ``models/xinstructblip.py:221-397``).

        With ``return_saliency=True`` (needs ``cfg.saliency_head``),
        returns ``(texts, (B, T) saliency)`` computed from the same
        encoder pass."""
        return self.generate_finalize(
            self.generate_submit(params, batch, device_inputs),
            return_saliency=return_saliency,
        )

    # Param subtrees consumed only by _encode_modality_tokens.  Nothing
    # under them is trainable in the default (LoRA [+saliency]) setup,
    # which lets the trainer run the encoders as their own jit program —
    # their 2.6 GB of weights then aren't resident during the LLM
    # backward (the margin that OOMed full-size B=1 training on 16 GB).
    ENCODER_PARAM_KEYS = (
        "vit", "beats", "video_ln", "audio_ln",
        "video_qformer", "audio_qformer",
        "video_query_tokens", "audio_query_tokens",
        "video_proj", "audio_proj",
    )

    @functools.partial(jax.jit, static_argnames=("self", "n_frms"))
    def _loss_fn(
        self, params, video_u8, audio_wave, qformer_ids, qformer_mask,
        ts_ids, ts_mask, dur_ids, dur_mask, concat_ids, concat_mask, labels,
        saliency_labels=None, crop_params=None, dropout_rng=None,
        *, n_frms,
    ):
        modal = self._encode_modality_tokens(
            params, video_u8, audio_wave, qformer_ids, qformer_mask, n_frms,
            crop_params=crop_params,
        )
        return self._loss_from_tokens(
            params, modal, ts_ids, ts_mask, dur_ids, dur_mask,
            concat_ids, concat_mask, labels, saliency_labels,
            dropout_rng=dropout_rng,
        )

    def _loss_from_tokens(
        self, params, modal, ts_ids, ts_mask, dur_ids, dur_mask,
        concat_ids, concat_mask, labels, saliency_labels=None,
        dropout_rng=None,
    ):
        """CE (+ saliency BCE) from precomputed modal tokens; consumes
        only the ``llm`` (+ ``saliency_head``) param subtrees."""
        prefix, pmask = self._build_prefix(
            params, modal, ts_ids, ts_mask, dur_ids, dur_mask
        )
        text_emb = self._embed_ids(params, concat_ids)
        embeds = jnp.concatenate([prefix, text_emb], axis=1)
        mask = jnp.concatenate([pmask, concat_mask], axis=1)
        # prefix positions never contribute loss (empty_targets,
        # models/xinstructblip.py:583-594).
        full_labels = jnp.concatenate(
            [jnp.full(pmask.shape, -100, jnp.int32), labels], axis=1
        )

        b, s, _ = embeds.shape
        causal = jnp.tril(jnp.ones((s, s), bool))[None, None]
        attend = causal & mask[:, None, None, :].astype(bool)
        positions = positions_from_mask(mask)
        # dropout_rng activates LoRA dropout (reference peft LoraConfig
        # dropout=0.05 is live during training — models/model_utils.py:4-27);
        # eval/loss probes pass None and stay deterministic.
        hidden, _ = self.llm.apply(
            {"params": params["llm"]}, embeds, attend, positions,
            kv_valid=mask, causal=True, return_hidden=True,
            deterministic=dropout_rng is None,
            rngs=None if dropout_rng is None else {"dropout": dropout_rng},
        )

        # Shifted CE with -100 ignore, mean over valid targets (HF
        # semantics), computed in sequence chunks: materializing the full
        # (B, S, 32001) fp32 logits (+ a log_softmax copy) costs GBs at
        # QVH scale; per-chunk lm_head + remat keeps it to ~100 MB.
        loss = self._chunked_ce(params, hidden[:, :-1], full_labels[:, 1:])

        # Saliency head: sigmoid BCE against per-frame in-window labels
        # (capability addition; -1 labels are ignored).  Trains jointly
        # with the LoRA CE — the head is in TRAINABLE_PATTERN.
        if self.cfg.saliency_head and saliency_labels is not None:
            scores = self.saliency_head.apply(
                {"params": params["saliency_head"]}, modal["video"]
            ).astype(jnp.float32)
            sl = saliency_labels.astype(jnp.float32)
            valid = sl >= 0
            target = jnp.where(valid, sl, 0.0)
            bce = jnp.maximum(scores, 0) - scores * target + jnp.log1p(
                jnp.exp(-jnp.abs(scores))
            )
            loss = loss + (bce * valid).sum() / jnp.maximum(valid.sum(), 1)
        return loss

    def _chunked_ce(self, params, hidden, labels, chunk: int = 512):
        b, s, d = hidden.shape
        pad = (-s) % chunk
        if pad:
            hidden = jnp.pad(hidden, ((0, 0), (0, pad), (0, 0)))
            labels = jnp.pad(labels, ((0, 0), (0, pad)), constant_values=-100)
            s += pad
        n_chunks = s // chunk
        hidden_c = hidden.reshape(b, n_chunks, chunk, d).transpose(1, 0, 2, 3)
        labels_c = labels.reshape(b, n_chunks, chunk).transpose(1, 0, 2)

        def step(carry, inputs):
            ll_sum, count = carry
            h_blk, l_blk = inputs
            logits = self.llm.apply(
                {"params": params["llm"]},
                method=lambda m, x: m.logits(x),
                x=h_blk,
            )
            valid = l_blk != -100
            safe = jnp.where(valid, l_blk, 0)
            lp = jax.nn.log_softmax(logits, axis=-1)
            tok = jnp.take_along_axis(lp, safe[..., None], axis=-1)[..., 0]
            return (ll_sum + (tok * valid).sum(), count + valid.sum()), None

        (ll_sum, count), _ = jax.lax.scan(
            jax.checkpoint(step, prevent_cse=False),
            (jnp.zeros((), jnp.float32), jnp.zeros((), jnp.int32)),
            (hidden_c, labels_c),
        )
        return -ll_sum / jnp.maximum(count, 1)

    def loss_arrays(self, batch) -> tuple:
        """Host-side text prep → the array tuple ``_loss_fn`` consumes
        (the trainer's uniform model contract)."""
        text = self.prepare_text(
            batch.text_input, np.asarray(batch.timestamps), batch.duration,
            text_output=batch.text_output,
        )
        arrays = (
            self._wire_video(batch.video), np.asarray(batch.audio),
            text.qformer_ids, text.qformer_mask,
            text.ts_ids, text.ts_mask,
            text.dur_ids, text.dur_mask,
            text.concat_ids, text.concat_mask, text.labels,
        )
        if self.cfg.saliency_head:
            arrays = arrays + (self._saliency_labels(batch),)
        return arrays

    @staticmethod
    def _saliency_labels(batch) -> np.ndarray:
        """(B, T) {0,1} per-frame in-window labels from the training
        targets (text_output is ``str(relevant_windows)``); -1 where the
        windows can't be parsed."""
        import ast

        stamps = np.asarray(batch.timestamps)
        labels = np.full(stamps.shape, -1.0, np.float32)
        for i, out in enumerate(batch.text_output):
            try:
                windows = ast.literal_eval(out)
            except (ValueError, SyntaxError):
                continue
            if not isinstance(windows, (list, tuple)):
                continue
            row = np.zeros(stamps.shape[1], np.float32)
            for w in windows:
                if isinstance(w, (list, tuple)) and len(w) == 2:
                    row += (stamps[i] >= w[0]) & (stamps[i] <= w[1])
            labels[i] = np.minimum(row, 1.0)
        return labels

    def loss(self, params, batch, crop_params=None) -> jax.Array:
        """Training forward → scalar CE loss
        (reference ``models/xinstructblip.py:399-606``).  ``crop_params``
        (B, 5) applies the train-time RandomResizedCrop+flip on device
        (ops/image.py::sample_crop_params)."""
        arrays = self.loss_arrays(batch)
        return self._loss_fn(
            params, *(jnp.asarray(a) for a in arrays),
            crop_params=None if crop_params is None else jnp.asarray(crop_params),
            n_frms=batch.timestamps.shape[1],
        )
