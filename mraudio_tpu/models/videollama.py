"""VideoLLaMA-style audio-visual backbone (second model family).

The reference wraps the external VideoLLaMA2 package as a black box
(``models/videollama.py:1-25``: ``model_init`` + ``mm_infer``, video
modality, greedy, inference-only, batch element 0 only, exceptions
swallowed to ``"error"``).  Capability-wise that is: a CLIP-class frame
encoder and an audio branch, a spatial-temporal connector that
downsamples frame tokens before the LLM, and a causal LM producing the
span text — behind the same ``generate(samples) -> list[str]`` duck
contract the drivers use (``evaluate.py:44``, ``utils/trainer.py:165``).

This implementation rebuilds that architecture from this framework's own
TPU-native components (EVA-ViT encoder, BEATs audio branch, Llama
decoder) with a VideoLLaMA2-style STC connector:

* frames fold into the batch axis through the ViT;
* the connector pools space 2x2 and time ``temporal_stride``x around a
  linear projector (RegionalSTC downsampling, the shape of VideoLLaMA2's
  conv connector) — so 60 frames of 256 patch tokens become a few
  hundred LLM tokens;
* the audio branch mean-pools BEATs tokens per chunk and projects them.

Improvements over the reference wrapper, by design: full-batch
generation (not element 0 only), a working training path (the
reference's ``VideoLLaMA`` is not an ``nn.Module`` and cannot train —
``utils/trainer.py:56-69`` would crash), and no silent ``"error"``
catch-all.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from mraudio_tpu.config import (
    AudioFrontendConfig,
    BeatsConfig,
    LlamaConfig,
    LoraConfig,
    ViTConfig,
    _ConfigBase,
)
from mraudio_tpu.infer.generate import greedy_generate, lookup_generate
from mraudio_tpu.models.beats import BeatsEncoder
from mraudio_tpu.models.eva_vit import EvaViT
from mraudio_tpu.models.layers import gelu_exact, positions_from_mask
from mraudio_tpu.models.llama import LlamaModel
from mraudio_tpu.ops.fbank import beats_frontend
from mraudio_tpu.ops.image import augment_and_normalize, normalize_frames
from mraudio_tpu.text.tokenizer import ByteTokenizer
from dataclasses import dataclass, field


@dataclass(frozen=True)
class VideoLLaMAConfig(_ConfigBase):
    vit: ViTConfig = field(default_factory=ViTConfig)
    beats: BeatsConfig = field(default_factory=BeatsConfig)
    llm: LlamaConfig = field(default_factory=LlamaConfig)
    lora: LoraConfig = field(default_factory=lambda: LoraConfig(enabled=False))
    spatial_pool: int = 2         # 2x2 spatial token pooling
    temporal_stride: int = 4      # frames pooled per connector step
    max_txt_len: int = 128
    max_output_txt_len: int = 64
    max_new_tokens: int = 64
    system_prompt: str = ""
    # Vision-tower normalization.  Input-plane contract knob (see
    # docs/DIVERGENCES.md "VideoLLaMA2 input-plane contract"): CLIP
    # towers use these defaults; VideoLLaMA2.1's SigLIP tower normalizes
    # with mean=std=(0.5, 0.5, 0.5) — set these at conversion time to
    # match whichever tower the checkpoint carries.
    image_mean: tuple = (0.48145466, 0.4578275, 0.40821073)
    image_std: tuple = (0.26862954, 0.26130258, 0.27577711)
    # Self-speculative decoding width (0/1 = plain greedy) — see
    # XInstructBLIPConfig.lookup_spec; bit-identical tokens.
    lookup_spec: int = 0


def tiny_videollama_config() -> VideoLLaMAConfig:
    return VideoLLaMAConfig(
        vit=ViTConfig(image_size=28, patch_size=14, width=32, depth=2, num_heads=2,
                      mlp_dim=64),
        beats=BeatsConfig(num_mel_bins=16, patch_size=4, patch_stride=4, conv_dim=16,
                          width=32, depth=2, num_heads=2, mlp_dim=64,
                          conv_pos_kernel=8, conv_pos_groups=2,
                          rel_pos_buckets=16, rel_pos_max_distance=32),
        llm=LlamaConfig(vocab_size=260, hidden_size=64, num_layers=2, num_heads=4,
                        num_kv_heads=4, intermediate_size=128),
        spatial_pool=1,
        temporal_stride=2,
        max_txt_len=48,
        max_output_txt_len=24,
        max_new_tokens=8,
    )


class STCConnector(nn.Module):
    """Spatial-temporal connector: pool space+time, project to LLM width."""

    out_features: int
    spatial_pool: int
    temporal_stride: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, frame_tokens: jax.Array) -> jax.Array:
        """frame_tokens: (B, T, P, D) patch tokens (no cls).
        Returns (B, T//ts * P//(sp*sp), out_features)."""
        b, t, p, d = frame_tokens.shape
        g = int(round(p ** 0.5))
        sp, ts = self.spatial_pool, self.temporal_stride

        x = frame_tokens.reshape(b, t, g, g, d)
        # spatial average pool sp x sp
        x = x.reshape(b, t, g // sp, sp, g // sp, sp, d).mean(axis=(3, 5))
        # temporal average pool over stride
        x = x.reshape(b, t // ts, ts, g // sp, g // sp, d).mean(axis=2)
        x = x.reshape(b, -1, d)

        h = nn.Dense(self.out_features, dtype=self.dtype, param_dtype=jnp.float32,
                     name="proj_in")(x)
        h = gelu_exact(h)
        return nn.Dense(self.out_features, dtype=self.dtype, param_dtype=jnp.float32,
                        name="proj_out")(h)


class AudioProjector(nn.Module):
    out_features: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, chunk_tokens: jax.Array) -> jax.Array:
        """(B, T, S, D) BEATs tokens → (B, T, out): mean pool per chunk +
        2-layer MLP."""
        pooled = chunk_tokens.mean(axis=2)
        h = nn.Dense(self.out_features, dtype=self.dtype, param_dtype=jnp.float32,
                     name="fc1")(pooled)
        h = gelu_exact(h)
        return nn.Dense(self.out_features, dtype=self.dtype, param_dtype=jnp.float32,
                        name="fc2")(h)


def videollama21_av_config(n_frms: int = 60) -> "VideoLLaMAConfig":
    """The VideoLLaMA2.1-7B-AV checkpoint's architecture, expressible
    config-only (VERDICT r3 #6; ``/root/reference/models/videollama.py:
    5-6`` loads it as a black box from the audio_visual branch):

    * vision tower: SigLIP-so400m-patch14-384 — 384², no class token,
      width 1152, 27 layers, gelu_tanh MLPs, 0.5/0.5/0.5 normalization;
    * decoder: Qwen2-7B-Instruct — hidden 3584, 28 heads / 4 KV heads
      (GQA), intermediate 18944, q/k/v biases, rope theta 1e6,
      vocab 152064;
    * audio tower: BEATs (as 2.1-AV), STC connector pooling to the LLM.

    ``convert_videollama`` routes the merged 2.1-AV state dict onto this
    config (SigLIP layout by key detection, Qwen2 biases via
    ``attention_bias``) — weight-load day needs no code changes."""
    grid = 384 // 14  # 27 — odd, so spatial pooling stays off
    return VideoLLaMAConfig(
        vit=ViTConfig(
            image_size=384, patch_size=14, width=1152, depth=27,
            num_heads=16, mlp_dim=4304, use_class_token=False,
            mlp_act="gelu_tanh",
        ),
        beats=BeatsConfig(),
        llm=LlamaConfig(
            vocab_size=152064, hidden_size=3584, num_layers=28,
            num_heads=28, num_kv_heads=4, intermediate_size=18944,
            attention_bias=True, rope_theta=1e6, rms_norm_eps=1e-6,
            max_seq_len=32768,
        ),
        spatial_pool=1 if grid % 2 else 2,
        temporal_stride=next(d for d in (4, 2, 1) if n_frms % d == 0),
        image_mean=(0.5, 0.5, 0.5),
        image_std=(0.5, 0.5, 0.5),
    )


def videollama_config_from(m, n_frms: int) -> "VideoLLaMAConfig":
    """Derive a :class:`VideoLLaMAConfig` from an assembly config
    (shares the vit/beats/llm/lora size knobs so ``--model-size tiny``
    and YAML overrides apply to both backbones), picking connector
    strides compatible with the patch grid and frame count."""
    grid = m.vit.image_size // m.vit.patch_size
    spatial_pool = 2 if grid % 2 == 0 else 1
    temporal_stride = next(d for d in (4, 2, 1) if n_frms % d == 0)
    return VideoLLaMAConfig(
        vit=m.vit, beats=m.beats, llm=m.llm, lora=m.lora,
        spatial_pool=spatial_pool, temporal_stride=temporal_stride,
        max_txt_len=m.max_txt_len, max_output_txt_len=m.max_output_txt_len,
        max_new_tokens=m.max_new_tokens,
    )


class VideoLLaMA:
    """Second backbone behind the same generate/loss contract as
    :class:`XInstructBLIP`."""

    # Finetuning trains LoRA adapters + the connector/audio projector
    # (the projector is VideoLLaMA2's own finetune target); the reference
    # cannot train this backbone at all (utils/trainer.py:56-69 crashes).
    TRAINABLE_PATTERN = r"(lora_a|lora_b|connector|audio_proj)"

    def __init__(
        self,
        cfg: VideoLLaMAConfig,
        audio_cfg: AudioFrontendConfig | None = None,
        llm_tokenizer=None,
    ):
        self.cfg = cfg
        self.audio_cfg = audio_cfg or AudioFrontendConfig()
        self.llm_tokenizer = llm_tokenizer or ByteTokenizer(cfg.llm.vocab_size)
        self.vit = EvaViT(cfg.vit)
        self.beats = BeatsEncoder(cfg.beats)
        self.llm = LlamaModel(cfg.llm, cfg.lora if cfg.lora.enabled else None)
        self.connector = STCConnector(
            cfg.llm.hidden_size, cfg.spatial_pool, cfg.temporal_stride
        )
        self.audio_proj = AudioProjector(cfg.llm.hidden_size)

    # ------------------------------------------------------------------

    def init_params(self, rng: jax.Array, jit: bool | None = None) -> dict:
        """See ``XInstructBLIP.init_params``: one-dispatch init for
        production-size stacks, eager for tiny test configs."""
        if jit is None:
            jit = self.cfg.llm.hidden_size >= 2048
        if jit:
            return jax.jit(self._init_params_eager)(rng)
        return self._init_params_eager(rng)

    def _init_params_eager(self, rng: jax.Array) -> dict:
        cfg = self.cfg
        keys = jax.random.split(rng, 5)
        t_mel = self.audio_cfg.mel_frames_per_chunk
        p = cfg.vit.num_patches
        params = {
            "vit": self.vit.init(
                keys[0],
                jnp.zeros((1, cfg.vit.image_size, cfg.vit.image_size, 3), jnp.bfloat16),
            )["params"],
            "beats": self.beats.init(
                keys[1], jnp.zeros((1, t_mel, cfg.beats.num_mel_bins), jnp.float32)
            )["params"],
            "connector": self.connector.init(
                keys[2],
                jnp.zeros((1, cfg.temporal_stride, p, cfg.vit.width)),
            )["params"],
            "audio_proj": self.audio_proj.init(
                keys[3], jnp.zeros((1, 1, 4, cfg.beats.width))
            )["params"],
        }
        d = cfg.llm.hidden_size
        params["llm"] = self.llm.init(
            keys[4],
            jnp.zeros((1, 4, d)), jnp.ones((1, 1, 4, 4), bool),
            jnp.zeros((1, 4), jnp.int32), jnp.zeros((1, 4), jnp.int32),
            method=LlamaModel.init_all,
        )["params"]
        return params

    # ------------------------------------------------------------------

    def _embed_ids(self, params, ids):
        return self.llm.apply(
            {"params": params["llm"]}, method=lambda m, i: m.embed(i), i=ids
        )

    @functools.partial(jax.jit, static_argnames=("self", "n_frms"))
    def _prefix(self, params, video_u8, audio_wave, n_frms, crop_params=None):
        cfg = self.cfg
        if crop_params is not None:
            # train-time RandomResizedCrop+flip on device (Trainer
            # contract; see ops/image.py::sample_crop_params)
            frames = augment_and_normalize(
                video_u8, crop_params, cfg.vit.image_size,
                dtype=jnp.dtype(cfg.vit.dtype),
            )
        else:
            frames = normalize_frames(
                video_u8, dtype=jnp.dtype(cfg.vit.dtype),
                mean=cfg.image_mean, std=cfg.image_std,
            )
        b, t = frames.shape[:2]
        folded = frames.reshape((b * t,) + frames.shape[2:])
        feats = self.vit.apply({"params": params["vit"]}, folded)
        patch = feats[:, 1:] if cfg.vit.use_class_token else feats
        patch = patch.reshape(b, t, patch.shape[1], cfg.vit.width)
        video_tokens = self.connector.apply({"params": params["connector"]}, patch)

        fbank = beats_frontend(audio_wave, self.audio_cfg, n_frms)
        fb = fbank.reshape((b * n_frms,) + fbank.shape[2:])
        audio_feats = self.beats.apply({"params": params["beats"]}, fb)
        audio_feats = audio_feats.reshape(b, n_frms, -1, cfg.beats.width)
        audio_tokens = self.audio_proj.apply({"params": params["audio_proj"]}, audio_feats)

        prefix = jnp.concatenate([video_tokens, audio_tokens], axis=1)
        mask = jnp.ones(prefix.shape[:2], jnp.int32)
        return prefix, mask

    # ------------------------------------------------------------------

    def device_inputs(self, batch) -> tuple:
        """Start async host->device transfer of the heavy batch arrays;
        call one batch ahead to overlap the transfer with compute."""
        return (jax.device_put(batch.video), jax.device_put(batch.audio))

    def generate_submit(self, params, batch, device_inputs=None):
        """Dispatch the generate graph without blocking (async-dispatch
        futures; same contract as ``XInstructBLIP.generate_submit``)."""
        cfg = self.cfg
        n_frms = batch.timestamps.shape[1]
        if device_inputs is None:
            device_inputs = self.device_inputs(batch)
        video_dev, audio_dev = device_inputs
        prefix, pmask = self._prefix(params, video_dev, audio_dev, n_frms)
        prompts = [cfg.system_prompt + p.strip() for p in batch.text_input]
        enc = self.llm_tokenizer(
            prompts, max_length=cfg.max_txt_len,
            padding_side="left", truncation_side="left",
        )
        prompt_emb = self._embed_ids(params, jnp.asarray(enc.input_ids))
        embeds = jnp.concatenate([prefix, prompt_emb], axis=1)
        mask = jnp.concatenate([pmask, jnp.asarray(enc.attention_mask)], axis=1)
        if cfg.lookup_spec >= 2:
            # prompt-lookup hints: the prompt token ids (outputs echo
            # digits/phrases from the query; drafts are always verified)
            return lookup_generate(
                self.llm, {"params": params["llm"]}, embeds, mask,
                cfg.max_new_tokens, self.llm_tokenizer.eos_token_id,
                spec_width=cfg.lookup_spec,
                hint_ids=jnp.asarray(enc.input_ids),
                hint_mask=jnp.asarray(enc.attention_mask),
            )
        return greedy_generate(
            self.llm, {"params": params["llm"]}, embeds, mask,
            cfg.max_new_tokens, self.llm_tokenizer.eos_token_id,
        )

    def generate_finalize(self, pending, return_saliency: bool = False):
        tokens = np.array(pending)
        tokens[tokens == 0] = self.llm_tokenizer.eos_token_id
        texts = [t.strip() for t in self.llm_tokenizer.batch_decode(tokens)]
        return (texts, None) if return_saliency else texts

    def generate(self, params, batch, device_inputs=None) -> list[str]:
        return self.generate_finalize(
            self.generate_submit(params, batch, device_inputs)
        )

    @functools.partial(jax.jit, static_argnames=("self", "n_frms"))
    def _loss_fn(self, params, video_u8, audio_wave, concat_ids, concat_mask,
                 labels, crop_params=None, dropout_rng=None, *, n_frms):
        prefix, pmask = self._prefix(
            params, video_u8, audio_wave, n_frms, crop_params=crop_params
        )
        text_emb = self._embed_ids(params, concat_ids)
        embeds = jnp.concatenate([prefix, text_emb], axis=1)
        mask = jnp.concatenate([pmask, concat_mask], axis=1)
        full_labels = jnp.concatenate(
            [jnp.full(pmask.shape, -100, jnp.int32), labels], axis=1
        )
        b, s, _ = embeds.shape
        causal = jnp.tril(jnp.ones((s, s), bool))[None, None]
        attend = causal & mask[:, None, None, :].astype(bool)
        logits, _ = self.llm.apply(
            {"params": params["llm"]}, embeds, attend, positions_from_mask(mask),
            kv_valid=mask, causal=True,
            deterministic=dropout_rng is None,
            rngs=None if dropout_rng is None else {"dropout": dropout_rng},
        )
        shift_logits, shift_labels = logits[:, :-1], full_labels[:, 1:]
        valid = shift_labels != -100
        safe = jnp.where(valid, shift_labels, 0)
        ll = jnp.take_along_axis(
            jax.nn.log_softmax(shift_logits, axis=-1), safe[..., None], axis=-1
        )[..., 0]
        return -(ll * valid).sum() / jnp.maximum(valid.sum(), 1)

    def loss_arrays(self, batch) -> tuple:
        """Host-side text prep → the array tuple ``_loss_fn`` consumes
        (the trainer's uniform model contract)."""
        cfg = self.cfg
        tok = self.llm_tokenizer
        total = cfg.max_txt_len + cfg.max_output_txt_len
        b = len(batch.text_input)
        concat_ids = np.full((b, total), tok.pad_token_id, np.int32)
        concat_mask = np.zeros((b, total), np.int32)
        labels = np.full((b, total), -100, np.int32)
        for i, (inp, out) in enumerate(zip(batch.text_input, batch.text_output)):
            in_ids = tok.encode(cfg.system_prompt + inp, add_special_tokens=True)[
                -cfg.max_txt_len:
            ]
            out_ids = tok.encode(out, add_special_tokens=False)[: cfg.max_output_txt_len - 1]
            out_ids = out_ids + [tok.eos_token_id]
            seq = (in_ids + out_ids)[:total]
            concat_ids[i, : len(seq)] = seq
            concat_mask[i, : len(seq)] = 1
            labels[i, : len(seq)] = seq
            labels[i, : min(len(in_ids), total)] = -100
        return (np.asarray(batch.video), np.asarray(batch.audio),
                concat_ids, concat_mask, labels)

    def loss(self, params, batch) -> jax.Array:
        arrays = self.loss_arrays(batch)
        return self._loss_fn(
            params, *(jnp.asarray(a) for a in arrays),
            n_frms=batch.timestamps.shape[1],
        )
