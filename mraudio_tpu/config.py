"""Typed configuration for the whole framework.

One schema consolidates what the reference scatters across argparse
flags (``evaluate.py:63-78``, ``finetune.py:42-61``), hardcoded model
constants (``models/xinstructblip.py:70-77,120``), hardcoded trainer
hyperparameters (``utils/trainer.py:31,59-66``), the dataset→n_frms
mapping (``evaluate.py:15-16``), and the documentation-only LAVIS YAML
(``models/vicuna7b_v2.yaml``).  Defaults reproduce the reference's live
values; everything is YAML round-trippable.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any

import yaml


class _ConfigBase:
    @classmethod
    def from_dict(cls, data: dict):
        kwargs = {}
        for f in dataclasses.fields(cls):
            if f.name not in data:
                continue
            value = data[f.name]
            sub = _DATACLASS_FIELD_TYPES.get((cls.__name__, f.name))
            if sub is not None and isinstance(value, dict):
                value = sub.from_dict(value)
            kwargs[f.name] = value
        return cls(**kwargs)

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    @classmethod
    def from_yaml(cls, path: str):
        with open(path) as f:
            return cls.from_dict(yaml.safe_load(f) or {})

    def to_yaml(self, path: str) -> None:
        with open(path, "w") as f:
            yaml.safe_dump(self.to_dict(), f, sort_keys=False)

    def replace(self, **kwargs):
        return dataclasses.replace(self, **kwargs)


# --------------------------------------------------------------------------
# Model components
# --------------------------------------------------------------------------


@dataclass(frozen=True)
class ViTConfig(_ConfigBase):
    """EVA-ViT-g/14 frame encoder (reference binds LAVIS
    ``create_eva_vit_g``, ``models/xinstructblip.py:658-666``): 224² → 257
    patch tokens × 1408 features, 39 transformer blocks."""

    image_size: int = 224
    patch_size: int = 14
    width: int = 1408
    depth: int = 39
    num_heads: int = 16
    mlp_dim: int = 6144
    use_class_token: bool = True
    layer_norm_eps: float = 1e-6
    dtype: str = "bfloat16"
    # MLP activation: "gelu" (EVA/erf-exact, the reference default),
    # "quick_gelu" (CLIP towers), "gelu_tanh" (SigLIP towers — the
    # VideoLLaMA2.1 vision encoder).  Config-only tower flavor switch.
    mlp_act: str = "gelu"
    # rematerialize blocks under grad (reference use_grad_checkpoint,
    # models/xinstructblip.py:83)
    grad_checkpoint: bool = False
    # Temporal-residual encoding (ResidualViT-style, opt-in): every
    # keyframe_interval-th frame runs the full transformer; in-between
    # frames run it only on their residual_tokens most-changed patches
    # and inherit keyframe features elsewhere.  1 = off (exact,
    # reference-parity behavior).
    keyframe_interval: int = 1
    residual_tokens: int = 64

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def seq_len(self) -> int:
        return self.num_patches + int(self.use_class_token)


@dataclass(frozen=True)
class BeatsConfig(_ConfigBase):
    """BEATs iter3+ audio encoder (reference binds LAVIS ``BeatsEncoder``,
    ``models/xinstructblip.py:670-676``): 128-mel fbank patches → 768-dim
    tokens, 12 transformer layers with gated relative position bias."""

    num_mel_bins: int = 128
    patch_size: int = 16
    patch_stride: int = 16
    conv_dim: int = 512
    width: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_dim: int = 3072
    conv_pos_kernel: int = 128
    conv_pos_groups: int = 16
    rel_pos_buckets: int = 320
    rel_pos_max_distance: int = 800
    layer_norm_eps: float = 1e-5
    dtype: str = "bfloat16"


@dataclass(frozen=True)
class QFormerConfig(_ConfigBase):
    """Per-modality Q-Former: BERT-base LM with cross-attention every
    ``cross_attention_freq`` layers and 32 learned query tokens
    (``models/xinstructblip.py:614-655``)."""

    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    cross_attention_freq: int = 2
    num_query_tokens: int = 32
    # bert-base-uncased vocab (30522) + [DEC] (xinstructblip.py:622)
    vocab_size: int = 30523
    max_position_embeddings: int = 512
    layer_norm_eps: float = 1e-12
    initializer_range: float = 0.02
    dtype: str = "bfloat16"


@dataclass(frozen=True)
class LlamaConfig(_ConfigBase):
    """Vicuna-7B v1.1 decoder (reference loads HF LlamaForCausalLM 8-bit,
    ``models/xinstructblip.py:147-163``).  Vocab is 32000 + [PAD]
    (``:141,154``)."""

    vocab_size: int = 32001
    # Round the embedding/lm_head vocab dimension up to a multiple of
    # this (zero rows appended; pad logit columns are masked to
    # finfo.min before any softmax/argmax).  Bit-identical to the
    # unpadded model on TPU (the MXU pads the vocab tile to 128 lanes
    # either way); XLA:CPU may re-block the GEMM for the new N, giving
    # ~1e-7-level rounding diffs only (tests/test_vocab_pad.py).  The Vicuna
    # vocab is 32001 (32000 + [PAD], reference models/xinstructblip.py:154)
    # which no model-axis width divides; 8 → 32008 lets lm_head and
    # embed_tokens vocab-shard on any (1|2|4|8)-wide model axis instead
    # of silently replicating (docs/DIVERGENCES.md "vocab padding").
    vocab_pad_multiple: int = 1
    hidden_size: int = 4096
    num_layers: int = 32
    num_heads: int = 32
    num_kv_heads: int = 32
    intermediate_size: int = 11008
    rope_theta: float = 10000.0
    rms_norm_eps: float = 1e-6
    max_seq_len: int = 4096
    dtype: str = "bfloat16"
    # Qwen2-family attention flavor: biases on the q/k/v projections
    # (o_proj stays bias-free, matching HF Qwen2).  Off for llama/
    # vicuna/mistral checkpoints.  Lets VideoLLaMA2.1's Qwen2-7B decoder
    # load config-only (models/convert_weights.py::convert_llama_hf).
    attention_bias: bool = False
    # "int8" quantizes base weights per output channel (the TPU
    # counterpart of load_in_8bit); "int4" quantizes group-wise along the
    # input dim (int4_group_size) — HALF int8's weight bytes, so the
    # HBM-bound decode reads weights twice as fast and a 7B model leaves
    # ~3.3 GB more HBM for batch/KV.  int4 is an accuracy trade the
    # reference never ships (validate on real weights before serving);
    # "none" keeps `dtype`.
    quantization: str = "none"
    # Input-dim group size for quantization="int4" (AWQ/GPTQ convention).
    int4_group_size: int = 128
    # With quantization="int8": also quantize activations dynamically and
    # run a true int8 x int8 -> int32 MXU dot (W8A8, no outlier
    # decomposition).  Off by default — weight-only int8 keeps reference
    # (bitsandbytes) accuracy semantics; measurements in docs/BENCHMARKS.md.
    int8_dot: bool = False
    # KV-cache storage: "none" keeps `dtype`; "int8" stores per-token
    # per-head absmax-quantized values + fp32 scales — halves decode HBM
    # reads and doubles the batch/slot count that fits beside the params.
    # KV-cache storage format: "none" (model dtype), "int8" (per-(row,
    # position, head) absmax, ~0.4% error — halves decode cache reads
    # and slot bytes; the full-profile default), or "int4" (nibble-packed
    # pairs along head_dim, 15 levels — another 2x off cache bytes at a
    # real accuracy cost; validate on task metrics before production).
    kv_quant: str = "none"
    # Post-prefill KV compaction (0 = off): keep only the `kv_keep`
    # highest-scoring prefix positions PER LAYER before decoding, scored
    # by the attention mass the last `kv_keep_obs` prompt tokens put on
    # each position during prefill (SnapKV-style observation window; the
    # layer-adaptive audio/video budget split of AccKV, arXiv:2511.11106,
    # emerges from per-layer scores rather than a fixed modality quota —
    # the TPU-native formulation keeps the kept-count static per layer so
    # every shape stays compile-time fixed, while WHICH audio/video
    # positions survive is data-dependent per layer and row).  The first
    # `kv_keep_sink` positions (attention sinks) and the observation
    # window itself (the text prompt carrying the query) are always kept.
    # Decode then runs over a (kv_keep + max_new_tokens)-column cache:
    # at QVH full size 5.3k -> ~1.5k columns cuts per-step KV reads ~3.5x
    # and shrinks a serving slot's steady-state cache the same factor.
    # An approximation (exact only for positions the prompt never needed)
    # — validate on real weights before serving; off for parity runs.
    kv_keep: int = 0
    kv_keep_obs: int = 32
    kv_keep_sink: int = 4
    # rematerialize decoder blocks under grad (reference
    # gradient_checkpointing_enable, models/xinstructblip.py:157)
    grad_checkpoint: bool = False
    # Decode-GEMV implementation: "xla" (default) or "pallas" — the
    # order-preserving split-K Pallas kernel (ops/gemv.py) for
    # decode-shaped projections (<=32 rows; int8 weight-only and plain
    # float paths; dims must tile — the padded lm_head falls back).
    # Targets the measured −11% split-K win WITHOUT reordering the f32
    # accumulation (docs/ROADMAP.md round 4).  Mosaic cannot compile
    # through this build host's tunnel, so it is interpret-validated
    # here and intended for direct-attached TPUs.
    decode_gemv: str = "xla"
    # Attention implementation for multi-token (prefill/training) calls:
    # "chunked" = online-softmax lax.scan (O(S*D) memory, portable, the
    # default), "pallas" = the hand-written Mosaic kernel (real TPU
    # deployments), "dense" = materialized logits (tiny shapes / debug).
    # Decode steps always use the dense path (1 x KV has nothing to tile).
    attention_impl: str = "chunked"
    # Unroll the prefill's query tiles at trace time (ops/attention.py
    # unroll_q): 24%/layer faster at QVH shape but ~10x the attention
    # HLO — full-size cold compiles go from ~5 to ~20 min through the
    # remote-compile tunnel.  End-to-end the win is ~4% at B=2, so the
    # default favors compile latency; flip on for long-lived serving
    # processes.  (Decode steps always use the trivial 1-tile unroll.)
    attention_unroll_prefill: bool = False
    # Unroll the training (no-cache) attention's query tiles.  The
    # scanned outer loop's backward materializes a per-(tile, chunk)
    # K/V-cotangent buffer ((11, 11, B, H, 512, 128) f32 ≈ 1 GB/layer at
    # QVH full size — the thing that keeps B=1 7B training off a 16 GB
    # chip); the unrolled loop accumulates cotangents tile-by-tile
    # instead.  Off by default (compile time; small models don't care).
    attention_unroll_train: bool = False
    # Sequence-chunked MLP: run the feed-forward as an nn.scan over
    # token tiles of this size (0 = whole sequence in one pass).  The
    # MLP's (S, intermediate) gate/up/silu temps are the largest
    # activations at QVH full size (3 x 114 MB per layer) and the
    # training backward keeps dozens live; tiling caps them at
    # (chunk, intermediate).  Forward-only inference doesn't need it.
    mlp_seq_chunk: int = 0
    # Chunked prefill (0 = one-shot): run generate's prefix pass in
    # N-token segments against the cache (later segments attend earlier
    # ones through it, with a static q_offset keeping the attention
    # kernel's causal skipping intact).  Bit-identical tokens to one-shot
    # prefill; caps the per-layer (B, chunk, ...) qkv/norm/quantize temps
    # that are the largest prefill allocations at B>=3 — the lever that
    # lets batch grow past the one-shot prefill's memory peak on a
    # 16 GB chip.  Costs one extra dispatch per segment; keep segments
    # >= 1-2k tokens so prefill matmuls stay MXU-shaped.  Default 2048:
    # a no-op for prefixes that fit one segment (tiny tests, Charades),
    # and the measured-win configuration at QVH full size (B=3,
    # docs/BENCHMARKS.md); set 0 for a one-shot prefill.
    prefill_chunk: int = 2048
    # Scan over the layer stack (one nn.scan body instead of 32 traced
    # block copies).  Params/cache carry a leading (num_layers,) axis —
    # weight loads stack the per-layer trees (models/convert_weights
    # stack_llm_layers).  ~30x smaller decoder HLO: full-size compiles
    # drop from minutes to seconds, and the backward's working set is
    # one layer (XLA cannot interleave rematted blocks across layers),
    # which is what lets the 7B B=1 train step fit a 16 GB chip.
    scan_layers: bool = False
    # Megatron-style sequence parallelism: annotate the decoder's
    # residual stream (B, S, D) with S sharded over the ``model`` mesh
    # axis at block boundaries.  GSPMD then runs RMSNorms, residual
    # adds, RoPE and the dropout mask seq-sharded and converts each
    # block's two tensor-parallel all-reduces into reduce-scatter +
    # all-gather pairs (same bytes on the wire, but the between-layers
    # activations — and the remat-backward's saved residuals — shrink by
    # the model-axis width).  A no-op outside a mesh context, when the
    # model axis is 1, or on 1-token decode steps; an S that doesn't
    # tile the axis (QVH's 5,353-token interleave) is fine — GSPMD pads
    # the last shard.  Pure layout change: forward is allclose (not bitwise — the
    # lm_head/attention GEMMs re-block).  Measured memory effect at
    # production shape is recorded by ``sweep_fullsize_meshes``.
    seq_shard: bool = False

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def padded_vocab_size(self) -> int:
        m = self.vocab_pad_multiple
        return -(-self.vocab_size // m) * m if m > 1 else self.vocab_size


@dataclass(frozen=True)
class LoraConfig(_ConfigBase):
    """LoRA adapters on LLM linears (reference peft config,
    ``models/model_utils.py:4-27``): r=8, alpha=8, dropout=0.05, all
    linear projections except the lm_head."""

    enabled: bool = True
    rank: int = 8
    alpha: int = 8
    dropout: float = 0.05
    # Names of Llama linear projections to adapt (reference targets all
    # 8-bit linears, which in a Llama block are exactly these).
    target_modules: tuple = ("q_proj", "k_proj", "v_proj", "o_proj", "gate_proj", "up_proj", "down_proj")


@dataclass(frozen=True)
class XInstructBLIPConfig(_ConfigBase):
    """Assembly config (hardcoded block of ``models/xinstructblip.py:68-77``
    + the documented schema of ``models/vicuna7b_v2.yaml``)."""

    # The documented schema covers the upstream X-InstructBLIP modality
    # set — "audio", "video", "image", "pc" (``models/vicuna7b_v2.yaml:
    # 15-51`` carries image/pc encoder+qformer entries).  The live
    # reference CODE binds only audio+video (``models/xinstructblip.py:
    # 206-209`` — MODALITY_TO_CUE has no image/pc, and the MR data path
    # never produces them), so the model accepts the schema but raises a
    # clear error if an image/pc modality is actually enabled.
    modalities: tuple = ("audio", "video")
    interleave_seconds: bool = True
    enumerate_inputs: bool = False
    # Timestamp rendering for the interleave: seconds_integers (live
    # reference behavior), relative_integers, seconds_floats,
    # relative_floats, framenumbers (utils/utils.py:462-603 experiment
    # surface).  Relative formats require convert_to_absolute_time on the
    # predictions (handled by the eval driver).
    time_format: str = "seconds_integers"
    max_txt_len: int = 128
    max_output_txt_len: int = 64
    max_new_tokens: int = 64
    # Fixed token budget for one rendered timestamp (" {t} ") in the
    # statically-shaped interleave; extra positions are attention-masked.
    tokens_per_timestamp: int = 5
    # Fixed token budget for the duration chunk ("{dur} ").
    tokens_per_duration: int = 5
    prefix: str = ""
    postfix: str = ""
    # Grammar-constrained decoding: mask decode logits to the span
    # grammar "[[start, end], ...]" compiled against the tokenizer
    # (text/grammar.py), so every generation parses by construction
    # (invalid_pred_num == 0) — the reference can only regex-repair
    # malformed outputs after the fact (utils/utils.py:66-132).  Decode
    # also commits grammar-*forced* tokens speculatively: up to
    # spec_width-1 single-choice tokens ride along with each free choice
    # in ONE model pass (infer/generate.py::grammar_generate) — decode is
    # HBM-bound, so fewer passes = proportionally less decode time, with
    # token-identical output to spec_width=1.  Off by default: the
    # reference decodes unconstrained.
    constrained_decoding: bool = False
    # Draft width for the speculative step (1 = plain constrained greedy).
    spec_width: int = 4
    # Self-speculative decoding for the UNCONSTRAINED path: draft
    # lookup_spec-1 tokens per step by n-gram lookup over the tokens
    # already generated — falling back to the prompt's timestamp/
    # duration/query token ids (prompt-lookup: span outputs echo digits
    # that appear verbatim in the interleave) — then verify against the
    # model's own argmax in ONE multi-position pass
    # (infer/generate.py::lookup_generate / lookup_draft).
    # Bit-identical tokens to plain greedy (every committed token is the
    # model's argmax at its position); decode is HBM-bound, so each
    # accepted draft token removes one full weight+KV streaming pass.
    # 0/1 = off (plain greedy).
    lookup_spec: int = 0
    # Optional per-frame saliency head over video Q-Former tokens: enables
    # QVHighlights highlight detection (pred_saliency_scores -> HL-Hit1 /
    # HL-mAP).  Capability beyond the reference, whose models never emit
    # saliency even though its scorer supports it (eval/mr_eval.py:396-406).
    saliency_head: bool = False
    # Host→device video wire format: "rgb" ships uint8 (B,T,H,W,3);
    # "yuv420" ships the codec-native I420 planes packed as uint8
    # (B,T,H*3/2,W) — HALF the bytes over the transfer link — and
    # reconstructs RGB on device (ops/image.py::yuv420_to_rgb), fused
    # into the same jit as CLIP normalization.  Web video is stored
    # 4:2:0, so on decode-direct pipelines this is lossless vs the
    # source; packing host-side RGB loses only the chroma the codec
    # had already discarded.
    video_wire: str = "rgb"
    # Frame-encoder batching: process this many clips' frames per ViT
    # pass (lax.map over clip groups).  Bounds the encoder's fp32
    # attention-logits temp to one group — at QVH full size the whole
    # B=2 fold's (120,16,257,257) fp32 logits alone are 2x742 MB, which
    # is what OOMs 16 GB chips at B>=2.  0 = single pass over the fold.
    encode_clips_per_pass: int = 1
    # Finer-grained encoder batching: cap the folded frame axis at this
    # many frames per ViT/BEATs pass (0 = off).  Unlike
    # encode_clips_per_pass this also helps B=1 (the full-size train
    # step: one clip's (60, 16, 257, 257) f32 ViT logits pair is 742 MB).
    # Ignored when the temporal-residual encoder is on (it needs whole
    # clips per pass).
    encode_frames_per_pass: int = 0
    vit: ViTConfig = field(default_factory=ViTConfig)
    beats: BeatsConfig = field(default_factory=BeatsConfig)
    qformer: QFormerConfig = field(default_factory=QFormerConfig)
    llm: LlamaConfig = field(default_factory=LlamaConfig)
    lora: LoraConfig = field(default_factory=LoraConfig)


# --------------------------------------------------------------------------
# Data
# --------------------------------------------------------------------------

DATASET_N_FRMS = {"QVH": 60, "Charades_STA": 20}  # evaluate.py:15-16
# Max clip durations (seconds, slightly padded) — bounds the audio bytes
# shipped per sample; the fbank zero-pads beyond the real audio.
DATASET_MAX_AUDIO_SECONDS = {"QVH": 152.0, "Charades_STA": 45.0}


@dataclass(frozen=True)
class AudioFrontendConfig(_ConfigBase):
    """Mel-fbank frontend replacing LAVIS ``BeatsAudioProcessor``
    (bound at ``evaluate.py:24``): kaldi-style 128-bin log-mel fbank over
    16 kHz mono, split into ``n_frames`` per-clip chunks of
    ``frame_length`` mel frames each."""

    sampling_rate: int = 16000
    num_mel_bins: int = 128
    # STFT geometry (kaldi fbank defaults): 25 ms window, 10 ms shift.
    frame_length_ms: float = 25.0
    frame_shift_ms: float = 10.0
    # Mel frames per audio chunk fed to BEATs (reference frame_length=512,
    # evaluate.py:24).
    mel_frames_per_chunk: int = 512
    preemphasis: float = 0.97
    dither: float = 0.0
    # Cap on shipped audio (seconds).  The fbank zero-pads past the real
    # audio anyway, so capping at the dataset's max clip duration (150s
    # for QVH) halves host->device bytes vs covering all n_frms chunks.
    max_audio_seconds: float = 0.0  # 0 = full n_frms * chunk coverage

    @property
    def win_length(self) -> int:
        return int(self.sampling_rate * self.frame_length_ms / 1000)

    @property
    def hop_length(self) -> int:
        return int(self.sampling_rate * self.frame_shift_ms / 1000)


@dataclass(frozen=True)
class DataConfig(_ConfigBase):
    dataset: str = "QVH"
    video_folder: str = ""
    annotation_file: str = ""
    train_annotation_file: str = ""
    val_annotation_file: str = ""
    n_frms: int = 60
    image_size: int = 224
    # "uniform" for eval, "random" (per-interval) for train
    # (processors/alpro_processors.py:24-33).
    sampling: str = "uniform"
    # train-time RandomResizedCrop scale range (AlproVideoTrainProcessor
    # min_scale/max_scale, processors/alpro_processors.py:41).
    min_scale: float = 0.9
    max_scale: float = 1.0
    # Video decode source: "native" (C++ libav), "synthetic" (procedural,
    # for tests/bench), "npy" (pre-extracted arrays).
    video_source: str = "native"
    # Wire format the dataset emits: "rgb" (T,H,W,3) or "yuv420" packed
    # I420 (T,H*3/2,W) — half the host→device bytes; the native decoder
    # copies the codec planes directly (no RGB conversion at all).  Must
    # match the model's ``video_wire`` ("yuv420" model + "rgb" data also
    # works: the model packs host-side).
    video_wire: str = "rgb"
    audio: AudioFrontendConfig = field(default_factory=AudioFrontendConfig)
    num_chunks: int = 1
    chunk_idx: int = 0
    prefetch_depth: int = 2
    # "live" = the reference's two-line query+task prompt (its live
    # path); "fewshot" = the tagged few-shot surface its dead builder
    # sketched (utils/mr_dataset.py:57-93) — opt-in, pair with
    # model.time_format="relative_floats".
    prompt_style: str = "live"

    @classmethod
    def for_dataset(cls, dataset: str, **kwargs) -> "DataConfig":
        if dataset not in DATASET_N_FRMS:
            raise ValueError(
                f"unknown dataset {dataset!r}; expected one of {sorted(DATASET_N_FRMS)}"
            )
        kwargs.setdefault(
            "audio",
            AudioFrontendConfig(max_audio_seconds=DATASET_MAX_AUDIO_SECONDS[dataset]),
        )
        return cls(dataset=dataset, n_frms=DATASET_N_FRMS[dataset], **kwargs)


# --------------------------------------------------------------------------
# Parallelism / training / top-level
# --------------------------------------------------------------------------


@dataclass(frozen=True)
class MeshConfig(_ConfigBase):
    """Device mesh axes.  Data parallelism over ``data``; tensor
    parallelism of the LLM (and width-sharding of encoders) over
    ``model``.  The reference's only strategy is DP via DDP
    (``utils/trainer.py:69``); TP is this framework's addition so a 7B
    LLM fits sharded across a v5e-8."""

    data: int = 1
    model: int = 1

    @property
    def num_devices(self) -> int:
        return self.data * self.model


@dataclass(frozen=True)
class TrainConfig(_ConfigBase):
    lr: float = 3e-4                 # utils/trainer.py:62,65
    weight_decay: float = 0.05       # utils/trainer.py:59
    betas: tuple = (0.9, 0.999)      # utils/trainer.py:63
    warmup_steps: int = 1000         # utils/trainer.py:66
    warmup_start_lr: float = 1e-8    # utils/trainer.py:66
    min_lr: float = 0.0              # utils/trainer.py:66
    accum_grad_iters: int = 2        # utils/trainer.py:31
    max_epoch: int = 50              # finetune.py:54
    val_freq: int = 1
    save_freq: int = 1
    batch_size: int = 1
    # prefetch threads for the loaders (the reference's --num-workers;
    # threads not processes — decode releases the GIL in C++)
    num_workers: int = 2
    # Train-time RandomResizedCrop(0.9-1.0)+flip, the reference's
    # AlproVideoTrainProcessor transform (processors/
    # alpro_processors.py:40-61): parameters sampled host-side per clip,
    # applied on device inside the jitted step (ops/image.py).
    augment: bool = True
    seed: int = 42
    output_dir: str = "output"
    resume_ckpt_path: str = ""
    # Failure detection (the TPU shape of GradScaler's inf/nan step
    # skipping, utils/trainer.py:67, plus explicit counting): a
    # non-finite loss zeroes that micro-batch's gradients inside the
    # jitted step (the grad accumulator and Adam moments never see the
    # NaN) and suppresses the parameter update it feeds; the event is
    # logged to the run log, and training aborts after `max_nan_skips`
    # CONSECUTIVE bad steps instead of silently emitting NaN checkpoints.
    nan_guard: bool = True
    max_nan_skips: int = 10
    # Preemption safety: install a SIGTERM handler that checkpoints the
    # trainable subtree + optimizer state + exact step position
    # (checkpoint_preempt) and exits cleanly; resuming from it continues
    # mid-epoch bitwise.  TPU pods preempt — the reference's resume is a
    # hand-edited path (utils/trainer.py:29).
    preempt_save: bool = True
    # Run the frozen encoders as their own jit program ahead of the LLM
    # loss/grad program (valid whenever nothing trainable feeds them).
    # Two smaller programs compile/schedule better, but note each
    # program's compile-time memory accounting ignores the OTHER's
    # arguments — on a memory-saturated chip the single fused program's
    # accounting is the honest one (set False there).
    split_encode_step: bool = True
    # Opt-in memory lever: store the frozen param subtree's large float
    # kernels int8 (+fp32 per-out-channel scales), dequantized inside the
    # jitted step (models/quant_tree.py).  "none" | "int8".  With
    # split_encode_step this makes the frozen encoders resident at the
    # int8 byte rate (~1.35 GB instead of 2.7) — what lets the full-size
    # 7B LoRA step fit a single 16 GB v5e (docs/BENCHMARKS.md).  An
    # approximation vs. the reference's fp16 encoders; the LLM base is
    # int8 in both (load_in_8bit parity).
    quant_frozen: str = "none"
    # Opt-in single-chip memory lever: train in windows of N batches —
    # upload the frozen encoder subtree, run the encode program for the
    # window's batches, DELETE the device copy, then run the window's
    # LLM loss/grad steps with only the LLM weights resident.  Exact
    # (the same split_encode_step programs run on the same inputs in
    # the same order); costs one encoder re-upload per window.  What
    # reclaims the ~1.35–2.7 GB of frozen encoders from the full-size
    # 7B backward's HBM budget (docs/BENCHMARKS.md "Full-size
    # training").  Requires split_encode_step and fully-frozen
    # encoders; single-chip (shard over the `model` axis on a mesh
    # instead).  0 = off.
    encoder_window: int = 0
    # With encoder_window: double-buffer the per-window encoder upload —
    # window k+1's packed transfers are ISSUED (async device_put) right
    # after window k's encodes retire, so the ~1.4 GB rides the wire
    # while window k's LLM steps run, instead of serializing in front
    # of window k+1 (r4 measured the serialized upload at ~45 s per
    # 12-step window through the remote tunnel ≈ 3.8 s/step of pure
    # wire wait).  Costs the staged subtree's bytes of extra HBM for
    # the whole window: OPT-IN because the flagship full-size B=2
    # single-chip config has LESS than 1.4 GB of headroom over program
    # B's peak — measured RESOURCE_EXHAUSTED mid-window (round 5) —
    # while B=1 and model-sharded meshes have room.  Staging consults
    # device memory_stats when available and falls back to the
    # serialized path when headroom < 1.2x the packed bytes (or on a
    # staging RESOURCE_EXHAUSTED).  Bit-identical either way (same
    # transfers, same unpack, different timing;
    # tests/test_encoder_window.py).
    upload_overlap: bool = False


@dataclass(frozen=True)
class RunConfig(_ConfigBase):
    """Top-level config: one object per entry point."""

    model_name: str = "X-InstructBLIP"  # or "VideoLLaMA"
    model: XInstructBLIPConfig = field(default_factory=XInstructBLIPConfig)
    data: DataConfig = field(default_factory=DataConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    # Eval/serve-side int8 storage of the frozen encoder subtrees
    # (quant_tree.quantize_subtrees; dequant fuses into each weight
    # read inside the jitted encode).  Frees ~1.35 GB of HBM beside the
    # 7B decode cache — the margin for one more eval batch row.  Same
    # approximation status as train.quant_frozen (the reference keeps
    # encoders fp16): opt-in, off for parity runs.
    quant_encoders: bool = False
    # Paths to converted pretrained weights (empty = random init).
    llm_weights: str = ""
    vit_weights: str = ""
    beats_weights: str = ""
    video_qformer_weights: str = ""
    audio_qformer_weights: str = ""
    blip2_stage1_weights: str = ""
    tokenizer_path: str = ""


_DATACLASS_FIELD_TYPES = {
    ("XInstructBLIPConfig", "vit"): ViTConfig,
    ("XInstructBLIPConfig", "beats"): BeatsConfig,
    ("XInstructBLIPConfig", "qformer"): QFormerConfig,
    ("XInstructBLIPConfig", "llm"): LlamaConfig,
    ("XInstructBLIPConfig", "lora"): LoraConfig,
    ("DataConfig", "audio"): AudioFrontendConfig,
    ("RunConfig", "model"): XInstructBLIPConfig,
    ("RunConfig", "data"): DataConfig,
    ("RunConfig", "train"): TrainConfig,
    ("RunConfig", "mesh"): MeshConfig,
}


# --------------------------------------------------------------------------
# Tiny presets (tests / compile smoke)
# --------------------------------------------------------------------------


def tiny_model_config(
    modalities: tuple = ("audio", "video"), quantization: str = "none"
) -> XInstructBLIPConfig:
    """A few-thousand-parameter model with the full architecture: every
    wiring path (interleave, cross-attn frequency, LoRA, decode) is
    exercised at toy width so tests compile in seconds."""
    return XInstructBLIPConfig(
        modalities=modalities,
        vit=ViTConfig(image_size=28, patch_size=14, width=32, depth=2, num_heads=2, mlp_dim=64),
        beats=BeatsConfig(
            num_mel_bins=16, patch_size=4, patch_stride=4, conv_dim=16, width=32,
            depth=2, num_heads=2, mlp_dim=64, conv_pos_kernel=8, conv_pos_groups=2,
            rel_pos_buckets=16, rel_pos_max_distance=32,
        ),
        qformer=QFormerConfig(
            hidden_size=32, num_layers=2, num_heads=2, intermediate_size=64,
            num_query_tokens=4, vocab_size=260, max_position_embeddings=64,
        ),
        llm=LlamaConfig(
            vocab_size=260, hidden_size=64, num_layers=2, num_heads=4,
            num_kv_heads=4, intermediate_size=128, max_seq_len=2048,
            quantization=quantization,
        ),
        lora=LoraConfig(rank=2, alpha=2),
        max_txt_len=48,
        max_output_txt_len=24,
        max_new_tokens=8,
        tokens_per_timestamp=6,
        tokens_per_duration=6,
    )


def full_model_config() -> XInstructBLIPConfig:
    """The production-size stack as it actually deploys on one 16 GB
    v5e chip: int8 7B weights + int8 KV cache.  The all-defaults
    ``XInstructBLIPConfig()`` is the *reference-semantics* description
    (bf16 7B ≈ 14 GB of params) and cannot run single-chip — CLIs that
    accept ``--model-size full`` must use this config, matching
    ``bench.py::make_profile`` (docs/BENCHMARKS.md "Memory")."""
    return XInstructBLIPConfig(
        llm=LlamaConfig(quantization="int8", kv_quant="int8",
                        vocab_pad_multiple=8)
    )


def apply_fast_preset(cfg: "RunConfig") -> "RunConfig":
    """The measured stacked-throughput preset (``evaluate --fast``):

    * temporal-residual ViT (keyframe_interval=4, residual_tokens=64) —
      non-key frames run the transformer on their 64 most-changed
      patches only (an approximation);
    * yuv420 wire — half the host→device video bytes (lossless vs the
      4:2:0 source);
    * grammar-constrained decoding with forced-token speculation —
      every generation parses by construction (invalid_pred_num == 0).

    Measured together at QVH full size: 0.7338 clips/s vs the 0.6294
    exact headline (+17%, docs/BENCHMARKS.md).  Quality-gated by
    tests/test_fast_preset.py on a task-solving synthetic model."""
    model = cfg.model.replace(
        vit=cfg.model.vit.replace(keyframe_interval=4, residual_tokens=64),
        constrained_decoding=True,
        spec_width=4,
        video_wire="yuv420",
    )
    data = cfg.data.replace(video_wire="yuv420")
    return cfg.replace(model=model, data=data)


def tiny_data_config(n_frms: int = 4) -> DataConfig:
    return DataConfig(
        dataset="QVH",
        n_frms=n_frms,
        image_size=28,
        video_source="synthetic",
        audio=AudioFrontendConfig(num_mel_bins=16, mel_frames_per_chunk=32),
    )
