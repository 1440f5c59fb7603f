"""Analytic FLOP accounting for the inference pipeline → honest MFU.

Counts matmul FLOPs (2 per multiply-accumulate) per pipeline stage from
the configs, so the benchmark can report model-FLOPs utilization against
the chip's peak instead of a bare clips/s number.  Elementwise work
(norms, activations, softmax exp) is ignored — it is HBM-bound and <1%
of the matmul FLOPs at these widths.
"""

from __future__ import annotations

import dataclasses


# bf16 peak matmul throughput per chip, by jax device_kind.
PEAK_FLOPS = {
    "TPU v5 lite": 197e12,       # v5e
    "TPU v5e": 197e12,
    "TPU v4": 275e12,
    "TPU v5p": 459e12,
    "TPU v6 lite": 918e12,       # v6e / Trillium
    "cpu": 5e10,                 # 1-core host, rough
}


def peak_flops_for(device_kind: str) -> float:
    for key, val in PEAK_FLOPS.items():
        if key.lower() in device_kind.lower():
            return val
    return 197e12


def transformer_flops(
    tokens: int, width: int, depth: int, mlp_dim: int,
    kv_len: float | None = None, kv_width: int | None = None,
    n_mlp_mats: int = 2,
) -> float:
    """Forward matmul FLOPs of a transformer stack over ``tokens``
    positions.  ``kv_len`` is the attention context length per query
    (defaults to ``tokens``); ``n_mlp_mats=3`` for gated (SwiGLU) MLPs."""
    kv_len = tokens if kv_len is None else kv_len
    kv_width = width if kv_width is None else kv_width
    proj = 2 * tokens * (width * width * 2 + width * kv_width * 2)  # q,o + k,v
    attn = 2 * tokens * kv_len * width * 2                          # scores + values
    mlp = 2 * tokens * width * mlp_dim * n_mlp_mats
    return depth * (proj + attn + mlp)


def pipeline_flops(model_cfg, audio_cfg, n_frms: int, batch: int,
                   prefill_len: int, decode_tokens: int) -> dict:
    """Per-batch FLOPs of the full generate pipeline, by stage."""
    vit, beats, qf, llm = model_cfg.vit, model_cfg.beats, model_cfg.qformer, model_cfg.llm

    # --- frame encoder: n_frms folded frames per sample -----------------
    p_tok = vit.num_patches + (1 if vit.use_class_token else 0)
    f_embed = 2 * p_tok * (vit.patch_size ** 2 * 3) * vit.width  # per frame
    if vit.keyframe_interval > 1 and n_frms > 1:
        # temporal-residual: full blocks on keyframes, top-R subset on
        # the rest (patch embed still runs on every frame)
        nk = len(range(0, n_frms, vit.keyframe_interval))
        r_tok = min(vit.residual_tokens, vit.num_patches) + (
            1 if vit.use_class_token else 0
        )
        f_vit = batch * (
            nk * transformer_flops(p_tok, vit.width, vit.depth, vit.mlp_dim)
            + (n_frms - nk)
            * transformer_flops(r_tok, vit.width, vit.depth, vit.mlp_dim)
            + n_frms * f_embed
        )
    else:
        f_vit = batch * n_frms * (
            transformer_flops(p_tok, vit.width, vit.depth, vit.mlp_dim)
            + f_embed
        )

    # --- audio encoder: n_frms fbank chunks per sample ------------------
    a_tok = (audio_cfg.mel_frames_per_chunk // beats.patch_stride) * (
        beats.num_mel_bins // beats.patch_stride
    )
    f_beats = batch * n_frms * (
        transformer_flops(a_tok, beats.width, beats.depth, beats.mlp_dim)
        + 2 * a_tok * beats.patch_size ** 2 * beats.conv_dim
    )

    # --- dual Q-Formers: 32 queries (+text) attend to encoder tokens ----
    q = qf.num_query_tokens
    # per frame-row: self-attn stack over ~q+text tokens (text dominates
    # cost only via K/V; approximate with q + max_txt_len / 4)
    qf_tokens = q + model_cfg.max_txt_len // 4
    n_cross = qf.num_layers // qf.cross_attention_freq
    f_qf = 0.0
    for enc_tok, enc_w in ((p_tok, vit.width), (a_tok, beats.width)):
        f_qf += batch * n_frms * (
            transformer_flops(qf_tokens, qf.hidden_size, qf.num_layers,
                              qf.intermediate_size)
            # cross-attention K/V projections + attention, every other layer
            + n_cross * (
                2 * enc_tok * enc_w * qf.hidden_size * 2
                + 2 * q * enc_tok * qf.hidden_size * 2
            )
        )

    # --- LLM prefill -----------------------------------------------------
    kv_w = llm.num_kv_heads * llm.head_dim
    f_prefill = batch * transformer_flops(
        prefill_len, llm.hidden_size, llm.num_layers, llm.intermediate_size,
        kv_len=prefill_len / 2,  # causal: average context length
        kv_width=kv_w, n_mlp_mats=3,
    )
    # generate computes lm_head at the LAST position only
    # (infer/generate.py h=hidden[:, -1:]) — counting the full-sequence
    # (B, S, V) projection here would overstate executed FLOPs (and MFU)
    # by ~1.2% at QVH shapes
    f_prefill += batch * 2 * llm.hidden_size * llm.vocab_size

    # --- LLM decode: one token per step, full KV context -----------------
    avg_ctx = prefill_len + decode_tokens / 2
    f_decode = batch * decode_tokens * (
        transformer_flops(1, llm.hidden_size, llm.num_layers,
                          llm.intermediate_size, kv_len=avg_ctx,
                          kv_width=kv_w, n_mlp_mats=3)
        + 2 * llm.hidden_size * llm.vocab_size
    )

    total = f_vit + f_beats + f_qf + f_prefill + f_decode
    return {
        "vit": f_vit, "beats": f_beats, "qformer": f_qf,
        "prefill": f_prefill, "decode": f_decode, "total": total,
    }


def train_step_flops(model_cfg, audio_cfg, n_frms: int, batch: int,
                     seq_len: int, grad_checkpoint: bool = True) -> dict:
    """Analytic FLOPs of one LoRA train step (X-InstructBLIP assembly).

    Accounting: the encoders/Q-Formers are frozen and run forward-only
    (split_encode_step — no gradients flow into them); the LLM runs
    forward + backward-through-activations (the LoRA weight grads are
    negligible), ~2x forward for the backward, plus one full forward
    recompute under rematerialization (llm.grad_checkpoint) → 4x (3x
    without remat); training computes the full-sequence lm_head + CE
    (unlike generate's last-position head), whose backward flows through
    the frozen head weights (2x forward, no weight grad)."""
    f = pipeline_flops(model_cfg, audio_cfg, n_frms, batch, seq_len, 0)
    llm = model_cfg.llm
    last_pos_head = batch * 2 * llm.hidden_size * llm.vocab_size
    enc = f["vit"] + f["beats"] + f["qformer"]
    llm_fwd = f["prefill"] - last_pos_head
    mult = 4.0 if grad_checkpoint else 3.0
    lm_head = batch * 2 * seq_len * llm.hidden_size * llm.vocab_size * 3.0
    total = enc + llm_fwd * mult + lm_head
    return {"encoders": enc, "llm": llm_fwd * mult, "lm_head": lm_head,
            "total": total}


def videollama_flops(cfg, audio_cfg, n_frms: int, batch: int,
                     prefill_len: int, decode_tokens: int) -> dict:
    """Per-batch FLOPs of the VideoLLaMA backbone's generate pipeline
    (``models/videollama.py``): folded ViT + BEATs encoders, the STC
    connector / audio projector (two dense layers each), then LLM
    prefill + decode.  No Q-Formers on this backbone."""
    vit, beats, llm = cfg.vit, cfg.beats, cfg.llm

    p_tok = vit.num_patches + (1 if vit.use_class_token else 0)
    f_embed = 2 * p_tok * (vit.patch_size ** 2 * 3) * vit.width
    f_vit = batch * n_frms * (
        transformer_flops(p_tok, vit.width, vit.depth, vit.mlp_dim) + f_embed
    )

    a_tok = (audio_cfg.mel_frames_per_chunk // beats.patch_stride) * (
        beats.num_mel_bins // beats.patch_stride
    )
    f_beats = batch * n_frms * (
        transformer_flops(a_tok, beats.width, beats.depth, beats.mlp_dim)
        + 2 * a_tok * beats.patch_size ** 2 * beats.conv_dim
    )

    # connector (pooled video tokens) + audio projector: 2 dense each
    v_tok = (n_frms // cfg.temporal_stride) * (
        vit.num_patches // (cfg.spatial_pool ** 2)
    )
    d = llm.hidden_size
    f_conn = batch * 2 * (
        v_tok * (vit.width * d + d * d) + n_frms * (beats.width * d + d * d)
    )

    kv_w = llm.num_kv_heads * llm.head_dim
    f_prefill = batch * transformer_flops(
        prefill_len, llm.hidden_size, llm.num_layers, llm.intermediate_size,
        kv_len=prefill_len / 2, kv_width=kv_w, n_mlp_mats=3,
    )
    # last-position-only lm_head at prefill (see pipeline_flops)
    f_prefill += batch * 2 * llm.hidden_size * llm.vocab_size
    avg_ctx = prefill_len + decode_tokens / 2
    f_decode = batch * decode_tokens * (
        transformer_flops(1, llm.hidden_size, llm.num_layers,
                          llm.intermediate_size, kv_len=avg_ctx,
                          kv_width=kv_w, n_mlp_mats=3)
        + 2 * llm.hidden_size * llm.vocab_size
    )

    total = f_vit + f_beats + f_conn + f_prefill + f_decode
    return {
        "vit": f_vit, "beats": f_beats, "connector": f_conn,
        "prefill": f_prefill, "decode": f_decode, "total": total,
    }


def prefill_length(model_cfg, n_frms: int) -> int:
    """Static interleave length: per frame [cue+32 qtok] per modality +
    timestamp budget, then duration + prompt."""
    # cue token counts come from the tokenizer; approximate with the
    # byte fallback (" video: " -> 9 incl. BOS).  Callers with a model
    # instance should use its real prepare_text shapes instead.
    per_frame = (9 + 32) * len(model_cfg.modalities) + model_cfg.tokens_per_timestamp
    return n_frms * per_frame + model_cfg.tokens_per_duration + model_cfg.max_txt_len
