"""Parameter partition rules (path-regex → PartitionSpec).

Megatron-style tensor parallelism for the Llama decoder over the
``model`` axis: column-parallel q/k/v and gate/up (output features
sharded), row-parallel o_proj and down_proj (input features sharded), so
each transformer block needs exactly one all-reduce per sublayer — the
layout the scaling-book recipe prescribes for ICI.  LoRA adapters shard
with their base projection (A replicated, B like the base output).  The
encoders and Q-Formers are small relative to the LLM and stay
replicated; batch parallelism over ``data`` covers them.

The first matching rule wins; anything unmatched is replicated.
"""

from __future__ import annotations

import re

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


# (regex over "a/b/c" param path, spec). Paths include the top-level
# component key ("llm", "vit", ...) from the assembly params dict.
LLM_RULES: list[tuple[str, P]] = [
    # column-parallel projections: out features on "model"
    (r"llm/.*(q_proj|k_proj|v_proj|gate_proj|up_proj)/kernel$", P(None, "model")),
    (r"llm/.*(q_proj|k_proj|v_proj|gate_proj|up_proj)/w_int8$", P(None, "model")),
    # int4 weights are (groups, group, out); their scale (groups, out)
    (r"llm/.*(q_proj|k_proj|v_proj|gate_proj|up_proj)/w_int4$", P(None, None, "model")),
    (r"llm/.*(q_proj|k_proj|v_proj|gate_proj|up_proj)/w_int4_scale$", P(None, "model")),
    (r"llm/.*(q_proj|k_proj|v_proj|gate_proj|up_proj)/scale$", P("model")),
    (r"llm/.*(q_proj|k_proj|v_proj|gate_proj|up_proj)/lora_b$", P(None, "model")),
    # row-parallel projections: in features on "model"
    (r"llm/.*(o_proj|down_proj)/kernel$", P("model", None)),
    (r"llm/.*(o_proj|down_proj)/w_int8$", P("model", None)),
    (r"llm/.*(o_proj|down_proj)/w_int4$", P("model", None, None)),
    (r"llm/.*(o_proj|down_proj)/w_int4_scale$", P("model", None)),
    (r"llm/.*(o_proj|down_proj)/scale$", P()),
    (r"llm/.*(o_proj|down_proj)/lora_a$", P("model", None)),
    # lm_head: vocab-sharded (argmax over a sharded axis is a cheap
    # all-reduce of (index, value) pairs emitted by XLA).  Needs
    # config.vocab_pad_multiple to tile evenly — the Vicuna 32001 vocab
    # otherwise falls back to replicated via the shape-aware fixup.
    (r"llm/lm_head/kernel$", P(None, "model")),
    (r"llm/lm_head/w_int8$", P(None, "model")),
    (r"llm/lm_head/scale$", P("model")),
    # embeddings vocab-sharded too (fp32 table is ~524 MB padded): the
    # lookup becomes a masked local gather + one small psum per step —
    # cheap next to the hidden-dim gather a feature-sharded table would
    # need.  Uneven vocab (pad_multiple=1) replicates via the fixup.
    (r"llm/embed_tokens/embedding$", P("model", None)),
]

# Frozen encoder/Q-Former subtrees (XInstructBLIP.ENCODER_PARAM_KEYS +
# VideoLLaMA towers): ~1.3B params that round 4 left fully replicated,
# which together with the LLM blocked every data>1 production mesh from
# fitting 16 GB (FULLSIZE_SPECS_r04).  They are frozen — no grad or
# optimizer traffic — so ZeRO-3/FSDP sharding over the ``data`` axis is
# free aside from an all-gather at each use, which XLA's SPMD partitioner
# inserts automatically from the sharding annotation (the scaling-book
# "sharded params, gathered on use" recipe).  Rather than per-tensor
# regexes over four heterogeneous architectures, `param_shardings`
# applies a generic rule to every leaf under these prefixes: shard the
# largest dimension that tiles evenly over ("data",).
FSDP_PREFIXES = (
    # The four big frozen towers only (~1.3B of the ~1.33B frozen
    # non-LLM params).  "vit/" and "beats/" also cover the VideoLLaMA
    # assembly (same top-level keys).  Deliberately NOT included: the
    # tiny per-modality ln/proj/query_tokens leaves (~25 MB total —
    # replication is free and X-InstructBLIP's "audio_proj" name
    # collides with VideoLLaMA's TRAINABLE audio projector, which must
    # stay replicated so its grads/optimizer state aren't data-sharded).
    "vit/", "beats/", "video_qformer/", "audio_qformer/",
)


def _fsdp_spec(leaf, data_size: int) -> P | None:
    """Largest-dim FSDP spec for a frozen leaf, or None if no dimension
    tiles evenly over the data axis (leaf stays replicated)."""
    if data_size <= 1 or leaf.ndim == 0:
        return None
    dims = sorted(range(leaf.ndim), key=lambda i: -leaf.shape[i])
    for i in dims:
        if leaf.shape[i] % data_size == 0 and leaf.shape[i] >= data_size:
            axes = [None] * leaf.ndim
            axes[i] = "data"
            return P(*axes)
    return None


def _match(path: str, rules) -> P:
    for pattern, spec in rules:
        if re.search(pattern, path):
            return spec
    return P()


def _path_str(path) -> str:
    return "/".join(str(getattr(p, "key", p)) for p in path)


def param_shardings(params, mesh: Mesh, rules=None, fsdp_encoders=True):
    """Pytree of NamedShardings matching ``params``.

    Shape-aware: a rule axis that does not tile its dimension evenly is
    dropped (that dimension replicates).  GSPMD requires even input
    tiling, and real shapes break naive rules — e.g. the raw Vicuna
    vocab is 32001 (32000 + [PAD]), so without config.vocab_pad_multiple
    the lm_head vocab-sharding rule cannot apply on a 4-wide model axis
    (caught by ``__graft_entry__.dryrun_fullsize_specs``).

    ``fsdp_encoders``: ZeRO-3-shard the frozen encoder subtrees
    (FSDP_PREFIXES) over the ``data`` axis — see FSDP_PREFIXES."""
    rules = LLM_RULES if rules is None else rules
    data_size = mesh.shape.get("data", 1) if fsdp_encoders else 1

    def to_sharding(path, leaf):
        p = _path_str(path)
        spec = _match(p, rules)
        if not len(spec) and data_size > 1 and p.startswith(FSDP_PREFIXES):
            fs = _fsdp_spec(leaf, data_size)
            if fs is not None:
                return NamedSharding(mesh, fs)
        if "/layers/" in p and len(spec):
            # cfg.scan_layers: leaves carry a leading (num_layers,)
            # axis — the TP axes shift right by one.
            spec = P(None, *spec)
        if len(spec) > leaf.ndim:
            spec = P(*spec[: leaf.ndim])
        fixed = []
        for i, axis in enumerate(spec):
            if axis is not None:
                size = 1
                for name in (axis if isinstance(axis, tuple) else (axis,)):
                    size *= mesh.shape[name]
                if leaf.shape[i] % size != 0:
                    axis = None  # uneven: replicate this dimension
            fixed.append(axis)
        return NamedSharding(mesh, P(*fixed))

    return jax.tree_util.tree_map_with_path(to_sharding, params)


def shard_params(params, mesh: Mesh, rules=None, fsdp_encoders=True):
    """Place a host param tree onto the mesh per the rules."""
    shardings = param_shardings(params, mesh, rules,
                                fsdp_encoders=fsdp_encoders)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis data parallelism for batch arrays."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
