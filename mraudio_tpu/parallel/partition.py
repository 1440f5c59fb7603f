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
    # all-reduce of (index, value) pairs emitted by XLA)
    (r"llm/lm_head/kernel$", P(None, "model")),
    (r"llm/lm_head/w_int8$", P(None, "model")),
    (r"llm/lm_head/scale$", P("model")),
    # embeddings replicated (hidden-dim gathers would serialize decode)
    (r"llm/embed_tokens/", P()),
]


def _match(path: str, rules) -> P:
    for pattern, spec in rules:
        if re.search(pattern, path):
            return spec
    return P()


def _path_str(path) -> str:
    return "/".join(str(getattr(p, "key", p)) for p in path)


def param_shardings(params, mesh: Mesh, rules=None):
    """Pytree of NamedShardings matching ``params``.

    Shape-aware: a rule axis that does not tile its dimension evenly is
    dropped (that dimension replicates).  GSPMD requires even input
    tiling, and real shapes break naive rules — e.g. the Vicuna vocab is
    32001 (32000 + [PAD]), so the lm_head vocab-sharding rule cannot
    apply on a 4-wide model axis (caught by
    ``__graft_entry__.dryrun_fullsize_specs``)."""
    rules = LLM_RULES if rules is None else rules

    def to_sharding(path, leaf):
        p = _path_str(path)
        spec = _match(p, rules)
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


def shard_params(params, mesh: Mesh, rules=None):
    """Place a host param tree onto the mesh per the rules."""
    shardings = param_shardings(params, mesh, rules)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis data parallelism for batch arrays."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
