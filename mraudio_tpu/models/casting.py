"""Parameter casting for inference.

Parameters are kept in fp32 (training master copies; layer norms reduce
in fp32 regardless).  At inference the decode loop is weight-bandwidth
bound — every step re-reads the LLM weights from HBM — so serving fp32
weights costs 2x the bytes of the bf16 the MXU consumes anyway.
:func:`cast_params_for_inference` converts matmul/embedding weights to
bf16 once; norm scales/biases and quantization scales stay fp32 (tiny,
and their math is fp32).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Leaf names that must stay fp32: norm parameters and quant scales.
_KEEP_FP32 = ("scale", "bias")
# Path fragments whose subtree must stay fp32 (fp32-reducing norms).
_KEEP_FP32_SCOPES = ("norm", "ln", "LayerNorm")


def cast_params_for_inference(params, dtype=jnp.bfloat16):
    def visit(path, leaf):
        names = [str(getattr(p, "key", p)) for p in path]
        if leaf.dtype == jnp.int8:
            return leaf
        if not jnp.issubdtype(leaf.dtype, jnp.floating):
            return leaf
        if names[-1] in _KEEP_FP32 and any(
            any(s in n for s in _KEEP_FP32_SCOPES) for n in names[:-1]
        ):
            return leaf
        if names[-1] == "scale" or names[-1].endswith("_scale"):
            # quant scales (int8 `scale`, int4 `w_int4_scale`) / RMSNorm
            return leaf
        return leaf.astype(dtype)

    return jax.tree_util.tree_map_with_path(visit, params)
