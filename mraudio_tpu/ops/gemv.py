"""Pallas decode GEMV with order-preserving f32 accumulation.

Round-4 measurement (docs/BENCHMARKS.md, scripts/
microbench_decode_matmul.py): the single-chip decode step is
element-rate-bound — the MXU streams GEMV weights at ~125–160 G
elements/s regardless of byte width — and XLA's split-K rewrite buys
−11% but reorders the f32 accumulation, breaking the bit-exact HF-Llama
parity the test suite pins (reference loads the same weights through
HF, ``/root/reference/models/xinstructblip.py:147-149``).

This kernel takes both: the K (contraction) axis is tiled over the
LAST grid dimension, which Mosaic executes SEQUENTIALLY, so each output
tile's f32 partial sums accumulate in a FIXED ascending-k order — the
same per-output reduction order every time, independent of tile sizes —
while the (n, k) grid double-buffers the weight-tile DMA stream
(HBM→VMEM) against the MXU work, the thing the one-shot XLA GEMV leaves
on the table.

Matches ``models/llama.py::LlamaLinear`` math exactly per path:
  float  — dot(x.bf16, w.bf16, preferred f32) -> out dtype
  int8   — dot(x.bf16, w_int8.bf16, preferred f32) * scale -> out dtype
           (weight-only quantization: dequant fuses into the weight read)

Compilation note (CLAUDE.md): Mosaic kernels cannot compile through
this build host's remote tunnel, so the kernel is validated in
interpret mode (token parity + allclose vs the XLA path,
``tests/test_gemv.py``) and config-gated off by default
(``LlamaConfig.decode_gemv``); flip to "pallas" on direct-attached
TPUs.  ``scripts/microbench_decode_matmul.py --pallas`` is the
measurement hook.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_block(dim: int, candidates=(512, 256, 128)) -> int:
    for c in candidates:
        if dim % c == 0:
            return c
    if dim <= 512 and dim % 8 == 0:
        return dim  # small (test-size) dims: one tile, no blocking
    return 0


def supports(in_features: int, out_features: int) -> bool:
    """Whether the kernel's even-tiling requirement holds (the lm_head's
    padded 32008 vocab does not tile; it stays on the XLA path)."""
    return bool(_pick_block(in_features) and _pick_block(out_features))


def _gemv_kernel(x_ref, w_ref, out_ref, acc_ref, *, k_tiles, out_dtype):
    """One (n, k) grid cell: acc += x_tile @ w_tile.

    k is the LAST grid axis → sequential per output tile, so the f32
    accumulation order is fixed (ascending k), preserving determinism
    across runs and block-size choices.  (Pallas passes scratch refs
    after the out refs.)"""
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(
        x_ref[:], w_ref[:].astype(x_ref.dtype),
        preferred_element_type=jnp.float32,
    )

    @pl.when(k == k_tiles - 1)
    def _emit():
        out_ref[:] = acc_ref[:].astype(out_dtype)


@functools.partial(
    jax.jit,
    static_argnames=("out_dtype", "block_n", "block_k", "interpret"),
)
def decode_gemv(
    x: jax.Array,          # (B, K) activations (bf16/f32)
    w: jax.Array,          # (K, N) weights (bf16/f32 or int8)
    scale: jax.Array | None = None,   # (N,) fp32 for int8 weights
    *,
    out_dtype=jnp.bfloat16,
    block_n: int = 0,
    block_k: int = 0,
    interpret: bool = False,
) -> jax.Array:
    """y = (x @ w) [* scale], f32 accumulation in fixed ascending-k
    order per output tile.  Rows B stay small (decode: B = slots, or
    B·W for a speculative verify pass) — the whole x fits VMEM."""
    b, kdim = x.shape
    _, n = w.shape
    bn = block_n or _pick_block(n)
    bk = block_k or _pick_block(kdim)
    if not bn or not bk:
        raise ValueError(f"dims must tile evenly: K={kdim}, N={n}")
    k_tiles = kdim // bk

    # f32 emit, scale applied OUTSIDE the kernel exactly like LlamaLinear
    # (acc * scale).astype(dtype) — same rounding sequence.
    acc_dtype = jnp.float32 if scale is not None else out_dtype
    y = pl.pallas_call(
        functools.partial(
            _gemv_kernel, k_tiles=k_tiles,
            out_dtype=acc_dtype,
        ),
        grid=(n // bn, k_tiles),
        in_specs=[
            pl.BlockSpec((b, bk), lambda ni, ki: (0, ki)),
            pl.BlockSpec((bk, bn), lambda ni, ki: (ki, ni)),
        ],
        out_specs=pl.BlockSpec((b, bn), lambda ni, ki: (0, ni)),
        out_shape=jax.ShapeDtypeStruct((b, n), acc_dtype),
        scratch_shapes=[pltpu.VMEM((b, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            # n tiles are independent (megacore may split them); k MUST
            # stay sequential for the ordered accumulation
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(x, w)
    if scale is not None:
        y = (y * scale).astype(out_dtype)
    return y
