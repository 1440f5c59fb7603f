"""Packed host→device transfer of large param subtrees.

Re-provides nothing from the reference (`/root/reference` has no remote
devices); this is TPU-runtime plumbing for the windowed trainer
(`train/trainer.py::_train_epoch_windowed`).

Motivation (measured, docs/ROUND4.md): uploading the 1.44 GB int8
encoder subtree leaf-by-leaf (~700 `jax.device_put` calls) costs
~49 s/window through the remote runtime — ~60 ms per-transfer overhead
dwarfs the bytes, which the same tunnel moves at ~1 GB/s for large
buffers.  Packing the subtree into ONE 1-D buffer *per dtype* makes the
upload a handful of transfers; a single jitted unpack (dynamic_slice +
reshape per leaf) rebuilds the tree on device in one dispatch.

Bit-exact by construction: leaves are concatenated in their NATIVE
dtypes (bf16 via the ml_dtypes numpy extension that ships with jax), so
no bitcasting is involved.  An earlier bitcast-based design died in the
TPU layout assigner: reinterpreting a 1.5 GB uint8 buffer as (N, 4)
rows gives the minor dim 4 of a 128-lane tile — a 32× padded, 49 GB
"reshape" allocation.  1-D slices + leaf-shaped reshapes have no such
trap (leaf minor dims are real tensor dims).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def pack_tree(tree: dict):
    """Serialize a flat dict of host arrays into per-dtype 1-D buffers.

    Returns ``(buffers, metas)``: ``buffers`` maps dtype-name → 1-D
    numpy array in that dtype; ``metas`` is ``(key, shape, dtype_name,
    offset_elements)`` per leaf in deterministic key order."""
    keys = sorted(tree, key=str)
    chunks: dict[str, list] = {}
    metas = []
    offsets: dict[str, int] = {}
    for k in keys:
        a = np.asarray(tree[k])
        dt = a.dtype.name
        off = offsets.get(dt, 0)
        metas.append((k, a.shape, dt, off))
        chunks.setdefault(dt, []).append(a.ravel())
        offsets[dt] = off + a.size
    buffers = {dt: np.concatenate(parts) for dt, parts in chunks.items()}
    return buffers, metas


def unpack_tree(buffers: dict, metas) -> dict:
    """Rebuild the packed tree from (device) per-dtype buffers — jit me.

    Each leaf is a 1-D dynamic slice + reshape; under jit the whole
    rebuild is ONE dispatch.  Works on host numpy inputs too, so the
    round trip is testable without a device."""
    out = {}
    for k, shape, dt, off in metas:
        n = int(np.prod(shape, dtype=np.int64)) if shape else 1
        flat = jax.lax.dynamic_slice(buffers[dt], (off,), (n,))
        out[k] = flat.reshape(shape)
    return out


def make_packed_uploader(tree: dict):
    """(upload_fn, nbytes): ``upload_fn()`` device_puts the per-dtype
    buffers (one transfer each — typically 2-3 for a quantized subtree)
    and rebuilds the tree in one jitted dispatch.  Buffers are donated
    to the unpack so XLA may overlay leaves onto them.

    Host-RAM note: the closure keeps the packed copy alive next to the
    caller's original leaves (~2× the subtree in host RAM) — the copy
    IS what gets re-uploaded every window, so it cannot be freed after
    first use.  Deliberate: this host holds 125 GB; trading ~1.4 GB of
    RAM for a per-window repack would cost ~1 s of CPU each window."""
    buffers, metas = pack_tree(tree)

    unpack = jax.jit(lambda b: unpack_tree(b, metas), donate_argnums=0)

    def stage():
        """Issue the transfers only (async device_put — they stream
        over the wire while unrelated device work runs) and return the
        raw staged buffers.  Pass them to ``upload`` later to unpack;
        the unpack dispatch is what synchronizes on the transfer, so
        deferring it is what makes upload/compute overlap possible
        (the windowed trainer stages window k+1 while window k's LLM
        steps run)."""
        return {dt: jax.device_put(b) for dt, b in buffers.items()}

    def upload(staged=None):
        return unpack(stage() if staged is None else staged)

    upload.stage = stage
    return upload, sum(b.nbytes for b in buffers.values())
