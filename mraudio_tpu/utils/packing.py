"""Packed host→device transfer of large param subtrees.

Re-provides nothing from the reference (`/root/reference` has no remote
devices); this is TPU-runtime plumbing for the windowed trainer
(`train/trainer.py::_train_epoch_windowed`).

Motivation (measured, docs/ROUND4.md): uploading the 1.44 GB int8
encoder subtree leaf-by-leaf (~700 `jax.device_put` calls) costs
~49 s/window through the remote runtime — ~60 ms per-transfer overhead
dwarfs the bytes, which the same tunnel moves at ~1 GB/s for large
buffers.  Packing the subtree into ONE uint8 buffer makes the upload a
single transfer; a single jitted unpack (slice + bitcast + reshape per
leaf) rebuilds the tree on device in one dispatch.

Bit-exact: bitcast_convert_type reinterprets the very bytes that
``pack_tree`` serialized (same little-endian layout on host and TPU).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def pack_tree(tree: dict):
    """Serialize a flat dict of host arrays into (uint8 buffer, metas).

    ``metas`` is a list of ``(key, shape, dtype, offset_bytes)`` in a
    deterministic key order.  Leaf offsets are aligned to each dtype's
    itemsize (bitcast needs whole elements; alignment padding is
    negligible next to the leaves)."""
    keys = sorted(tree)
    metas = []
    offset = 0
    for k in keys:
        a = np.asarray(tree[k])
        item = a.dtype.itemsize
        offset = (offset + item - 1) // item * item
        metas.append((k, a.shape, a.dtype, offset))
        offset += a.nbytes
    buf = np.zeros(offset, np.uint8)
    for (k, shape, dtype, off) in metas:
        a = np.ascontiguousarray(tree[k])
        buf[off : off + a.nbytes] = a.view(np.uint8).ravel()
    return buf, metas


def unpack_tree(buf, metas) -> dict:
    """Rebuild the packed tree from the (device) buffer — jit me.

    Each leaf is a dynamic slice + bitcast + reshape; under jit the
    whole rebuild is ONE dispatch.  Works on host numpy inputs too (jnp
    ops accept them), so the round trip is testable without a device."""
    out = {}
    for k, shape, dtype, off in metas:
        n = int(np.prod(shape, dtype=np.int64)) if shape else 1
        item = np.dtype(dtype).itemsize
        flat = jax.lax.dynamic_slice(buf, (off,), (n * item,))
        jdt = jnp.dtype(dtype)
        if item == 1:
            leaf = jax.lax.bitcast_convert_type(flat, jdt)
        else:
            leaf = jax.lax.bitcast_convert_type(flat.reshape(n, item), jdt)
        out[k] = leaf.reshape(shape)
    return out


def make_packed_uploader(tree: dict):
    """(upload_fn, nbytes): ``upload_fn()`` device_puts the packed buffer
    (one transfer) and rebuilds the tree in one jitted dispatch.  The
    buffer is donated to the unpack so XLA may overlay leaves onto it."""
    buf, metas = pack_tree(tree)

    unpack = jax.jit(lambda b: unpack_tree(b, metas), donate_argnums=0)

    def upload():
        return unpack(jax.device_put(buf))

    return upload, buf.nbytes
