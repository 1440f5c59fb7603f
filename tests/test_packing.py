"""Packed host->device subtree transfer (utils/packing.py).

No reference counterpart — TPU-runtime plumbing for the windowed
trainer's per-window encoder upload.  The contract that matters is
bit-exactness across mixed dtypes (int8 quantized weights, f32 scales,
bf16 floats) and jit-ability of the unpack (one dispatch)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mraudio_tpu.utils.packing import (
    make_packed_uploader,
    pack_tree,
    unpack_tree,
)


@pytest.fixture
def tree():
    rng = np.random.default_rng(0)
    return {
        ("vit", "w_int8"): rng.integers(-127, 128, (37, 64), np.int8),
        ("vit", "scale"): rng.standard_normal((64,)).astype(np.float32),
        ("beats", "kernel"): jnp.asarray(
            rng.standard_normal((16, 8)), jnp.bfloat16
        ),
        ("beats", "bias"): rng.standard_normal((8,)).astype(np.float32),
        ("odd", "i32"): rng.integers(-1000, 1000, (5, 3, 2), np.int32),
        ("odd", "scalar"): np.float32(3.25).reshape(()),
    }


def _assert_tree_equal(got, want):
    assert set(got) == set(want)
    for k in want:
        w = np.asarray(want[k])
        g = np.asarray(got[k])
        assert g.dtype == w.dtype, k
        assert g.shape == w.shape, k
        np.testing.assert_array_equal(g, w, err_msg=str(k))


def test_pack_unpack_roundtrip_bit_exact(tree):
    buffers, metas = pack_tree(tree)
    # native per-dtype buffers, 1-D (no bitcasts, no lane-padding traps)
    assert all(b.ndim == 1 for b in buffers.values())
    assert set(buffers) == {"int8", "float32", "bfloat16", "int32"}
    _assert_tree_equal(unpack_tree(buffers, metas), tree)


def test_unpack_is_one_jitted_dispatch(tree):
    buffers, metas = pack_tree(tree)
    unpack = jax.jit(lambda b: unpack_tree(b, metas))
    dev = {dt: jnp.asarray(b) for dt, b in buffers.items()}
    _assert_tree_equal(unpack(dev), tree)


def test_packed_uploader_matches_device_put(tree):
    upload, nbytes = make_packed_uploader(tree)
    assert nbytes == sum(np.asarray(v).nbytes for v in tree.values())
    dev = upload()
    _assert_tree_equal(dev, tree)
    # reusable: buffers are re-put per call (the unpack donates them)
    _assert_tree_equal(upload(), tree)
