"""YUV420 host→device wire format (ops/image.py, config.video_wire).

Ships I420 planes (half the bytes of RGB24) and reconstructs RGB on
device.  Oracles: a numpy re-implementation of the unpack, analytic
bounds on the pack→unpack round trip, and end-to-end equivalence of the
assembly on luma-only content (where 4:2:0 subsampling discards
nothing).
"""

import numpy as np

import jax.numpy as jnp

from mraudio_tpu.ops.image import rgb_to_yuv420, yuv420_to_rgb


def _unpack_oracle(wire: np.ndarray) -> np.ndarray:
    """Independent numpy I420 → RGB (BT.601 LIMITED range — the codec
    wire convention — with 2x2 chroma replication)."""
    lead, (hp, w) = wire.shape[:-2], wire.shape[-2:]
    h = hp * 2 // 3
    q = h // 4
    y = (wire[..., :h, :].astype(np.float32) - 16.0) * (255.0 / 219.0)
    u = wire[..., h:h + q, :].astype(np.float32).reshape(lead + (h // 2, w // 2))
    v = wire[..., h + q:, :].astype(np.float32).reshape(lead + (h // 2, w // 2))
    u = (u.repeat(2, axis=-2).repeat(2, axis=-1) - 128.0) * (255.0 / 224.0)
    v = (v.repeat(2, axis=-2).repeat(2, axis=-1) - 128.0) * (255.0 / 224.0)
    r = y + 1.402 * v
    g = y - 0.344136 * u - 0.714136 * v
    b = y + 1.772 * u
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255)


def test_wire_is_half_the_bytes():
    frames = np.random.default_rng(0).integers(
        0, 256, (2, 4, 32, 32, 3), dtype=np.uint8
    )
    wire = rgb_to_yuv420(frames)
    assert wire.dtype == np.uint8
    assert wire.shape == (2, 4, 48, 32)
    assert wire.nbytes * 2 == frames.nbytes


def test_device_unpack_matches_numpy_oracle():
    rng = np.random.default_rng(1)
    wire = rng.integers(0, 256, (2, 3, 48, 32), dtype=np.uint8)
    got = np.asarray(yuv420_to_rgb(jnp.asarray(wire)))
    want = _unpack_oracle(wire)
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_gray_content_round_trips_exactly():
    """Luma-only frames have constant chroma — 4:2:0 discards nothing,
    so pack→unpack must be identity up to rounding (±1 count)."""
    rng = np.random.default_rng(2)
    gray = rng.integers(0, 256, (1, 2, 16, 16, 1), dtype=np.uint8)
    frames = np.repeat(gray, 3, axis=-1)
    recon = np.asarray(yuv420_to_rgb(jnp.asarray(rgb_to_yuv420(frames))))
    assert np.max(np.abs(recon - frames.astype(np.float32))) <= 1.0


def test_smooth_content_error_is_small():
    """On smooth gradients (video-like content) the chroma box-filter
    loses little: reconstruction within a few counts."""
    h = w = 32
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    r = (yy / h * 255).astype(np.uint8)
    g = (xx / w * 255).astype(np.uint8)
    b = ((yy + xx) / (h + w) * 255).astype(np.uint8)
    frames = np.stack([r, g, b], axis=-1)[None, None]
    recon = np.asarray(yuv420_to_rgb(jnp.asarray(rgb_to_yuv420(frames))))
    assert np.max(np.abs(recon - frames.astype(np.float32))) <= 8.0
    assert np.mean(np.abs(recon - frames.astype(np.float32))) <= 2.5


def test_dataset_emits_packed_wire(tmp_path):
    """data.video_wire="yuv420": the dataset ships I420 directly (on the
    native source that is a raw codec-plane copy) and the model's
    _wire_video passes it through unpacked."""
    import json

    from mraudio_tpu.config import tiny_data_config
    from mraudio_tpu.data.dataset import MRDataset, collate

    path = str(tmp_path / "ann.jsonl")
    with open(path, "w") as f:
        f.write(json.dumps({
            "vid": "v0", "qid": 0, "query": "q", "duration": 150,
            "relevant_windows": [[10, 30]],
        }) + "\n")
    cfg = tiny_data_config(n_frms=4).replace(video_wire="yuv420")
    ds = MRDataset(cfg, annotation_path=path)
    sample = ds.get(0)
    size = cfg.image_size
    assert sample.video.shape == (4, size * 3 // 2, size)
    batch = collate([sample], 1)

    # synthetic source: packed output == packing the RGB decode
    rgb_ds = MRDataset(cfg.replace(video_wire="rgb"), annotation_path=path)
    expect = rgb_to_yuv420(rgb_ds.get(0).video)
    np.testing.assert_array_equal(sample.video, expect)

    # model pass-through: already-packed input is not re-packed
    from mraudio_tpu.config import tiny_model_config
    from mraudio_tpu.models.xinstructblip import XInstructBLIP

    model = XInstructBLIP(
        tiny_model_config().replace(video_wire="yuv420"),
        audio_cfg=cfg.audio,
    )
    np.testing.assert_array_equal(model._wire_video(batch.video), batch.video)


def test_native_i420_matches_native_rgb(tmp_path):
    """The native decoder's I420 output, reconstructed on device, must
    agree with its own RGB24 output (same swscale source, limited-range
    expansion applied on device instead of in swscale)."""
    from mraudio_tpu.data import native_bindings as nb

    try:
        lib = nb.load()
    except nb.NativeUnavailable:
        import pytest

        pytest.skip("native library unavailable")
    h = w = 64
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    f0 = np.stack(
        [yy / h * 255, xx / w * 255, (yy + xx) / (h + w) * 255], -1
    ).astype(np.uint8)
    frames = np.stack([f0, 255 - f0, f0 // 2, f0 // 3], 0)
    path = str(tmp_path / "t.mp4")
    nb.write_test_video(lib, path, frames, 10.0)
    idx = np.arange(4)
    rgb = nb.decode_frames(lib, path, idx, h, w).astype(np.float32)
    wire = nb.decode_frames_i420(lib, path, idx, h, w)
    recon = np.asarray(yuv420_to_rgb(jnp.asarray(wire)))
    diff = np.abs(recon - rgb)
    assert diff.max() <= 6.0, diff.max()
    assert diff.mean() <= 1.5, diff.mean()


def test_assembly_generate_with_yuv_wire(tmp_path):
    import json

    import jax

    from mraudio_tpu.config import tiny_data_config, tiny_model_config
    from mraudio_tpu.data.dataset import MRDataset, collate
    from mraudio_tpu.models.xinstructblip import XInstructBLIP

    path = str(tmp_path / "ann.jsonl")
    with open(path, "w") as f:
        for i in range(2):
            f.write(json.dumps({
                "vid": f"v{i}", "qid": i, "query": f"q {i}",
                "duration": 150, "relevant_windows": [[10, 30]],
            }) + "\n")
    ds = MRDataset(tiny_data_config(n_frms=4), annotation_path=path)
    batch = collate([ds.get(i) for i in range(2)], 2)

    cfg_rgb = tiny_model_config()
    model_rgb = XInstructBLIP(cfg_rgb, audio_cfg=tiny_data_config().audio)
    params = model_rgb.init_params(jax.random.PRNGKey(0))

    cfg_yuv = cfg_rgb.replace(video_wire="yuv420")
    model_yuv = XInstructBLIP(cfg_yuv, audio_cfg=tiny_data_config().audio)

    # luma-only batch: the two wire formats see (nearly) identical
    # pixels, so generations and losses must agree
    gray = batch.video.mean(axis=-1, keepdims=True).astype(np.uint8)
    batch.video = np.repeat(gray, 3, axis=-1)

    out_rgb = model_rgb.generate(params, batch)
    out_yuv = model_yuv.generate(params, batch)
    assert out_rgb == out_yuv

    loss_rgb = float(model_rgb.loss(params, batch))
    loss_yuv = float(model_yuv.loss(params, batch))
    assert abs(loss_rgb - loss_yuv) < 0.05
