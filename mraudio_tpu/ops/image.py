"""On-device frame normalization and train-time augmentation.

Replaces the torchvision transforms inside LAVIS's Alpro processors
(bound at ``processors/alpro_processors.py:40-85``): eval = resize (done
at decode) + CLIP normalization; train = RandomResizedCrop(scale
0.9-1.0) + horizontal flip + the same normalization.

Host↔device contract: frames arrive uint8 (B, T, H, W, 3); everything
float happens here, fused by XLA into whatever consumes the frames.
Crop/flip parameters are sampled host-side (numpy RNG, one tuple per
clip) and applied on-device so augmentation stays jit-static.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# CLIP normalization constants (LAVIS alpro default mean/std).
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


@functools.partial(jax.jit, static_argnames=("dtype",))
def normalize_frames(frames: jax.Array, dtype=jnp.bfloat16,
                     mean=CLIP_MEAN, std=CLIP_STD) -> jax.Array:
    """uint8 (or 0..255 float) (..., H, W, 3) → normalized model dtype.

    ``mean``/``std`` default to the CLIP constants every live reference
    path uses; other towers (e.g. a SigLIP VideoLLaMA2.1 vision tower,
    which normalizes with 0.5/0.5) pass their own."""
    x = frames.astype(jnp.float32) / 255.0
    x = (x - jnp.asarray(mean)) / jnp.asarray(std)
    return x.astype(dtype)


# --- YUV420 wire format -----------------------------------------------------
#
# Video codecs store 4:2:0 chroma-subsampled YUV; converting to RGB on
# the host triples chroma bytes before they ever cross the host→device
# link.  The "yuv420" wire format ships the I420 planes instead — half
# the bytes of RGB24 — and reconstructs RGB on device, fused into the
# same jit as CLIP normalization.
#
# Wire convention: **limited-range BT.601** (Y 16..235, U/V 16..240) —
# exactly what the codec emits for (untagged) web video, so the native
# decoder's I420 path is a pure plane copy with no value conversion at
# all; swscale cannot range-convert YUV→YUV, and the RGB24 path applies
# the same limited→full expansion we apply on device.  Host-side packing
# of RGB sources quantizes into the same range (≤0.6 counts of extra
# rounding vs full-range).

_YUV_FROM_RGB = np.array(
    [
        [0.299, 0.587, 0.114],
        [-0.168736, -0.331264, 0.5],
        [0.5, -0.418688, -0.081312],
    ],
    np.float32,
)
_Y_SCALE = 219.0 / 255.0   # full-range Y -> limited 16..235
_C_SCALE = 224.0 / 255.0   # full-range chroma offset -> limited 16..240


def rgb_to_yuv420(frames: np.ndarray) -> np.ndarray:
    """Host-side packing: uint8 RGB (..., H, W, 3) → one uint8
    (..., H*3//2, W) array — the standard I420 memory layout viewed as
    rows (Y full-res, then U and V each 2×2-box subsampled and reshaped
    to H/4 rows of width W), limited-range BT.601.  H and W must be
    multiples of 4."""
    lead, (h, w, _) = frames.shape[:-3], frames.shape[-3:]
    x = frames.astype(np.float32)
    yuv = x @ _YUV_FROM_RGB.T
    y = yuv[..., 0] * _Y_SCALE + 16.0
    u = yuv[..., 1] * _C_SCALE + 128.0
    v = yuv[..., 2] * _C_SCALE + 128.0
    u = u.reshape(lead + (h // 2, 2, w // 2, 2)).mean(axis=(-3, -1))
    v = v.reshape(lead + (h // 2, 2, w // 2, 2)).mean(axis=(-3, -1))
    packed = np.concatenate(
        [y, u.reshape(lead + (h // 4, w)), v.reshape(lead + (h // 4, w))],
        axis=-2,
    )
    return np.clip(np.rint(packed), 0, 255).astype(np.uint8)


@jax.jit
def yuv420_to_rgb(wire: jax.Array) -> jax.Array:
    """Device-side unpacking: (..., H*3//2, W) uint8 limited-range I420
    → float32 RGB (..., H, W, 3) in 0..255 (chroma replicated 2×2, the
    standard nearest-neighbor upsample)."""
    lead, (hp, w) = wire.shape[:-2], wire.shape[-2:]
    h = hp * 2 // 3
    q = h // 4
    y = (wire[..., :h, :].astype(jnp.float32) - 16.0) / _Y_SCALE
    u = wire[..., h:h + q, :].astype(jnp.float32).reshape(lead + (h // 2, w // 2))
    v = wire[..., h + q:, :].astype(jnp.float32).reshape(lead + (h // 2, w // 2))
    u = (jnp.repeat(jnp.repeat(u, 2, axis=-2), 2, axis=-1) - 128.0) / _C_SCALE
    v = (jnp.repeat(jnp.repeat(v, 2, axis=-2), 2, axis=-1) - 128.0) / _C_SCALE
    r = y + 1.402 * v
    g = y - 0.344136 * u - 0.714136 * v
    b = y + 1.772 * u
    return jnp.clip(jnp.stack([r, g, b], axis=-1), 0.0, 255.0)


def sample_crop_params(
    rng: np.random.Generator,
    batch: int,
    height: int,
    width: int,
    min_scale: float = 0.9,
    max_scale: float = 1.0,
    ratio: tuple[float, float] = (3.0 / 4.0, 4.0 / 3.0),
) -> np.ndarray:
    """Per-clip (top, left, crop_h, crop_w, flip) parameters, sampled like
    torchvision RandomResizedCrop (area-scale + log-ratio)."""
    area = height * width
    out = np.zeros((batch, 5), dtype=np.int32)
    for i in range(batch):
        for _ in range(10):
            target_area = area * rng.uniform(min_scale, max_scale)
            log_ratio = np.log(ratio)
            aspect = np.exp(rng.uniform(*log_ratio))
            w = int(round(np.sqrt(target_area * aspect)))
            h = int(round(np.sqrt(target_area / aspect)))
            if 0 < w <= width and 0 < h <= height:
                top = rng.integers(0, height - h + 1)
                left = rng.integers(0, width - w + 1)
                out[i] = (top, left, h, w, rng.integers(0, 2))
                break
        else:
            out[i] = (0, 0, height, width, rng.integers(0, 2))
    return out


@functools.partial(jax.jit, static_argnames=("out_size", "dtype"))
def augment_and_normalize(
    frames: jax.Array,
    crop_params: jax.Array,
    out_size: int,
    dtype=jnp.bfloat16,
) -> jax.Array:
    """Apply per-clip crop+flip+resize+normalize on device.

    frames: (B, T, H, W, 3) uint8; crop_params: (B, 5) int32.
    Returns (B, T, out, out, 3) in ``dtype``.
    """
    x = frames.astype(jnp.float32) / 255.0
    b, t, h, w, c = x.shape

    def one_clip(clip, params):
        top, left, ch, cw, flip = params
        # Crop via a resize with a scaled/translated sampling grid:
        # gather rows/cols at crop coordinates (nearest would lose
        # precision; use linear interpolation through jax.image).
        clip = jax.image.scale_and_translate(
            clip,
            shape=(t, out_size, out_size, c),
            spatial_dims=(1, 2),
            scale=jnp.array([out_size / ch, out_size / cw], jnp.float32),
            translation=jnp.array(
                [-top * out_size / ch, -left * out_size / cw], jnp.float32
            ),
            method="bilinear",
        )
        return jnp.where(flip > 0, clip[:, :, ::-1, :], clip)

    x = jax.vmap(one_clip)(x, crop_params)
    x = (x - jnp.asarray(CLIP_MEAN)) / jnp.asarray(CLIP_STD)
    return x.astype(dtype)
