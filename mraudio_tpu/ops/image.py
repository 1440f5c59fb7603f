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
def normalize_frames(frames: jax.Array, dtype=jnp.bfloat16) -> jax.Array:
    """uint8 (..., H, W, 3) → normalized model dtype."""
    x = frames.astype(jnp.float32) / 255.0
    x = (x - jnp.asarray(CLIP_MEAN)) / jnp.asarray(CLIP_STD)
    return x.astype(dtype)


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
