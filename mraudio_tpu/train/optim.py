"""Optimizer + LR schedule + trainable-parameter partition.

Schedule parity: LAVIS ``LinearWarmupCosineLRScheduler`` (bound at
``utils/trainer.py:66``) warms up linearly over the first
``warmup_steps`` steps of epoch 0 (1e-8 → 3e-4), then applies *cosine
decay by epoch* (not by step): ``lr = min + 0.5 (init-min)(1+cos(pi *
epoch / max_epoch))``.  :func:`lavis_warmup_cosine_schedule` reproduces
this exactly given ``steps_per_epoch``.

Optimizer: the reference builds AdamW(wd=0.05) param groups and then
accidentally overwrites it with plain ``Adam`` over all params
(``utils/trainer.py:59-66``).  We implement the *intended* optimizer —
AdamW with weight decay masked off biases/norms/1-D params (the LAVIS
param-group convention) — and keep ``optimizer="adam"`` available to
reproduce the reference's live behavior bit-for-bit.

Trainable partition: like the reference, only LoRA adapters train
(everything else frozen, ``models/xinstructblip.py:90-204``); the split
here is by parameter path, mirroring the requires_grad partition the
reference's checkpoint stripping relies on (``utils/trainer.py:189-196``).
"""

from __future__ import annotations

import re
from typing import Callable

import jax
import jax.numpy as jnp
import optax
from flax import traverse_util

from mraudio_tpu.config import TrainConfig

# Parameter paths that train (the reference trains LoRA adapters only).
DEFAULT_TRAINABLE_PATTERN = r"(lora_a|lora_b)"


def lavis_warmup_cosine_schedule(
    cfg: TrainConfig, steps_per_epoch: int
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Global-step → lr, matching LAVIS step(cur_epoch, cur_step)."""
    init, minimum = cfg.lr, cfg.min_lr
    warmup, start = cfg.warmup_steps, cfg.warmup_start_lr
    max_epoch = cfg.max_epoch

    def schedule(step):
        step = jnp.asarray(step)
        epoch = step // steps_per_epoch
        in_epoch_step = step  # LAVIS warms up on global step while epoch==0
        warm_lr = start + (init - start) * jnp.minimum(in_epoch_step, warmup) / warmup
        cos_lr = minimum + 0.5 * (init - minimum) * (
            1.0 + jnp.cos(jnp.pi * epoch / max_epoch)
        )
        return jnp.where((epoch == 0) & (in_epoch_step < warmup), warm_lr, cos_lr)

    return schedule


def trainable_mask(params, pattern: str = DEFAULT_TRAINABLE_PATTERN):
    """Boolean pytree: True where the param trains."""
    regex = re.compile(pattern)
    flat = traverse_util.flatten_dict(params)
    mask = {k: bool(regex.search("/".join(map(str, k)))) for k in flat}
    return traverse_util.unflatten_dict(mask)


def split_trainable(params, pattern: str = DEFAULT_TRAINABLE_PATTERN):
    """Split a param tree into (trainable_flat, frozen_flat) dicts keyed
    by path tuples; ``merge_params`` reassembles."""
    regex = re.compile(pattern)
    flat = traverse_util.flatten_dict(params)
    trainable = {k: v for k, v in flat.items() if regex.search("/".join(map(str, k)))}
    frozen = {k: v for k, v in flat.items() if k not in trainable}
    return trainable, frozen


def merge_params(trainable_flat: dict, frozen_flat: dict):
    return traverse_util.unflatten_dict({**frozen_flat, **trainable_flat})


def _decay_mask(flat_params: dict) -> dict:
    """LAVIS convention: no weight decay for 1-D params (biases, norms)."""
    return {k: v.ndim > 1 for k, v in flat_params.items()}


def build_optimizer(
    cfg: TrainConfig,
    trainable_flat: dict,
    steps_per_epoch: int,
    optimizer: str = "adamw",
) -> optax.GradientTransformation:
    schedule = lavis_warmup_cosine_schedule(cfg, steps_per_epoch)
    b1, b2 = cfg.betas
    k = cfg.accum_grad_iters

    # Under MultiSteps(k) the inner transforms advance once per k
    # micro-batches, but the reference steps its scheduler every data
    # iteration and applies the optimizer at micro-iters k-1, 2k-1, ...
    # (0-indexed, ``utils/trainer.py:127,137-140``).  Map the inner update
    # count n back to the micro-step the reference would be at, n*k + k-1,
    # so warmup/cosine run at reference speed instead of k× slower.
    inner_schedule = schedule if k <= 1 else (lambda count: schedule(count * k + k - 1))

    if optimizer == "adamw":
        tx = optax.chain(
            optax.scale_by_adam(b1=b1, b2=b2),
            optax.add_decayed_weights(
                cfg.weight_decay, mask=_decay_mask(trainable_flat)
            ),
            optax.scale_by_learning_rate(inner_schedule),
        )
    elif optimizer == "adam":
        # the reference's live (buggy) optimizer: plain Adam, no decay
        tx = optax.chain(
            optax.scale_by_adam(b1=b1, b2=b2),
            optax.scale_by_learning_rate(inner_schedule),
        )
    else:
        raise ValueError(f"unknown optimizer {optimizer!r}")

    if k > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=k)
    return tx
