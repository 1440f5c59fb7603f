from mraudio_tpu.train.optim import (
    build_optimizer,
    lavis_warmup_cosine_schedule,
    split_trainable,
)

__all__ = ["build_optimizer", "lavis_warmup_cosine_schedule", "split_trainable"]
