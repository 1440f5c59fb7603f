"""Device mesh construction.

The reference's distribution story is a NCCL process group + DDP
(``finetune.py:21-30``, ``utils/trainer.py:69``).  Here a single
``jax.sharding.Mesh`` spans all chips with two axes:

* ``data``  — batch parallelism (the reference's only strategy);
* ``model`` — tensor parallelism for the LLM (heads/ffn sharded), the
  addition that lets a 7B decoder fit and scale on a v5e-8.

XLA emits the collectives (all-reduce over ``data`` for gradients,
all-gather/reduce-scatter over ``model`` inside the matmuls) from
sharding annotations; there is no hand-written communication code, and
on a pod slice they ride ICI automatically.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

from mraudio_tpu.config import MeshConfig


def make_mesh(cfg: MeshConfig | None = None, devices=None) -> Mesh:
    """Build a (data, model) mesh.  With ``cfg=None``, use every visible
    device on the data axis (pure DP)."""
    devices = devices if devices is not None else jax.devices()
    if cfg is None:
        cfg = MeshConfig(data=len(devices), model=1)
    n = cfg.data * cfg.model
    if n > len(devices):
        raise ValueError(
            f"mesh {cfg.data}x{cfg.model} needs {n} devices, have {len(devices)}"
        )
    grid = np.asarray(devices[:n]).reshape(cfg.data, cfg.model)
    return Mesh(grid, axis_names=("data", "model"))


def local_batch_size(global_batch: int, mesh: Mesh) -> int:
    data = mesh.shape["data"]
    if global_batch % data:
        raise ValueError(f"global batch {global_batch} not divisible by data={data}")
    return global_batch // data
