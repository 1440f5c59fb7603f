"""Orbax checkpointing with trainable-subtree stripping.

Mirrors the reference's checkpoint semantics (``utils/trainer.py:
184-254``): the saved model state contains only parameters that train
(the reference deletes ``requires_grad=False`` entries before saving),
plus optimizer state and epoch; resume restores all three and continues
at ``epoch + 1``.  ``checkpoint_best`` is selected by validation
MR-full-R1-avg, ``checkpoint_{epoch}`` on the save-freq cadence.
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np
import jax
import orbax.checkpoint as ocp
from flax import traverse_util


def _to_savable(tree):
    return jax.tree_util.tree_map(np.asarray, tree)


def _flat_to_str(flat: dict) -> dict:
    """Orbax trees want string keys; path tuples become '/'-joined."""
    return {"/".join(map(str, k)): v for k, v in flat.items()}


def _str_to_flat(tree: dict) -> dict:
    return {tuple(k.split("/")): v for k, v in tree.items()}


def save_checkpoint(
    output_dir: str,
    name: str,
    trainable_flat: dict,
    opt_state: Any,
    epoch: int,
) -> str:
    """Write ``{output_dir}/checkpoint_{name}`` (name = 'best' or epoch)."""
    path = os.path.abspath(os.path.join(output_dir, f"checkpoint_{name}"))
    ckptr = ocp.StandardCheckpointer()
    payload = {
        "model": _flat_to_str(_to_savable(trainable_flat)),
        "opt_state": _to_savable(opt_state),
        "epoch": epoch,
    }
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    return path


def load_checkpoint(
    path: str,
    trainable_template: dict | None = None,
    opt_state_template=None,
) -> dict:
    """Read a checkpoint; returns dict with 'model' (flat path-tuple
    dict), 'opt_state', 'epoch'.  Passing templates restores directly
    into the live pytree structure (required for optimizer NamedTuples)."""
    # Every checkpoint dir has a ``<name>.meta.json`` sidecar next to it
    # (step-position for mid-epoch resume).  A "latest checkpoint_*"
    # glob naturally picks the sidecar (it sorts after the dir), so
    # resolve it back to the checkpoint it annotates instead of handing
    # orbax a JSON file.
    if path.endswith(".meta.json"):
        path = path[: -len(".meta.json")]
    ckptr = ocp.StandardCheckpointer()
    if trainable_template is not None:
        target = {
            "model": _flat_to_str(_to_savable(trainable_template)),
            "opt_state": _to_savable(opt_state_template),
            "epoch": 0,
        }
        payload = ckptr.restore(os.path.abspath(path), target)
    else:
        payload = ckptr.restore(os.path.abspath(path))
    payload["model"] = _str_to_flat(payload["model"])
    return payload


def apply_trainable(params, trainable_flat: dict):
    """Overlay a restored trainable subtree onto a full param tree
    (the load side of the stripping semantics)."""
    flat = traverse_util.flatten_dict(params)
    for k, v in trainable_flat.items():
        if k not in flat:
            raise KeyError(f"checkpoint param {'/'.join(map(str, k))} not in model")
        flat[k] = v
    return traverse_util.unflatten_dict(flat)
