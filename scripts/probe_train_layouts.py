"""Probe: does the full-size scan_layers train step run on one 16 GB
chip once the arguments are pre-laid-out to the compiled step's formats?

The step compiles (its accounting fits) but dies with a runtime
ResourceExhausted when invoked normally — the suspected overhead is
PJRT re-layout copies of the 9.3 GB of weight arguments at dispatch.
This script AOT-compiles the step, converts every argument leaf to
``compiled.input_formats`` (leaf-by-leaf, so the transient is one leaf,
not a second tree), and executes.

Run: python scripts/probe_train_layouts.py [--config YAML]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def relayout(tree, formats_tree):
    flat, treedef = jax.tree_util.tree_flatten(tree)
    fmt_flat = treedef.flatten_up_to(formats_tree)
    for i in range(len(flat)):
        # overwrite in place so the previous buffer's refcount drops
        # before the next leaf converts (peak = one extra leaf)
        flat[i] = jax.device_put(flat[i], fmt_flat[i])
        flat[i].block_until_ready()
    return jax.tree_util.tree_unflatten(treedef, flat)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="/tmp/traindata/full_train_scan.yaml")
    ap.add_argument("--ann", default="/tmp/traindata/train.jsonl")
    args = ap.parse_args()

    from bench import enable_compile_cache

    enable_compile_cache()

    import optax

    from mraudio_tpu.config import RunConfig
    from mraudio_tpu.models.casting import cast_params_for_inference
    from mraudio_tpu.models.factory import build_model
    from mraudio_tpu.train.optim import (
        DEFAULT_TRAINABLE_PATTERN, build_optimizer, merge_params,
        split_trainable,
    )
    from flax import traverse_util

    cfg = RunConfig.from_yaml(args.config)
    cfg = cfg.replace(data=cfg.data.replace(train_annotation_file=args.ann,
                                            val_annotation_file=args.ann))
    model = build_model(cfg)
    print("init params ...", flush=True)
    params = model.init_params(jax.random.PRNGKey(0))

    trainable, frozen = split_trainable(params, DEFAULT_TRAINABLE_PATTERN)
    del params
    frozen_tree = traverse_util.unflatten_dict(frozen)
    frozen = traverse_util.flatten_dict(cast_params_for_inference(frozen_tree))
    del frozen_tree

    tx = build_optimizer(cfg.train.replace(accum_grad_iters=1), trainable, 10)
    opt_state = tx.init(trainable)

    from mraudio_tpu.data.dataset import MRDataset, collate

    anns = [{"vid": "p", "qid": 0, "query": "a person does a thing",
             "duration": 150, "relevant_windows": [[10, 30]]}]
    ds = MRDataset(cfg.data, annotations=anns)
    batch = collate([ds.get(0)], 1)
    arrays = tuple(jnp.asarray(a) for a in model.loss_arrays(batch))
    n_frms = int(batch.timestamps.shape[1])

    def step_fn(trainable, frozen, opt_state, arrays):
        def loss_fn(tr):
            return model._loss_fn(merge_params(tr, frozen), *arrays,
                                  n_frms=n_frms)

        loss, grads = jax.value_and_grad(loss_fn)(trainable)
        updates, opt_state2 = tx.update(grads, opt_state, trainable)
        return loss, optax.apply_updates(trainable, updates), opt_state2

    print("lower+compile ...", flush=True)
    t0 = time.time()
    lowered = jax.jit(step_fn, donate_argnums=(0, 2)).lower(
        trainable, frozen, opt_state, arrays
    )
    compiled = lowered.compile()
    print(f"  {time.time()-t0:.1f}s", flush=True)

    in_fmts, _ = compiled.input_formats
    print("relayout arguments ...", flush=True)
    t0 = time.time()
    trainable = relayout(trainable, in_fmts[0])
    frozen = relayout(frozen, in_fmts[1])
    opt_state = relayout(opt_state, in_fmts[2])
    arrays = relayout(arrays, in_fmts[3])
    print(f"  {time.time()-t0:.1f}s", flush=True)

    print("execute ...", flush=True)
    for i in range(3):
        t0 = time.time()
        loss, trainable, opt_state = compiled(trainable, frozen, opt_state, arrays)
        loss_v = float(loss)
        print(f"  step {i}: loss={loss_v:.4f}  {time.time()-t0:.2f}s", flush=True)
    print("TRAIN STEP OK (argument re-layout was the runtime blocker)")


if __name__ == "__main__":
    main()
