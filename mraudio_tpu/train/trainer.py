"""Training runtime: jitted train step, epoch loop, validation, ckpt.

Re-provides the reference trainer (``utils/trainer.py``) TPU-first:

* the train step — loss, grads over the trainable (LoRA) subtree,
  optimizer update with gradient accumulation — is ONE jitted, donated
  function; bf16 compute needs no GradScaler (bf16 keeps fp32's
  exponent range, so the reference's AMP machinery has no TPU
  counterpart);
* validation reuses the batched generate path and scores with
  ``eval_submission(results, results)`` exactly like the reference
  (``utils/trainer.py:156-182``) — each record carries both GT and
  prediction;
* checkpoints store only the trainable subtree + optimizer state +
  epoch (the stripping semantics of ``utils/trainer.py:184-210``), best
  selected by MR-full-R1-avg.
"""

from __future__ import annotations

import logging
import os
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
import optax
from flax import traverse_util

from mraudio_tpu.config import RunConfig
from mraudio_tpu.data.dataset import BatchLoader, MRDataset
from mraudio_tpu.eval.mr_eval import eval_submission
from mraudio_tpu.models.xinstructblip import XInstructBLIP
from mraudio_tpu.text.postprocess import moment_str_to_list, post_process
from mraudio_tpu.train import checkpoint as ckpt
from mraudio_tpu.train.optim import (
    DEFAULT_TRAINABLE_PATTERN,
    build_optimizer,
    lavis_warmup_cosine_schedule,
    merge_params,
    split_trainable,
)
from mraudio_tpu.utils.logging import MetricLogger, SmoothedValue

logger = logging.getLogger("mraudio_tpu")


class Preempted(RuntimeError):
    """Raised after a SIGTERM-triggered preemption save: the training
    state (trainable subtree, optimizer state, exact step position) is on
    disk as ``checkpoint_preempt`` and the process should exit cleanly."""


class Trainer:
    def __init__(
        self,
        cfg: RunConfig,
        model: Optional[XInstructBLIP] = None,
        params: Optional[dict] = None,
        train_dataset: Optional[MRDataset] = None,
        val_dataset: Optional[MRDataset] = None,
        optimizer: str = "adamw",
        frozen_bf16: bool = True,
        params_fn=None,
    ):
        """``params_fn``: zero-arg callable producing the param tree.
        Prefer it over ``params`` for full-size trees — the caller's
        ``params`` local pins the pre-cast original of every frozen
        float leaf (~3 GB at full size) until __init__ returns, which
        is exactly the window where the bf16 cast / quantization /
        encoder offload need that HBM (measured,
        scripts/probe_init_memory.py); a thunk's result is owned by
        this frame and freed by the ``del`` below."""
        self.cfg = cfg
        tc = cfg.train
        if model is None:
            from mraudio_tpu.models.factory import build_model

            model = build_model(cfg)
        self.model = model
        if params is None and params_fn is not None:
            params = params_fn()
        # Per-model trainable partition (XInstructBLIP: LoRA [+saliency];
        # VideoLLaMA: LoRA + connector/audio projector).
        self.trainable_pattern = getattr(
            model, "TRAINABLE_PATTERN", DEFAULT_TRAINABLE_PATTERN
        )

        if params is None:
            params = self.model.init_params(jax.random.PRNGKey(tc.seed))

        # Multi-chip: place params per the partition rules (TP over
        # "model", batch over "data"); XLA emits every collective.
        self.mesh = None
        if cfg.mesh.num_devices > 1:
            from mraudio_tpu.parallel import make_mesh, shard_params

            self.mesh = make_mesh(cfg.mesh)
            self._mesh_ctx = jax.set_mesh(self.mesh)
            self._mesh_ctx.__enter__()
            params = shard_params(params, self.mesh)
        self.trainable, self.frozen = split_trainable(params, self.trainable_pattern)
        n_train = sum(x.size for x in self.trainable.values())
        n_total = sum(x.size for x in jax.tree_util.tree_leaves(params))
        logger.info("trainable params: %d / %d", n_train, n_total)
        # Drop the init tree NOW: the bf16 cast below re-creates every
        # frozen float leaf, and holding both trees put init's peak at
        # 15.7 GiB of 16 (measured, scripts/probe_init_memory.py) —
        # quantize_frozen and the encoder_window host offload then OOM
        # on their own transients.
        del params
        if frozen_bf16:
            # Frozen base weights are read every step; bf16 halves the HBM
            # traffic and the matmuls consume bf16 regardless (the LoRA
            # master copies stay fp32) — the TPU shape of the reference's
            # fp16-base + fp32-adapter setup.
            from flax import traverse_util

            from mraudio_tpu.models.casting import cast_params_for_inference

            frozen_tree = traverse_util.unflatten_dict(self.frozen)
            self.frozen = traverse_util.flatten_dict(
                cast_params_for_inference(frozen_tree)
            )
            # the local would otherwise pin every pre-cast float leaf
            # (≈3 GB at full size) until __init__ returns
            del frozen_tree
        if tc.quant_frozen == "int8":
            from mraudio_tpu.models.quant_tree import (
                quantize_frozen, quantized_bytes_saved,
            )

            self.frozen = quantize_frozen(self.frozen)
            logger.info(
                "quant_frozen=int8: %.2f GB of frozen weights saved",
                quantized_bytes_saved(self.frozen) / 2**30,
            )
        elif tc.quant_frozen not in ("none", ""):
            raise ValueError(f"unknown quant_frozen={tc.quant_frozen!r}")
        self._windowed = tc.encoder_window > 0
        self._enc_uploader = None
        # upload/compute overlap state (train.upload_overlap): staged
        # transfer buffers for the NEXT window, issued while the current
        # window's LLM steps run; flipped off on HBM exhaustion.
        self._staged_enc = None
        self._overlap_ok = bool(self.cfg.train.upload_overlap)
        if self._windowed:
            # Windowed encoder residency (train.encoder_window): the
            # frozen encoder subtree lives on HOST between windows; each
            # window device_puts it, encodes its batches, then deletes
            # the device copy so the LLM backward runs without the
            # encoders' 1.35-2.7 GB resident (docs/BENCHMARKS.md).
            if cfg.mesh.num_devices > 1:
                raise ValueError(
                    "train.encoder_window is a single-chip memory lever; "
                    "on a mesh shard the LLM over the `model` axis instead"
                )
            split = self._split_frozen_encoders()
            if split is None:
                raise ValueError(
                    "train.encoder_window requires split_encode_step=True "
                    "and fully-frozen encoder subtrees"
                )
            frozen_enc, _ = split
            self.frozen = dict(self.frozen)
            for k in list(frozen_enc):
                # copy out + free leaf-by-leaf so the device never holds
                # both the full encoder subtree and its host copies
                leaf = frozen_enc.pop(k)
                self.frozen[k] = np.asarray(leaf)
                if hasattr(leaf, "delete"):
                    leaf.delete()

        if train_dataset is None:
            train_dataset = MRDataset(
                cfg.data, annotation_path=cfg.data.train_annotation_file, split="train"
            )
        if val_dataset is None:
            val_dataset = MRDataset(
                cfg.data, annotation_path=cfg.data.val_annotation_file, split="eval"
            )
        # Preflight the static timestamp/duration token budgets against
        # this dataset's value range (prepare_text also hard-errors at
        # use time; failing here is friendlier).
        if hasattr(self.model, "prepare_text"):
            from mraudio_tpu.text.tokenizer import validate_time_budgets

            durations = [
                a["duration"]
                for ds in (train_dataset, val_dataset)
                for a in ds.annotation
            ]
            if durations:
                validate_time_budgets(
                    self.model.llm_tokenizer, self.model.cfg, int(max(durations)) + 1
                )

        shard_index, shard_count = jax.process_index(), jax.process_count()
        self.train_loader = BatchLoader(
            train_dataset, tc.batch_size, shuffle=True, seed=tc.seed,
            shard_index=shard_index, shard_count=shard_count, drop_last=True,
            num_threads=max(tc.num_workers, 1),
        )
        self.val_loader = BatchLoader(
            val_dataset, tc.batch_size, shuffle=False,
            shard_index=shard_index, shard_count=shard_count,
            num_threads=max(tc.num_workers, 1),
        )

        self.steps_per_epoch = max(len(self.train_loader), 1)
        self.tx = build_optimizer(tc, self.trainable, self.steps_per_epoch, optimizer)
        self.opt_state = self.tx.init(self.trainable)
        self.schedule = lavis_warmup_cosine_schedule(tc, self.steps_per_epoch)
        self.start_epoch = 0
        self.global_step = 0
        self._nan_skips = 0  # consecutive non-finite-loss steps
        self._step_fns: dict[int, callable] = {}  # keyed on n_frms
        # LoRA dropout (reference peft dropout=0.05): one key folded with
        # the global step per train step.
        self._drop_key = jax.random.PRNGKey(tc.seed + 29)
        # Preemption safety (TPU pods preempt; the reference's resume is
        # manual, utils/trainer.py:29): SIGTERM sets a flag; the step
        # loops notice it, save checkpoint_preempt (+ meta with the exact
        # step position) and raise Preempted for a clean exit.  Resuming
        # from that checkpoint continues mid-epoch, bitwise.
        self._preempt_requested = False
        self._skip_steps = 0
        self._step_in_epoch = 0
        self._prev_sigterm = None
        self._sigterm_installed = False
        if tc.preempt_save:
            import signal

            def _on_sigterm(signum, frame):
                self._preempt_requested = True

            try:
                self._prev_sigterm = signal.signal(signal.SIGTERM, _on_sigterm)
                self._sigterm_installed = True
            except ValueError:
                pass  # not the main thread (e.g. test harness)

        from mraudio_tpu.utils.runlog import RunLogger

        os.makedirs(tc.output_dir, exist_ok=True)
        self.runlog = RunLogger(tc.output_dir, "train")

        if tc.resume_ckpt_path:
            self._load_checkpoint(tc.resume_ckpt_path)

    # ------------------------------------------------------------------

    def _enc_upload_fn(self, frozen_enc):
        """The cached packed uploader for the frozen encoder subtree
        (see utils/packing.py)."""
        # key on leaf VALUES (id), not just names: a same-keyed tree with
        # different leaves (e.g. a future in-place frozen-param reload)
        # must not silently reuse the stale packed copy
        key = tuple(sorted((str(k), id(v)) for k, v in frozen_enc.items()))
        if self._enc_uploader is None or self._enc_uploader[0] != key:
            from mraudio_tpu.utils.packing import make_packed_uploader

            upload, nbytes = make_packed_uploader(frozen_enc)
            logger.info("packed encoder subtree: %.2f GB, one transfer",
                        nbytes / 2**30)
            self._enc_uploader = (key, upload)
        return self._enc_uploader[1]

    def _upload_encoders(self, frozen_enc, staged=None) -> dict:
        """Device-put the host-resident frozen encoder subtree as ONE
        packed transfer + one jitted unpack dispatch.

        Leaf-by-leaf ``device_put`` of the ~700-leaf, 1.44 GB int8
        subtree measured 48.6 s/window through the remote runtime
        (~60 ms per-transfer overhead each) while the same tunnel moves
        large buffers at ~1 GB/s — the packed path is ~2 s of wire.
        Bit-exact (native-dtype serialization; tests/test_packing.py).
        ``staged``: pre-issued transfer buffers from
        :meth:`_stage_encoders` (upload/compute overlap)."""
        return self._enc_upload_fn(frozen_enc)(staged)

    def _stage_encoders(self, frozen_enc):
        """Double-buffer half of the windowed upload: issue the packed
        transfers (async) and return the staged buffers, or None when
        the chip has no headroom for the extra copy (falls back to the
        serialized upload — same bytes, same unpack, later timing).

        Headroom guard: a staging device_put that *lands* can still OOM
        the WINDOW — the buffers stay resident through every program-B
        step, whose own temp peak is what sized the config (full-size
        B=2 measured exactly this mid-window RESOURCE_EXHAUSTED).  When
        the runtime exposes memory_stats, require free HBM ≥ 1.2× the
        packed bytes before staging; runtimes without stats rely on the
        user having opted in knowingly (config.upload_overlap docs)."""
        upload = self._enc_upload_fn(frozen_enc)
        nbytes = getattr(self, "_enc_nbytes", None)
        if nbytes is None:
            nbytes = self._enc_nbytes = sum(
                np.asarray(v).nbytes for v in frozen_enc.values()
            )
        try:
            stats = jax.local_devices()[0].memory_stats()
        except Exception:
            stats = None
        if stats and stats.get("bytes_limit"):
            # peak_bytes_in_use already includes window 1's program-B
            # temp peak (it ran before the first staging attempt), so
            # limit - peak is the true margin the staged copy must fit
            high = stats.get("peak_bytes_in_use") or stats.get(
                "bytes_in_use", 0
            )
            free = stats["bytes_limit"] - high
            if free < nbytes * 1.1:
                logger.warning(
                    "upload_overlap: %.2f GB HBM above the observed peak "
                    "< 1.1x the %.2f GB packed subtree; staying serialized",
                    free / 2**30, nbytes / 2**30,
                )
                self._overlap_ok = False
                return None
        try:
            return upload.stage()
        except Exception as e:
            if "RESOURCE_EXHAUSTED" not in str(e):
                raise
            logger.warning(
                "no HBM headroom to double-buffer the encoder upload; "
                "falling back to serialized per-window uploads"
            )
            self._overlap_ok = False
            return None

    def _split_frozen_encoders(self):
        """(frozen_encoder_flat, frozen_rest_flat) when the model's
        encoder param subtrees are entirely frozen, else None — the
        condition under which the train step can run the encoders as
        a separate jit program (see XInstructBLIP.ENCODER_PARAM_KEYS)."""
        if not self.cfg.train.split_encode_step:
            return None
        enc_keys = getattr(self.model, "ENCODER_PARAM_KEYS", None)
        if enc_keys is None or not hasattr(self.model, "_loss_from_tokens"):
            return None
        if any(k[0] in enc_keys for k in self.trainable):
            return None
        frozen_enc = {k: v for k, v in self.frozen.items() if k[0] in enc_keys}
        frozen_rest = {k: v for k, v in self.frozen.items() if k[0] not in enc_keys}
        return frozen_enc, frozen_rest

    def _build_step(self, n_frms: int):
        model, tx = self.model, self.tx
        split = self._split_frozen_encoders()
        nan_guard = self.cfg.train.nan_guard

        def guarded_update(loss, grads, opt_state, trainable):
            """Compute the optimizer update; with nan_guard, a non-finite
            loss contributes zero gradients (the accumulator/moments never
            see the NaN) and the update it feeds is not applied."""
            if nan_guard:
                good = jnp.isfinite(loss)
                grads = jax.tree_util.tree_map(
                    lambda g: jnp.where(good, g, jnp.zeros_like(g)), grads
                )
            updates, opt_state = tx.update(grads, opt_state, trainable)
            if nan_guard:
                updates = jax.tree_util.tree_map(
                    lambda u: jnp.where(good, u, jnp.zeros_like(u)), updates
                )
            return optax.apply_updates(trainable, updates), opt_state

        from mraudio_tpu.models.quant_tree import dequantize_frozen

        if split is not None:
            frozen_enc, frozen_rest = split

            # Program A: frozen encoders + Q-Formers + projections.
            # Nothing trainable feeds them, so the boundary carries no
            # gradients — and their weights aren't arguments of the
            # backward program.  With quant_frozen the encoder args are
            # resident int8; the dequant runs inside this forward-only
            # program where XLA fuses it into each matmul's weight read
            # (no bf16 copy is ever stored).
            @jax.jit
            def encode_fn(enc_flat, video_u8, audio_wave, qformer_ids,
                          qformer_mask, crop):
                enc_params = traverse_util.unflatten_dict(
                    dequantize_frozen(enc_flat)
                )
                return model._encode_modality_tokens(
                    enc_params, video_u8, audio_wave, qformer_ids,
                    qformer_mask, n_frms, crop_params=crop,
                )

            # Program B: LLM loss + LoRA/saliency grads + update.
            def step_fn(trainable, frozen_rest, opt_state, modal, text_arrays,
                        rng):
                def loss_fn(tr):
                    params = merge_params(tr, dequantize_frozen(frozen_rest))
                    return model._loss_from_tokens(
                        params, modal, *text_arrays, dropout_rng=rng
                    )

                loss, grads = jax.value_and_grad(loss_fn)(trainable)
                trainable2, opt_state2 = guarded_update(
                    loss, grads, opt_state, trainable
                )
                return loss, trainable2, opt_state2

            step_jit = jax.jit(step_fn, donate_argnums=(0, 2))

            if self._windowed:
                # train.encoder_window: the caller orchestrates windows —
                # device_put(frozen_enc) → encode the window → delete →
                # step the window (only frozen_rest resident).
                return ("windowed", encode_fn, step_jit, frozen_enc,
                        frozen_rest)

            def run(trainable, frozen, opt_state, arrays, crop, rng):
                modal = encode_fn(frozen_enc, *arrays[:4], crop)
                return step_jit(trainable, frozen_rest, opt_state, modal,
                                arrays[4:], rng)

            return run

        def step_fn(trainable, frozen, opt_state, arrays, crop, rng):
            def loss_fn(tr):
                params = merge_params(tr, dequantize_frozen(frozen))
                return model._loss_fn(
                    params, *arrays, crop_params=crop, dropout_rng=rng,
                    n_frms=n_frms
                )

            loss, grads = jax.value_and_grad(loss_fn)(trainable)
            trainable, opt_state = guarded_update(
                loss, grads, opt_state, trainable
            )
            return loss, trainable, opt_state

        return jax.jit(step_fn, donate_argnums=(0, 2))

    def _arrays_for_loss(self, batch):
        arrays = self.model.loss_arrays(batch)
        if self.mesh is not None:
            from mraudio_tpu.parallel import batch_sharding

            bsh = batch_sharding(self.mesh)
            return tuple(jax.device_put(np.asarray(a), bsh) for a in arrays)
        return tuple(jnp.asarray(a) for a in arrays)

    def _sample_crops(self, batch, step: int | None = None):
        """Per-clip RandomResizedCrop+flip parameters for the step with
        ordinal ``step`` (default: the next step, ``self.global_step``);
        None with train.augment=False.  Sampled on the RGB frame dims —
        before any wire-format packing.  Keyed on (seed, step ordinal)
        rather than a sequential generator so a mid-epoch resume
        reproduces the exact augmentation stream without replaying the
        skipped steps."""
        if not self.cfg.train.augment:
            return None
        from mraudio_tpu.ops.image import sample_crop_params

        if step is None:
            step = self.global_step
        v = np.asarray(batch.video)
        if v.ndim == 4:  # packed I420 wire: (B, T, H*3/2, W)
            h, w = v.shape[2] * 2 // 3, v.shape[3]
        else:
            h, w = v.shape[2], v.shape[3]
        crop = sample_crop_params(
            np.random.default_rng((self.cfg.train.seed + 17, step)),
            v.shape[0], h, w,
            self.cfg.data.min_scale, self.cfg.data.max_scale,
        )
        if self.mesh is not None:
            from mraudio_tpu.parallel import batch_sharding

            return jax.device_put(crop, batch_sharding(self.mesh))
        return jnp.asarray(crop)

    @property
    def params(self) -> dict:
        from mraudio_tpu.models.quant_tree import dequantize_frozen

        # Validation/generate run on the plain tree; with quant_frozen
        # the bf16 encoder copies materialize here — fine between steps,
        # when no backward activations are resident.
        frozen = self.frozen
        if self._windowed:
            # encoder leaves live on host between windows — upload once
            # here rather than once per jitted generate call (packed:
            # one transfer + one unpack dispatch, see _upload_encoders)
            np_part = {k: v for k, v in frozen.items()
                       if isinstance(v, np.ndarray)}
            if np_part:
                frozen = {**frozen, **self._upload_encoders(np_part)}
        return merge_params(self.trainable, dequantize_frozen(frozen))

    # ------------------------------------------------------------------

    def _restore_sigterm(self) -> None:
        """Hand SIGTERM back to whoever owned it before this trainer —
        otherwise the dead trainer's flag-setter shadows the process's
        real handler for the rest of its life (a finished-then-serving
        process would silently ignore the pod's shutdown signal)."""
        if not self._sigterm_installed:
            return
        import signal

        try:
            signal.signal(
                signal.SIGTERM,
                self._prev_sigterm if self._prev_sigterm is not None
                else signal.SIG_DFL,
            )
        except ValueError:
            pass  # not the main thread
        self._sigterm_installed = False

    def train(self) -> dict:
        try:
            return self._train()
        finally:
            self._restore_sigterm()

    def _train(self) -> dict:
        tc = self.cfg.train
        best_metric, best_epoch = 0.0, 0
        results = {}
        try:
            for epoch in range(self.start_epoch, tc.max_epoch):
                self.train_epoch(epoch)
                if epoch % tc.val_freq == 0:
                    metrics = self.eval_epoch()
                    agg = metrics["brief"]["MR-full-R1-avg"]
                    logger.info("MR performance at epoch %d: %s", epoch, agg)
                    self.runlog.log("val", epoch=epoch, **{
                        k: float(v) for k, v in metrics["brief"].items()
                    })
                    results[epoch] = agg
                    if jax.process_index() == 0 and agg > best_metric:
                        best_epoch, best_metric = epoch, agg
                        self._save_checkpoint(epoch, is_best=True)
                if (
                    tc.save_freq > 0
                    and epoch % tc.save_freq == 0
                    and jax.process_index() == 0
                ):
                    self._save_checkpoint(epoch, is_best=False)
        except Preempted as e:
            logger.info("training preempted cleanly: %s", e)
            return {"best_epoch": best_epoch, "best_metric": best_metric,
                    "results": results, "preempted": True,
                    "preempt_ckpt": self._preempt_path}
        return {"best_epoch": best_epoch, "best_metric": best_metric, "results": results}

    def train_epoch(self, epoch: int) -> dict:
        self.train_loader.set_epoch(epoch)
        metric_logger = MetricLogger(delimiter="  ")
        metric_logger.add_meter("lr", SmoothedValue(window_size=1, fmt="{value:.6f}"))
        metric_logger.add_meter("loss", SmoothedValue(window_size=1, fmt="{value:.4f}"))
        logger.info(
            "Start training epoch %d, %d iters per inner epoch.",
            epoch, len(self.train_loader),
        )

        # Mid-epoch resume: skip the batches the preempted run already
        # consumed (data order is deterministic in (seed, epoch), crops
        # and dropout keys are keyed on the step ordinal, so the stream
        # continues bitwise).
        skip, self._skip_steps = self._skip_steps, 0
        self._step_in_epoch = skip

        if self._windowed:
            self._train_epoch_windowed(epoch, metric_logger, skip)
        else:
            # iter_from skips WITHOUT building the consumed batches —
            # replaying them would pay full sample decode/collate per
            # discarded batch (minutes late in a full-size epoch here)
            for i, batch in enumerate(self.train_loader.iter_from(skip),
                                      start=skip):
                # jit cache keyed on n_frms: mixed-length curricula or
                # train/val n_frms mismatches each get their own compile
                # instead of silently reusing the first batch's step.
                n_frms = int(batch.timestamps.shape[1])
                step_fn = self._step_fns.get(n_frms)
                if step_fn is None:
                    step_fn = self._step_fns[n_frms] = self._build_step(n_frms)
                arrays = self._arrays_for_loss(batch)
                loss, self.trainable, self.opt_state = step_fn(
                    self.trainable, self.frozen, self.opt_state, arrays,
                    self._sample_crops(batch),
                    jax.random.fold_in(self._drop_key, self.global_step),
                )
                self.global_step += 1
                self._step_in_epoch = i + 1
                self._post_step(float(loss), epoch, metric_logger)
                if self._preempt_requested:
                    self._preempt_exit(epoch)

        metric_logger.synchronize_between_processes()
        logger.info("Averaged stats: %s", metric_logger.global_avg())
        return {
            k: f"{meter.global_avg:.3f}" for k, meter in metric_logger.meters.items()
        }

    def _post_step(self, loss: float, epoch: int, metric_logger) -> None:
        """Per-step bookkeeping (LR, NaN guard accounting, run log) —
        called with ``self.global_step`` already advanced."""
        lr = float(self.schedule(self.global_step - 1))
        if not np.isfinite(loss):
            self._nan_skips += 1
            tc = self.cfg.train
            if tc.nan_guard:
                # the jitted step zeroed this micro-batch's grads and
                # suppressed its update (train.nan_guard); surface it.
                logger.warning(
                    "non-finite loss at step %d (%d consecutive); "
                    "gradients zeroed, update skipped",
                    self.global_step, self._nan_skips,
                )
            else:
                logger.warning(
                    "non-finite loss at step %d (%d consecutive); "
                    "train.nan_guard=False — the NaN update WAS applied",
                    self.global_step, self._nan_skips,
                )
            self.runlog.log("nan_skip", step=self.global_step,
                            epoch=epoch, consecutive=self._nan_skips,
                            guarded=tc.nan_guard)
            if tc.nan_guard and self._nan_skips >= tc.max_nan_skips:
                raise RuntimeError(
                    f"{self._nan_skips} consecutive non-finite losses "
                    f"(train.max_nan_skips={tc.max_nan_skips}); aborting "
                    "instead of writing NaN checkpoints"
                )
        else:
            self._nan_skips = 0
        metric_logger.update(loss=loss, lr=lr)
        self.runlog.log("train_step", step=self.global_step, epoch=epoch,
                        loss=loss, lr=lr)

    def _preempt_exit(self, epoch: int):
        """Save ``checkpoint_preempt`` at the exact step position and
        stop cleanly (SIGTERM arrived; the pod is going away)."""
        if self._staged_enc is not None:
            # free the next window's double-buffer; it will never unpack
            for leaf in self._staged_enc.values():
                leaf.delete()
            self._staged_enc = None
        self._preempt_path = None
        if jax.process_index() == 0:
            self._preempt_path = self._save_checkpoint(
                epoch, is_best=False, name="preempt"
            )
        self.runlog.log(
            "preempt", epoch=epoch, step=self.global_step,
            step_in_epoch=self._step_in_epoch,
        )
        raise Preempted(
            f"SIGTERM at epoch {epoch} step {self.global_step} "
            f"({self._step_in_epoch} steps into the epoch); "
            f"state saved to {self._preempt_path}"
        )

    def _train_epoch_windowed(self, epoch: int, metric_logger,
                              skip: int = 0) -> None:
        """train.encoder_window: process the loader in windows of W
        batches — device_put the host-resident frozen encoders, encode
        the window (program A), DELETE the device copy, then run the
        window's LLM loss/grad steps (program B) with only the LLM
        weights resident.  Bit-identical to the per-batch split path:
        the same two jitted programs consume the same inputs in the
        same order (per-batch crops and dropout rngs are assigned at
        enqueue time from the step ordinal each batch will run at)."""
        W = self.cfg.train.encoder_window
        pending = []  # (fns, arrays, crop, rng)

        def flush(more: bool = False):
            """Process the pending window.  ``more``: at least one more
            window follows — double-buffer its encoder upload
            (train.upload_overlap): the packed transfers are ISSUED
            right after this window's encodes retire, so the ~1.4 GB
            streams over the wire while this window's LLM steps occupy
            the device, instead of serializing in front of the next
            window (r4: ~45 s of pure wire wait per 12-step window).
            The deferred unpack dispatch — the thing that synchronizes
            on the transfer — runs at the next flush."""
            if not pending:
                return
            _, encode_fn, step_jit, frozen_enc, frozen_rest = pending[0][0]
            dev_enc = self._upload_encoders(frozen_enc, staged=self._staged_enc)
            self._staged_enc = None
            modals = [
                encode_fn(dev_enc, *arrays[:4], crop)
                for _, arrays, crop, _ in pending
            ]
            # the encode dispatches must have retired before their
            # weight arguments are deleted out from under them
            jax.block_until_ready(modals)
            for leaf in dev_enc.values():
                leaf.delete()
            if more and self._overlap_ok:
                # frozen_enc is window-invariant (host tree from
                # _split_frozen_encoders), so staging ahead is safe even
                # if the next window recompiles for a different n_frms
                self._staged_enc = self._stage_encoders(frozen_enc)
            for (_, arrays, _, rng), modal in zip(pending, modals):
                loss, self.trainable, self.opt_state = step_jit(
                    self.trainable, frozen_rest, self.opt_state, modal,
                    arrays[4:], rng,
                )
                self.global_step += 1
                self._step_in_epoch += 1
                self._post_step(float(loss), epoch, metric_logger)
            pending.clear()
            if self._preempt_requested:
                # the window just completed: the step position is exact
                self._preempt_exit(epoch)

        for batch in self.train_loader.iter_from(skip):
            n_frms = int(batch.timestamps.shape[1])
            fns = self._step_fns.get(n_frms)
            if fns is None:
                fns = self._step_fns[n_frms] = self._build_step(n_frms)
            if pending and (len(pending) >= W or pending[0][0] is not fns):
                flush(more=True)  # `batch` in hand: a next window exists
            ordinal = self.global_step + len(pending)
            rng = jax.random.fold_in(self._drop_key, ordinal)
            pending.append((fns, self._arrays_for_loss(batch),
                            self._sample_crops(batch, step=ordinal), rng))
        flush()
        # epoch end without a follow-up window (e.g. preempt before the
        # last flush): free any staged double-buffer
        if self._staged_enc is not None:
            for leaf in self._staged_enc.values():
                leaf.delete()
            self._staged_enc = None

    def eval_epoch(self) -> dict:
        params = self.params
        # HL metrics need GT saliency (QVH 2s-clip annotator scores) plus
        # our predicted scores; both ride the same records since
        # eval_submission(results, results) self-scores.
        want_saliency = (
            getattr(self.model.cfg, "saliency_head", False)
            and hasattr(self.model, "saliency_scores")
        )
        gt_by_qid = {a["qid"]: a for a in self.val_loader.dataset.annotation}
        results = []
        for batch in self.val_loader:
            saliency = None
            if want_saliency:
                outputs, saliency = self.model.generate(
                    params, batch, return_saliency=True
                )
            else:
                outputs = self.model.generate(params, batch)
            for row, (qid, query, vid, target, output, valid) in enumerate(zip(
                batch.qid, batch.query, batch.vid, batch.text_output, outputs,
                batch.valid,
            )):
                if not valid:
                    continue
                record = {
                    "qid": qid,
                    "query": query,
                    "vid": vid,
                    "relevant_windows": moment_str_to_list(post_process(target)),
                    "pred_relevant_windows": moment_str_to_list(post_process(output)),
                }
                ann = gt_by_qid.get(qid, {})
                if saliency is not None and "saliency_scores" in ann:
                    from mraudio_tpu.infer.evaluate import saliency_to_clip_grid

                    record["pred_saliency_scores"] = saliency_to_clip_grid(
                        batch.timestamps[row], saliency[row], ann["duration"]
                    )
                    record["saliency_scores"] = ann["saliency_scores"]
                    record["duration"] = ann["duration"]
                    record["relevant_clip_ids"] = ann.get(
                        "relevant_clip_ids",
                        list(range(len(ann["saliency_scores"]))),
                    )
                results.append(record)
        results = _allgather_results(results)
        return eval_submission(results, results, verbose=False)

    # ------------------------------------------------------------------

    def _save_checkpoint(self, epoch: int, is_best: bool,
                         name: str | None = None) -> str:
        os.makedirs(self.cfg.train.output_dir, exist_ok=True)
        if name is None:
            name = "best" if is_best else str(epoch)
        path = ckpt.save_checkpoint(
            self.cfg.train.output_dir, name, self.trainable, self.opt_state, epoch
        )
        # Sidecar meta: the exact step position, so resume continues the
        # LR schedule / dropout-key / augmentation streams and (for
        # preempt saves) skips the consumed part of the epoch.  A sidecar
        # (not part of the orbax payload) keeps old checkpoints loadable.
        import json

        step_in_epoch = self._step_in_epoch if name == "preempt" else 0
        with open(path + ".meta.json", "w") as f:
            json.dump({
                "epoch": epoch,
                "global_step": self.global_step,
                "step_in_epoch": step_in_epoch,
            }, f)
        logger.info("Saving checkpoint at epoch %d to %s.", epoch, path)
        return path

    def reload_best_model(self) -> None:
        """Load ``checkpoint_best`` into the live params (the reference's
        ``_reload_best_model``, ``utils/trainer.py:212-230``)."""
        path = os.path.join(self.cfg.train.output_dir, "checkpoint_best")
        payload = ckpt.load_checkpoint(path, self.trainable, self.opt_state)
        self.trainable = {k: jnp.asarray(payload["model"][k]) for k in self.trainable}
        logger.info("Loading checkpoint from %s.", path)

    def _load_checkpoint(self, path: str) -> None:
        if path.endswith(".meta.json"):   # sidecar picked by a glob
            path = path[: -len(".meta.json")]
        from mraudio_tpu.utils import fetch

        if fetch.is_url(path):
            # URL-or-file resume, reference parity (`_load_checkpoint`,
            # /root/reference/utils/trainer.py:232-254): a URL names a
            # tar/zip archive of the Orbax checkpoint dir, downloaded
            # and extracted once into the shared cache.
            path = fetch.cached_checkpoint_dir(path)
        payload = ckpt.load_checkpoint(path, self.trainable, self.opt_state)
        restored = payload["model"]
        self.trainable = {
            k: jnp.asarray(restored[k]) for k in self.trainable
        }
        self.opt_state = jax.tree_util.tree_map(
            jnp.asarray, payload["opt_state"]
        )
        epoch = int(payload["epoch"])
        import json

        meta = None
        if os.path.exists(path + ".meta.json"):
            with open(path + ".meta.json") as f:
                meta = json.load(f)
        if meta is not None:
            self.global_step = int(meta["global_step"])
            self._skip_steps = int(meta["step_in_epoch"])
            # preempt saves (step_in_epoch > 0) resume INSIDE the saved
            # epoch; epoch-boundary saves resume at the next one
            self.start_epoch = epoch if self._skip_steps > 0 else epoch + 1
        else:
            # legacy checkpoint without meta: epoch-boundary resume; the
            # step counter is reconstructed from the epoch ordinal
            self.start_epoch = epoch + 1
            self.global_step = self.start_epoch * self.steps_per_epoch
        logger.info(
            "Resume checkpoint from %s (epoch %d, step %d, skip %d)",
            path, self.start_epoch, self.global_step, self._skip_steps,
        )


def _allgather_results(results: list[dict]) -> list[dict]:
    """Gather eval records across processes (multi-host val sharding,
    the counterpart of the reference's DistributedSampler val split)."""
    import jax

    if jax.process_count() == 1:
        return results
    import json

    from jax.experimental import multihost_utils

    payload = json.dumps(results).encode()
    # Ragged across hosts: gather lengths, pad to the max, gather, trim.
    lengths = multihost_utils.process_allgather(
        np.array([len(payload)], dtype=np.int64)
    ).reshape(-1)
    max_len = int(lengths.max())
    buf = np.zeros(max_len, dtype=np.uint8)
    buf[: len(payload)] = np.frombuffer(payload, dtype=np.uint8)
    all_payloads = multihost_utils.process_allgather(buf)
    all_payloads = np.asarray(all_payloads).reshape(len(lengths), max_len)
    out = []
    for row, n in zip(all_payloads, lengths):
        out.extend(json.loads(bytes(row[: int(n)]).decode()))
    return out
