"""Hierarchical (HCM) trainer — the `hierarchical_trainer` equivalent.

Mirrors the reference hierarchical RoboDaggerTrainer
(/root/reference/robo_vln_baselines/hierarchical_trainer.py:277-988): two
models with two optimizers (AdamW + CyclicLR high-level / Adam low-level,
:330-337), an optimizer step per TBPTT window, scheduler step per outer batch
(:739), per-epoch checkpoints with both state dicts, validation epoch with
high-level accuracy.

Where the reference splits the two modules over cuda:0/cuda:1 with a
per-window device-to-device copy (:517-521), here BOTH updates run in ONE
jitted XLA program on the mesh (steps.make_hier_train_step) — the copy
disappears and the shared frozen encoders execute once.
"""

from __future__ import annotations

import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from robo_vln_tpu.data.loader import split_tbptt
from robo_vln_tpu.models import build_hierarchical_policies, resolve_dtype
from robo_vln_tpu.parallel import mesh as mesh_lib
from robo_vln_tpu.training import checkpoint as ckpt_lib
from robo_vln_tpu.training import optimizers as opt_lib
from robo_vln_tpu.training import steps as steps_lib
from robo_vln_tpu.training.trainer import BaseTrainer, RoboVLNTrainer, _dummy_batch
from robo_vln_tpu.utils.logging import MetricsWriter, logger
from robo_vln_tpu.utils.registry import register_trainer


@register_trainer("hierarchical_trainer")
class HierarchicalTrainer(BaseTrainer):
    def __init__(self, config):
        self.config = config
        self.mesh = mesh_lib.make_training_mesh(
            config.TPU.MESH_SHAPE, config.TPU.MESH_AXES, config.DAGGER.BATCH_SIZE
        )
        # DAGGER.BATCH_SIZE is per-device; every chip holds a batch shard
        self.global_batch = mesh_lib.global_batch_size(
            config.DAGGER.BATCH_SIZE, self.mesh
        )
        self.features_dir = config.DAGGER.LMDB_FEATURES_DIR.format(
            split=config.TASK_CONFIG.DATASET.SPLIT
        )
        self.eval_dir = config.DAGGER.LMDB_EVAL_DIR
        self.high = None
        self.low = None
        self.state: Optional[steps_lib.HierTrainState] = None

    # reuse the flat trainer's batch pipeline and DAgger collection hooks
    _batches = RoboVLNTrainer._batches
    _update_dataset = RoboVLNTrainer._update_dataset
    _collection_mixer = RoboVLNTrainer._collection_mixer

    def _setup_policy(self, load_from_ckpt: bool = False, ckpt_path: str = ""):
        cfg = self.config
        from robo_vln_tpu.ops import cm_attention

        cm_attention.set_use_pallas(cfg.TPU.PALLAS_ATTENTION)
        self.high, self.low = build_hierarchical_policies(
            cfg.MODEL, compute_dtype=resolve_dtype(cfg.TPU.PRECISION)
        )
        B = self.global_batch
        batch = _dummy_batch(cfg, B)
        obs = {k: batch[k] for k in ("rgb", "depth", "instruction", "progress")}
        rng = jax.random.PRNGKey(cfg.TASK_CONFIG.SEED)

        # init on the host CPU on accelerator platforms (see trainer.py:
        # remote-compile budget + recycled-process startup cost)
        from robo_vln_tpu.training.trainer import _nullcontext

        on_accel = jax.devices()[0].platform != "cpu"
        init_ctx = (jax.default_device(jax.devices("cpu")[0]) if on_accel
                    else _nullcontext())
        with init_ctx:
            hvars = jax.jit(self.high.init)(
                rng, obs, self.high.initial_hidden(B), batch["prev_actions"],
                batch["not_done_masks"],
            )
            lvars = jax.jit(self.low.init)(
                jax.random.fold_in(rng, 1), obs, self.low.initial_hidden(B),
                batch["prev_actions"], batch["not_done_masks"],
                np.zeros((B, 2), np.int32),
            )
        from robo_vln_tpu.utils.pretrained import graft_pretrained

        hvars, high_prov = graft_pretrained(hvars, cfg.MODEL)
        lvars, low_prov = graft_pretrained(lvars, cfg.MODEL)
        # one merged provenance: a backbone "in the model" if either module
        # holds it; "loaded" only if loaded everywhere it is needed
        order = {"missing_file": 3, "error": 2, "loaded": 1, "not_in_model": 0}
        self.pretrained_backbones = {
            k: max(high_prov[k], low_prov[k],
                   key=lambda d: order.get(d.get("status"), 0))
            for k in high_prov
        }
        if cfg.TPU.SYNC_FROZEN_TRUNKS_ON_INIT:
            from robo_vln_tpu.models import sync_frozen_trunks

            lvars = sync_frozen_trunks(hvars, lvars)
        hp, lp = hvars["params"], lvars["params"]
        self._high_extra = {k: v for k, v in hvars.items() if k != "params"}
        self._low_extra = {k: v for k, v in lvars.items() if k != "params"}
        n_params = sum(
            x.size for x in jax.tree.leaves(hp) + jax.tree.leaves(lp)
        )
        logger.info(f"agent number of parameters: {n_params}")

        wd = cfg.MODEL.TRANSFORMER.weight_decay
        unfrozen = self._unfrozen_names()
        self.tx_high = opt_lib.masked(opt_lib.adamw(wd), hp, unfrozen=unfrozen)
        self.tx_low = opt_lib.masked(opt_lib.adam(wd), lp, unfrozen=unfrozen)
        with init_ctx:
            self.state = steps_lib.HierTrainState(
                steps_lib.TrainState(hp, self.tx_high.init(hp), jnp.asarray(0)),
                steps_lib.TrainState(lp, self.tx_low.init(lp), jnp.asarray(0)),
            )
        if on_accel:
            self.state = jax.device_get(self.state)
        if load_from_ckpt and ckpt_path:
            self.state = ckpt_lib.load_checkpoint(ckpt_path, self.state)
            # frozen BN stats ride next to the train state (see trainer.py)
            extra = ckpt_lib.load_extra_variables(ckpt_path)
            if extra is not None and "high" in extra:
                self._high_extra = extra["high"]
                self._low_extra = extra["low"]
            logger.info(f"Loaded weights from checkpoint: {ckpt_path}")

        high_b = _bind(self.high, self._high_extra)
        low_b = _bind(self.low, self._low_extra)
        trunk_fn = self._maybe_trunk_fn()
        # opt-in IW deviation: the reference computes inflection weights and
        # never applies them (PARITY.md); both keys must agree to activate
        iw_coef = (
            cfg.MODEL.inflection_weight_coef
            if cfg.TPU.APPLY_INFLECTION_WEIGHTS and cfg.DAGGER.USE_IW
            else None
        )
        vvm = cfg.TPU.VALID_MASK_VELOCITY_MSE
        self.train_step = steps_lib.make_hier_train_step(
            high_b, low_b, self.tx_high, self.tx_low, self.mesh,
            donate=cfg.TPU.DONATE, remat=cfg.TPU.REMAT, trunk_fn=trunk_fn,
            inflection_coef=iw_coef, valid_velocity_mse=vvm,
            unfrozen=unfrozen,
        )
        self.val_step = steps_lib.make_hier_val_step(
            high_b, low_b, trunk_fn=trunk_fn, valid_velocity_mse=vvm,
        )

    def _featurized_dirs(self):
        """Feature-store twin buffers (DAGGER.PRELOAD_TRUNK_FEATURES).  The
        low level consumes features computed with the HIGH level's frozen
        trunks, so the identity guard applies exactly as for trunk sharing."""
        from robo_vln_tpu.models import frozen_trunks_identical, resolve_dtype
        from robo_vln_tpu.training.featurize import ensure_featurized

        cfg = self.config
        if not frozen_trunks_identical(
            self.state.high.params, self.state.low.params,
            self._high_extra, self._low_extra,
        ):
            logger.warning(
                "PRELOAD_TRUNK_FEATURES: high/low trunk weights differ; "
                "training from raw frames"
            )
            return self.features_dir, self.eval_dir
        dt = resolve_dtype(cfg.TPU.PRECISION)
        params = jax.device_get(self.state.high.params)
        train_dir = ensure_featurized(
            cfg, dt, params, self._high_extra, self.features_dir
        )
        eval_dir = self.eval_dir
        if os.path.exists(eval_dir):
            eval_dir = ensure_featurized(
                cfg, dt, params, self._high_extra, eval_dir
            )
        return train_dir, eval_dir

    def _maybe_trunk_fn(self):
        """Shared frozen-trunk forward when enabled AND safe (both policies
        hold bitwise-identical trunk weights — true whenever the trunks come
        from the same pretrained files or the same converted checkpoint).
        Called fresh after any weight load so the check sees current state."""
        from robo_vln_tpu.models import (
            frozen_trunks_identical, make_shared_trunk_fn, resolve_dtype,
        )

        cfg = self.config
        if not cfg.TPU.get("SHARE_FROZEN_TRUNKS", True):
            return None
        if not frozen_trunks_identical(
            self.state.high.params, self.state.low.params,
            self._high_extra, self._low_extra,
        ):
            logger.info(
                "frozen trunk weights differ between high/low policies; "
                "trunk sharing disabled (two-pass forward)"
            )
            return None
        logger.info(
            "frozen trunks identical: sharing one ResNet pass per modality "
            "across both policies (TPU.SHARE_FROZEN_TRUNKS)"
        )
        return make_shared_trunk_fn(
            cfg.MODEL, resolve_dtype(cfg.TPU.PRECISION), self._high_extra
        )

    def save_checkpoint(self, file_name: str) -> None:
        path = os.path.join(self.config.CHECKPOINT_FOLDER, file_name)
        ckpt_lib.save_checkpoint(
            path, self.state,
            metadata={
                "config": self.config.to_dict(),
                "scheduler_step": int(getattr(self, "_scheduler_step", 0)),
                "train_steps": int(getattr(self, "_train_steps", 0)),
                "val_steps": int(getattr(self, "_val_steps", 0)),
            },
        )
        ckpt_lib.save_extra_variables(
            path, {"high": self._high_extra, "low": self._low_extra}
        )

    def train_epoch(self, batches, epoch, writer, train_steps):
        cfg = self.config
        lr_low = cfg.DAGGER.LR
        scheduler_step = getattr(self, "_scheduler_step", 0)
        from robo_vln_tpu.envs.async_env import window_stream

        # decode/collate + async host->device transfer one WINDOW ahead in
        # the worker thread (see trainer.py train_epoch)
        hh = lh = None
        cyc = dict(
            base_lr=cfg.DAGGER.CYCLIC_BASE_LR, max_lr=cfg.DAGGER.CYCLIC_MAX_LR,
            step_size_up=cfg.DAGGER.CYCLIC_STEP_SIZE_UP,
            step_size_down=cfg.DAGGER.CYCLIC_STEP_SIZE_DOWN,
        )
        lr_high = opt_lib.cyclic_triangular_lr(scheduler_step, **cyc)
        for is_first, window in window_stream(
            batches,
            lambda w: mesh_lib.shard_batch(self.mesh, w),
            lambda b: split_tbptt(b, cfg.DAGGER.tbptt_steps),
        ):
            if is_first:
                if hh is not None:
                    scheduler_step += 1  # per outer batch (ref :739)
                    lr_high = opt_lib.cyclic_triangular_lr(
                        scheduler_step, **cyc
                    )
                B = self.global_batch
                hh = jax.device_put(
                    self.high.initial_hidden(B),
                    mesh_lib.hidden_sharding(self.mesh),
                )
                lh = jax.device_put(
                    self.low.initial_hidden(B),
                    mesh_lib.hidden_sharding(self.mesh),
                )
            self.state, hh, lh, metrics = self.train_step(
                self.state, hh, lh, window, lr_high, lr_low
            )
            writer.add_scalar(
                "Train High Level Action Loss", metrics["high_level_loss"],
                train_steps,
            )
            writer.add_scalar(
                "Train Low Level Action Loss",
                metrics["low_level_action_loss"], train_steps,
            )
            writer.add_scalar(
                "Train Low Level Stop Loss", metrics["low_level_stop_loss"],
                train_steps,
            )
            writer.add_scalar(
                "Train Low_level Total Loss",
                metrics["low_level_total_loss"], train_steps,
            )
            train_steps += 1
        if hh is not None:
            scheduler_step += 1  # the final batch
        self._scheduler_step = scheduler_step
        self._train_steps = train_steps
        self.save_checkpoint(f"ckpt.{cfg.DAGGER.EPOCHS + epoch}")
        return train_steps

    def val_epoch(self, batches, epoch, writer, val_steps):
        cfg = self.config
        high_losses, low_losses, accs = [], [], []
        for batch in batches:
            B = self.global_batch
            hh = jax.device_put(
                self.high.initial_hidden(B), mesh_lib.hidden_sharding(self.mesh)
            )
            lh = jax.device_put(
                self.low.initial_hidden(B), mesh_lib.hidden_sharding(self.mesh)
            )
            for window in split_tbptt(batch, cfg.DAGGER.tbptt_steps):
                window = mesh_lib.shard_batch(self.mesh, window)
                hh, lh, metrics = self.val_step(
                    self.state.high.params, self.state.low.params, hh, lh, window
                )
                writer.add_scalar(
                    "Val High Level Loss", metrics["high_level_loss"], val_steps
                )
                writer.add_scalar(
                    "Val Low Level Loss", metrics["low_level_total_loss"],
                    val_steps,
                )
                val_steps += 1
                high_losses.append(float(metrics["high_level_loss"]))
                low_losses.append(float(metrics["low_level_total_loss"]))
                accs.append(float(metrics["high_level_accuracy"]))
        if high_losses:
            writer.add_scalar(
                "Val High Level Loss Epoch", float(np.mean(high_losses)), epoch
            )
            writer.add_scalar(
                "Val Low Level Loss Epoch", float(np.mean(low_losses)), epoch
            )
            writer.add_scalar(
                "Validation Accuracy", 100.0 * float(np.mean(accs)), epoch
            )
        self._val_steps = val_steps
        return val_steps

    def train(self) -> None:
        cfg = self.config
        os.makedirs(cfg.CHECKPOINT_FOLDER, exist_ok=True)
        collect = not cfg.DAGGER.PRELOAD_LMDB_FEATURES
        if collect and cfg.DAGGER.COLLECT_ONLY:
            # reference behavior: collect then stop (robo_vln_trainer.py:903)
            self._update_dataset(0)
            logger.info("Data collection complete")
            return

        start_epoch, resume_ckpt, resume_meta = (
            self._find_resume() if cfg.DAGGER.RESUME else (0, "", {})
        )
        if resume_ckpt:
            self._setup_policy(True, resume_ckpt)
            self._scheduler_step = int(resume_meta.get("scheduler_step", 0))
            logger.info(f"resuming at epoch {start_epoch} from {resume_ckpt}")
        else:
            self._setup_policy(cfg.DAGGER.LOAD_FROM_CKPT, cfg.DAGGER.CKPT_TO_LOAD)
        with MetricsWriter(cfg.TENSORBOARD_DIR) as writer:
            train_steps = int(resume_meta.get("train_steps", 0))
            val_steps = int(resume_meta.get("val_steps", 0))
            done_through = start_epoch
            for dagger_it, epochs in self._iteration_plan(start_epoch):
                if collect:
                    self._update_dataset(dagger_it)
                    logger.info(
                        f"Data collection complete (iteration {dagger_it})"
                    )
                train_dir, eval_dir = self.features_dir, self.eval_dir
                if cfg.DAGGER.PRELOAD_TRUNK_FEATURES:
                    # after collection so a freshly grown buffer refeaturizes
                    train_dir, eval_dir = self._featurized_dirs()
                for epoch in epochs:
                    t0 = time.time()
                    train_steps = self.train_epoch(
                        self._batches(train_dir, seed=epoch),
                        epoch, writer, train_steps,
                    )
                    if os.path.exists(eval_dir):
                        val_steps = self.val_epoch(
                            self._batches(eval_dir, seed=epoch),
                            epoch, writer, val_steps,
                        )
                    logger.info(
                        f"epoch {epoch} done in {time.time() - t0:.1f}s"
                    )
                done_through = epochs.stop
            if done_through < self._total_epochs:
                logger.info(
                    f"stopping after epoch {done_through - 1} "
                    "(DAGGER.MAX_EPOCHS_PER_RUN); a DAGGER.RESUME run "
                    f"continues at epoch {done_through}"
                )

    def _eval_checkpoint(self, checkpoint_path, writer, checkpoint_index=0):
        from robo_vln_tpu.eval.evaluator import eval_hierarchical_checkpoint

        eval_hierarchical_checkpoint(self, checkpoint_path, writer, checkpoint_index)


def _bind(policy, extra):
    class _Bound:
        def apply(self, variables, *args, **kwargs):
            return policy.apply({**extra, **variables}, *args, **kwargs)

    return _Bound()
