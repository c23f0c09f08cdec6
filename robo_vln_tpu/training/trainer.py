"""Flat IL trainer (Seq2Seq / CMA) — the `robo_vln_trainer` equivalent.

Mirrors the reference RoboDaggerTrainer
(/root/reference/robo_vln_baselines/robo_vln_trainer.py:294-954):
DAgger-iteration loop -> epochs -> per-batch TBPTT windows with an optimizer
step per window, per-epoch checkpoints, a validation epoch on the eval buffer.

TPU mapping:
* training never touches the simulator (PRELOAD path, all paper configs) —
  the buffer feeds static-shape bucketed batches; every TBPTT window hits the
  SAME compiled program;
* data parallelism: batch sharded over the mesh "data" axis (the reference's
  dormant DDP stanza);
* checkpoints carry optimizer state (the reference's don't — resume is exact
  here).

Data collection (`_update_dataset`) and closed-loop eval live behind the env
layer (envs/, eval/) and run host-side.
"""

from __future__ import annotations

import os
import time
from typing import Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from robo_vln_tpu.data.loader import (
    TrajectoryDataset,
    batch_iterator,
    split_tbptt,
)
from robo_vln_tpu.models import build_flat_policy, resolve_dtype
from robo_vln_tpu.parallel import mesh as mesh_lib
from robo_vln_tpu.training import checkpoint as ckpt_lib
from robo_vln_tpu.training import optimizers as opt_lib
from robo_vln_tpu.training import steps as steps_lib
from robo_vln_tpu.utils.logging import MetricsWriter, logger
from robo_vln_tpu.utils.registry import register_trainer


def _nullcontext():
    import contextlib

    return contextlib.nullcontext()


def _dummy_batch(config, batch_size: int, t: int = 2) -> Dict[str, np.ndarray]:
    """Abstract-init batch with the task's static shapes and the loader's
    transfer dtypes (rgb uint8 / depth f16, data/loader.SENSOR_DTYPES)."""
    sim = config.TASK_CONFIG.SIMULATOR
    L = config.DAGGER.MAX_INSTRUCTION_LEN
    return {
        "rgb": np.zeros(
            (batch_size, t, sim.RGB_SENSOR.HEIGHT, sim.RGB_SENSOR.WIDTH, 3),
            np.uint8,
        ),
        "depth": np.zeros(
            (batch_size, t, sim.DEPTH_SENSOR.HEIGHT, sim.DEPTH_SENSOR.WIDTH, 1),
            np.float16,
        ),
        "instruction": np.zeros((batch_size, L), np.int32),
        "progress": np.zeros((batch_size, t), np.float32),
        "vln_oracle_action_sensor": np.zeros((batch_size, t), np.float32),
        "prev_actions": np.zeros((batch_size, t, 2), np.float32),
        "corrected_actions": np.zeros((batch_size, t, 2), np.float32),
        "oracle_stop": np.full((batch_size, t, 1), -1.0, np.float32),
        "not_done_masks": np.ones((batch_size, t), np.float32),
        "valid_mask": np.zeros((batch_size, t), np.float32),
    }


class BaseTrainer:
    """Shared eval dispatch: poll EVAL_CKPT_PATH_DIR like the reference's
    BaseRLTrainer.eval (SURVEY.md §3.3)."""

    def _unfrozen_names(self) -> tuple:
        """Backbone subtrees lifted out of the frozen set by explicit
        deviation flags.  MODEL.BERT.trainable (PARITY.md) unfreezes the
        instruction embedding; it cannot combine with the feature store,
        which caches BERT outputs as constants (training/featurize.py)."""
        cfg = self.config
        if not getattr(cfg.MODEL.BERT, "trainable", False):
            return ()
        if cfg.DAGGER.PRELOAD_TRUNK_FEATURES:
            raise ValueError(
                "MODEL.BERT.trainable=True is incompatible with "
                "DAGGER.PRELOAD_TRUNK_FEATURES: the feature store caches the "
                "frozen BERT instruction embeddings (training/featurize.py)"
            )
        return ("embedding_layer",)

    def _find_resume(self):
        """DAGGER.RESUME: locate the newest per-epoch checkpoint in
        CHECKPOINT_FOLDER and the loop counters it recorded.  Returns
        (next_epoch, ckpt_path, metadata) — (0, "", {}) when starting fresh.
        The reference saves per epoch but can only restart from scratch
        (robo_vln_trainer.py:720-722); here the checkpoint carries the full
        train state incl. optimizer, and metadata carries scheduler position
        and TB step counters, so the resumed run continues exactly."""
        cfg = self.config
        ckpts = ckpt_lib.list_checkpoints(cfg.CHECKPOINT_FOLDER)
        if not ckpts:
            return 0, "", {}
        latest = ckpts[-1]
        try:
            # per-epoch names are ckpt.{EPOCHS+epoch} (reference scheme)
            epoch_done = int(os.path.basename(latest).split(".")[-1])
            epoch_done -= cfg.DAGGER.EPOCHS
        except ValueError:
            return 0, "", {}
        if epoch_done < 0:
            return 0, "", {}
        meta = ckpt_lib.load_metadata(latest) or {}
        return epoch_done + 1, latest, meta

    def _iteration_plan(self, start_epoch: int):
        """(dagger_it, epoch_range) schedule with GLOBAL epoch numbering:
        iteration k trains epochs [k*EPOCHS, (k+1)*EPOCHS), so checkpoint
        names ckpt.{EPOCHS+epoch} stay monotonic across DAgger iterations
        (reference-identical for ITERATIONS=1; the reference never actually
        interleaves collection and training — its PRELOAD=False branch
        collects then breaks, robo_vln_trainer.py:896-904).
        MAX_EPOCHS_PER_RUN bounds the per-process total across iterations;
        resume (global start_epoch) skips fully-trained iterations."""
        cfg = self.config
        per = cfg.DAGGER.EPOCHS
        budget = cfg.DAGGER.MAX_EPOCHS_PER_RUN
        if budget <= 0:
            budget = per * cfg.DAGGER.ITERATIONS
        plan = []
        for k in range(cfg.DAGGER.ITERATIONS):
            begin = max(k * per, start_epoch)
            end = min((k + 1) * per, begin + budget)
            if begin >= end:
                continue  # this iteration is already fully trained
            budget -= end - begin
            plan.append((k, range(begin, end)))
            if budget <= 0:
                break
        return plan

    @property
    def _total_epochs(self) -> int:
        return self.config.DAGGER.EPOCHS * self.config.DAGGER.ITERATIONS

    def eval(self) -> None:
        """Evaluate EVAL_CKPT_PATH_DIR: a single checkpoint, or a folder
        sweep.  With EVAL.ONCE=False the sweep becomes the reference's eval
        daemon (habitat BaseRLTrainer.eval polls the folder for NEW
        checkpoints forever, reference README.md:209) — eval runs
        concurrently with training and picks up each epoch's checkpoint as
        it lands; EVAL.POLL_IDLE_TIMEOUT_SEC bounds how long to wait after
        the last new checkpoint (0 = forever, the reference behavior).
        EVAL.ONCE=True (default) lists the folder once and exits — a
        deliberate usability deviation recorded in docs/PARITY.md."""
        from robo_vln_tpu.utils.logging import MetricsWriter

        path = self.config.EVAL_CKPT_PATH_DIR
        once = bool(self.config.EVAL.get("ONCE", True))
        interval = float(self.config.EVAL.get("POLL_INTERVAL_SEC", 2.0))
        idle_timeout = float(
            self.config.EVAL.get("POLL_IDLE_TIMEOUT_SEC", 0.0)
        )
        with MetricsWriter(self.config.TENSORBOARD_DIR) as writer:
            if not (os.path.isdir(path) and not os.path.exists(
                os.path.join(path, "framework_metadata.json")
            )):
                self._eval_checkpoint(path, writer, checkpoint_index=0)
                return
            evaluated = set()
            index = 0
            last_new = time.time()
            while True:
                fresh = [c for c in ckpt_lib.list_checkpoints(path)
                         if c not in evaluated]
                for ck in fresh:
                    try:
                        self._eval_checkpoint(ck, writer, checkpoint_index=index)
                    except Exception:
                        if once:
                            raise
                        # daemon mode: a checkpoint can be listed mid-save;
                        # leave it un-evaluated and retry on the next poll
                        logger.exception(
                            f"eval daemon: checkpoint {ck} failed "
                            "(possibly mid-save); will retry"
                        )
                        break
                    evaluated.add(ck)
                    index += 1
                    last_new = time.time()
                if once:
                    break
                idle = time.time() - last_new
                if idle_timeout > 0 and idle > idle_timeout:
                    logger.info(
                        f"eval daemon: no new checkpoint in {idle:.0f}s "
                        f"(POLL_IDLE_TIMEOUT_SEC={idle_timeout:.0f}); exiting "
                        f"after {len(evaluated)} checkpoints"
                    )
                    break
                time.sleep(interval)


@register_trainer("robo_vln_trainer")
class RoboVLNTrainer(BaseTrainer):
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
        self.policy = None
        self.state: Optional[steps_lib.TrainState] = None

    # -- setup ---------------------------------------------------------------
    def _setup_policy(self, load_from_ckpt: bool = False, ckpt_path: str = ""):
        cfg = self.config
        from robo_vln_tpu.ops import cm_attention

        cm_attention.set_use_pallas(cfg.TPU.PALLAS_ATTENTION)
        self.policy = build_flat_policy(
            cfg.MODEL, compute_dtype=resolve_dtype(cfg.TPU.PRECISION)
        )
        batch = _dummy_batch(cfg, self.global_batch)
        hidden = self.policy.initial_hidden(self.global_batch)
        obs = {
            k: batch[k]
            for k in ("rgb", "depth", "instruction", "progress")
        }
        rng = jax.random.PRNGKey(cfg.TASK_CONFIG.SEED)
        # On an accelerator platform, trace/init on the HOST CPU and hand the
        # step uncommitted (host) state: the remote-compile budget of the
        # tunneled TPU goes to the train step rather than init, and recycled
        # processes (DAGGER.MAX_EPOCHS_PER_RUN) skip a model-sized compile
        # (docs/TPU_ENV_NOTES.md).  The first step transfers params once.
        on_accel = jax.devices()[0].platform != "cpu"
        init_ctx = (jax.default_device(jax.devices("cpu")[0]) if on_accel
                    else _nullcontext())
        with init_ctx:
            variables = jax.jit(self.policy.init)(
                rng, obs, hidden, batch["prev_actions"], batch["not_done_masks"]
            )
        from robo_vln_tpu.utils.pretrained import graft_pretrained

        variables, self.pretrained_backbones = graft_pretrained(
            jax.tree.map(lambda x: x, variables), cfg.MODEL
        )
        params = variables["params"]
        n_params = sum(x.size for x in jax.tree.leaves(params))
        logger.info(f"agent number of parameters: {n_params}")

        unfrozen = self._unfrozen_names()
        self.tx = opt_lib.masked(opt_lib.adam(), params, unfrozen=unfrozen)
        with init_ctx:
            opt_state = self.tx.init(params)
        self.state = steps_lib.TrainState(params, opt_state, jnp.asarray(0))
        if on_accel:
            self.state = jax.device_get(self.state)
        self.extra_variables = {
            k: v for k, v in variables.items() if k != "params"
        }

        if load_from_ckpt and ckpt_path:
            self.state = ckpt_lib.load_checkpoint(ckpt_path, self.state)
            # non-param collections (frozen BN stats) saved next to the train
            # state — restoring them matters when the checkpoint's trunks came
            # from a converted .pth rather than the pretrained weight files
            extra = ckpt_lib.load_extra_variables(ckpt_path)
            if extra is not None:
                self.extra_variables = extra
            logger.info(f"Loaded weights from checkpoint: {ckpt_path}")

        use_pm = cfg.MODEL.PROGRESS_MONITOR.use
        vvm = cfg.TPU.VALID_MASK_VELOCITY_MSE
        self.train_step = steps_lib.make_flat_train_step(
            self._bound_policy(), self.tx, self.mesh,
            use_progress=use_pm, progress_alpha=cfg.MODEL.PROGRESS_MONITOR.alpha,
            donate=cfg.TPU.DONATE, remat=cfg.TPU.REMAT,
            valid_velocity_mse=vvm, unfrozen=unfrozen,
        )
        self.val_step = steps_lib.make_flat_val_step(
            self._bound_policy(), use_progress=use_pm,
            progress_alpha=cfg.MODEL.PROGRESS_MONITOR.alpha,
            valid_velocity_mse=vvm,
        )

    def _bound_policy(self):
        """Policy whose apply() closes over non-param collections (BN stats)."""
        policy = self.policy
        extra = self.extra_variables

        class _Bound:
            def apply(self, variables, *args, **kwargs):
                return policy.apply({**extra, **variables}, *args, **kwargs)

        return _Bound()

    def save_checkpoint(self, file_name: str) -> None:
        path = os.path.join(self.config.CHECKPOINT_FOLDER, file_name)
        ckpt_lib.save_checkpoint(
            path, self.state,
            metadata={
                "config": self.config.to_dict(),
                "train_steps": int(getattr(self, "_train_steps", 0)),
                "val_steps": int(getattr(self, "_val_steps", 0)),
            },
        )
        ckpt_lib.save_extra_variables(path, self.extra_variables)

    # -- epochs ---------------------------------------------------------------
    def _batches(self, features_dir: str, seed: int) -> Iterator[Dict]:
        cfg = self.config
        if int(cfg.DAGGER.LOADER_WORKERS) > 1:
            from robo_vln_tpu.data.parallel_loader import (
                parallel_batch_iterator,
            )

            return parallel_batch_iterator(
                features_dir,
                self.global_batch,
                list(cfg.DAGGER.EPISODE_LEN_BUCKETS),
                cfg.DAGGER.MAX_INSTRUCTION_LEN,
                num_workers=int(cfg.DAGGER.LOADER_WORKERS),
                seed=seed,
                is_bert=cfg.MODEL.INSTRUCTION_ENCODER.is_bert,
                use_iw=cfg.DAGGER.USE_IW,
                inflection_weight_coef=cfg.MODEL.inflection_weight_coef,
            )
        dataset = TrajectoryDataset(
            features_dir,
            batch_size=self.global_batch,
            is_bert=cfg.MODEL.INSTRUCTION_ENCODER.is_bert,
            use_iw=cfg.DAGGER.USE_IW,
            inflection_weight_coef=cfg.MODEL.inflection_weight_coef,
            seed=seed,
        )
        return batch_iterator(
            dataset,
            self.global_batch,
            list(cfg.DAGGER.EPISODE_LEN_BUCKETS),
            cfg.DAGGER.MAX_INSTRUCTION_LEN,
        )

    def train_epoch(self, batches, epoch: int, writer, train_steps: int) -> int:
        cfg = self.config
        lr = cfg.DAGGER.LR
        from robo_vln_tpu.envs.async_env import window_stream

        # host decode/collate AND the host->device copy overlapped with
        # device compute, one WINDOW ahead (bounded device memory; worker
        # errors propagate)
        hidden = None
        for is_first, window in window_stream(
            batches,
            lambda w: mesh_lib.shard_batch(self.mesh, w),
            lambda b: split_tbptt(b, cfg.DAGGER.tbptt_steps),
        ):
            if is_first:
                hidden = jax.device_put(
                    self.policy.initial_hidden(self.global_batch),
                    mesh_lib.hidden_sharding(self.mesh),
                )
            self.state, hidden, metrics = self.train_step(
                self.state, hidden, window, lr
            )
            writer.add_scalar("Action Loss", metrics["action_loss"], train_steps)
            writer.add_scalar("Stop Loss", metrics["stop_loss"], train_steps)
            writer.add_scalar("Aux Loss", metrics["aux_loss"], train_steps)
            writer.add_scalar("Total Loss", metrics["total_loss"], train_steps)
            train_steps += 1
        self._train_steps = train_steps
        self.save_checkpoint(f"ckpt.{cfg.DAGGER.EPOCHS + epoch}")
        return train_steps

    def val_epoch(self, batches, epoch: int, writer, val_steps: int) -> int:
        cfg = self.config
        losses = []
        for batch in batches:
            hidden = jax.device_put(
                self.policy.initial_hidden(self.global_batch),
                mesh_lib.hidden_sharding(self.mesh),
            )
            for window in split_tbptt(batch, cfg.DAGGER.tbptt_steps):
                window = mesh_lib.shard_batch(self.mesh, window)
                hidden, metrics = self.val_step(self.state.params, hidden, window)
                writer.add_scalar("Val Action Loss", metrics["action_loss"], val_steps)
                writer.add_scalar("Val Stop Loss", metrics["stop_loss"], val_steps)
                writer.add_scalar("Val Total Loss", metrics["total_loss"], val_steps)
                val_steps += 1
                losses.append(float(metrics["total_loss"]))
        if losses:
            writer.add_scalar("Val Loss Epoch", float(np.mean(losses)), val_steps)
        self._val_steps = val_steps
        return val_steps

    def _featurized_dirs(self):
        """Feature-store twin buffers (DAGGER.PRELOAD_TRUNK_FEATURES): trunk
        features precomputed once per buffer/weights, cached and
        fingerprint-invalidated (training/featurize.py)."""
        cfg = self.config
        if (cfg.MODEL.RGB_ENCODER.cnn_type != "TorchVisionResNet50"
                or cfg.MODEL.DEPTH_ENCODER.cnn_type != "VlnResnetDepthEncoder"):
            logger.warning(
                "PRELOAD_TRUNK_FEATURES requires the ResNet encoder types; "
                "training from raw frames"
            )
            return self.features_dir, self.eval_dir
        from robo_vln_tpu.models import resolve_dtype
        from robo_vln_tpu.training.featurize import ensure_featurized

        dt = resolve_dtype(cfg.TPU.PRECISION)
        params = jax.device_get(self.state.params)
        train_dir = ensure_featurized(
            cfg, dt, params, self.extra_variables, self.features_dir
        )
        eval_dir = self.eval_dir
        if os.path.exists(eval_dir):
            eval_dir = ensure_featurized(
                cfg, dt, params, self.extra_variables, eval_dir
            )
        return train_dir, eval_dir

    # -- main loop -------------------------------------------------------------
    def train(self) -> None:
        cfg = self.config
        os.makedirs(os.path.dirname(self.features_dir) or ".", exist_ok=True)
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
                        f"epoch {epoch} done in {time.time() - t0:.1f}s "
                        f"({train_steps} train steps)"
                    )
                done_through = epochs.stop
            if done_through < self._total_epochs:
                logger.info(
                    f"stopping after epoch {done_through - 1} "
                    "(DAGGER.MAX_EPOCHS_PER_RUN); a DAGGER.RESUME run "
                    f"continues at epoch {done_through}"
                )

    # -- sim-facing paths (host-side; see envs/ and eval/) ---------------------
    def _update_dataset(self, data_it: int) -> None:
        """Grow the buffer to (data_it+1)*UPDATE_SIZE episodes.  Restartable:
        episodes already in the buffer count toward the target, so a resumed
        run never double-collects an iteration (the reference instead WIPES
        the lmdb buffer on every collect run, robo_vln_trainer.py:834-837)."""
        from robo_vln_tpu.data.trajectory_store import TrajectoryStore
        from robo_vln_tpu.envs.collection import collect_dataset

        target = (data_it + 1) * self.config.DAGGER.UPDATE_SIZE
        have = 0
        if os.path.isdir(self.features_dir):
            with TrajectoryStore(self.features_dir) as store:
                have = len(store)
        if have >= target:
            logger.info(
                f"collection iteration {data_it}: buffer already holds "
                f"{have} episodes (target {target}); skipping"
            )
            return
        mixer, beta = self._collection_mixer(data_it)
        collect_dataset(self.config, self.features_dir, mixer=mixer,
                        beta=beta, update_size=target - have)

    def _collection_mixer(self, data_it: int):
        """DAGGER.P < 1: true DAgger action mixing with beta = P**data_it
        (VLN-CE semantics; the reference exposes P but never mixes —
        robo_vln_trainer.py:387-503, docs/PARITY.md).  data_it counts
        LOAD_FROM_CKPT as one prior iteration, mirroring the reference's
        dagger_it offset (robo_vln_trainer.py:898-900)."""
        p = float(self.config.DAGGER.P)
        if self.config.DAGGER.LOAD_FROM_CKPT:
            data_it += 1
        beta = p ** data_it if p < 1.0 else 1.0
        if beta >= 1.0:
            return None, 1.0
        if getattr(self, "policy", None) is None and \
                getattr(self, "high", None) is None:
            self._setup_policy(
                self.config.DAGGER.LOAD_FROM_CKPT,
                self.config.DAGGER.CKPT_TO_LOAD,
            )
        from robo_vln_tpu.envs.dagger import mixer_for_trainer

        logger.info(
            f"DAgger mixed collection: beta={beta:.4f} "
            f"(P={p}, data_it={data_it})"
        )
        return mixer_for_trainer(self), beta

    def _eval_checkpoint(self, checkpoint_path: str, writer,
                         checkpoint_index: int = 0) -> None:
        from robo_vln_tpu.eval.evaluator import eval_flat_checkpoint

        eval_flat_checkpoint(
            self, checkpoint_path, writer, checkpoint_index
        )
