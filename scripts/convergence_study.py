"""LangNav convergence study: closed-loop metrics vs training epochs.

Addresses the quality-trajectory question (VERDICT r2 weak #2): does training
improve *navigation* — success / SPL / nDTW in the closed loop — and does it
generalize to held-out instruction compositions?  The real robo_vln dataset
is not in this image, so the study runs on LangNav (data/langnav.py): a
synthetic compositional instruction grammar whose reference path is derived
from the instruction, on the renderless kinematic backend.  val_seen =
training episodes; val_unseen = never-seen instruction programs from the
same grammar (generalization requires actually grounding the language).

Pipeline per run: generate splits -> expert collection -> (feature-store)
HCM training with per-epoch checkpoints -> closed-loop eval of selected
checkpoints on val_seen + val_unseen -> docs-ready table.

Every stage runs in its OWN subprocess (CS_STAGE env var re-invokes this
script as the stage worker): the tunneled TPU client pins every host->device
transfer buffer until process exit (docs/TPU_ENV_NOTES.md "Host->device
transfer buffers leak"), so training runs DAGGER.RESUME=True +
MAX_EPOCHS_PER_RUN=CS_EPOCHS_PER_PROC epochs per process — resume is exact
(tests/test_trainers.py::test_resume_matches_uninterrupted_run).  The parent
never imports jax (one TPU client at a time).  Every stage is restartable:
collection reuses the buffer, training resumes from the newest checkpoint,
eval skips checkpoints already in the per-split jsonl.

Usage:  python scripts/convergence_study.py [out_dir]
Knobs (env): CS_MODEL=hcm|cma|seq2seq CS_TRAIN=64 CS_VAL=12 CS_EPOCHS=24
  CS_EVAL_EVERY=4 CS_BATCH=8 CS_RGB=224 CS_DEPTH=256 CS_ON_DEVICE=1
  CS_FEATURE_MODE=1 CS_NUM_ENVS=4 CS_SEED=0 CS_EPOCHS_PER_PROC=2

Caveats recorded with the results: frozen backbones are random-init here
(no pretrained files in the image; provenance rides in every stats json),
and CS_ON_DEVICE=1 evals on the float32 device sim (math-parity-tested
fast path, eval/ondevice.py) rather than the float64 host driver.
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/robo_vln_convergence"

# model family: config yaml + trainer kind (hier = HCM two-module pipeline,
# flat = single-policy robo_vln_trainer families)
MODELS = {
    "hcm": ("hierarchical_cma.yaml", "hier"),
    "cma": ("cma_robo.yaml", "flat"),
    "seq2seq": ("seq2seq_robo.yaml", "flat"),
}
MODEL = os.environ.get("CS_MODEL", "hcm")
if MODEL not in MODELS:
    raise SystemExit(f"CS_MODEL must be one of {sorted(MODELS)}, got {MODEL!r}")

N_TRAIN = int(os.environ.get("CS_TRAIN", 64))
N_VAL = int(os.environ.get("CS_VAL", 12))
EPOCHS = int(os.environ.get("CS_EPOCHS", 24))
EVAL_EVERY = int(os.environ.get("CS_EVAL_EVERY", 4))
BATCH = int(os.environ.get("CS_BATCH", 8))
RGB = int(os.environ.get("CS_RGB", 224))
DEPTH = int(os.environ.get("CS_DEPTH", 256))
ON_DEVICE = bool(int(os.environ.get("CS_ON_DEVICE", "1")))
FEATURE_MODE = bool(int(os.environ.get("CS_FEATURE_MODE", "1")))
NUM_ENVS = int(os.environ.get("CS_NUM_ENVS", 4))
SEED = int(os.environ.get("CS_SEED", 0))
MAX_STEPS = int(os.environ.get("CS_MAX_STEPS", 500))
EPOCHS_PER_PROC = int(os.environ.get("CS_EPOCHS_PER_PROC", 2))
# program shape: turn-dense defaults (short segments, 2-4 of them) keep the
# sub-goal classes balanced enough that the high level's conditional signal
# is not swamped by the MOVE_FORWARD marginal
SEGMENTS = tuple(
    int(x) for x in os.environ.get("CS_SEGMENTS", "2,3,4").split(",")
)
LENGTHS = tuple(
    int(x) for x in os.environ.get("CS_LENGTHS", "2,3").split(",")
)
# Two documented deviations, on by default FOR THE STUDY (PARITY.md; both
# default off in the framework), fixing the round-4 closed-loop failure mode:
# the LangNav P-controller expert emits exact omega=0.0 on straights, which
# (a) the reference's zero-target MSE masking silently drops (the steering
# head never learns "go straight" -> compounding turn bias, probe_policy
# finding), and (b) pure teacher forcing never shows recovery states.
NOISE = float(os.environ.get("CS_NOISE", 0.15))
VALID_MSE = bool(int(os.environ.get("CS_VALID_MSE", "1")))
# CS_SIMPLE=1: NatureCNN-style encoders (simple_cnns.py equivalents) instead
# of the frozen ResNet trunks — the meso-scale grounding configuration, where
# every parameter that touches the instruction is trainable and the loader
# cost per frame drops ~10x (no 224px decode)
SIMPLE_CNNS = bool(int(os.environ.get("CS_SIMPLE", "0")))
# CS_TRAIN_BERT=1: MODEL.BERT.trainable (PARITY.md deviation) — the ONLY way
# HCM can ground language here: its frozen BERT is random-init in-image, and
# the r4 study's shuffled-instruction control proved the trained HCM ignores
# it entirely (val_unseen_shuffled rows ~identical to val_unseen).
# CS_BERT_HIDDEN/CS_BERT_LAYERS shrink the trainable BERT to a size this
# data scale can actually train (heads = hidden/64, intermediate = 4*hidden,
# and VISUAL_LING_ATTN.ins_in_features follows hidden).
TRAIN_BERT = bool(int(os.environ.get("CS_TRAIN_BERT", "0")))
BERT_HIDDEN = int(os.environ.get("CS_BERT_HIDDEN", "0"))  # 0 = keep default
BERT_LAYERS = int(os.environ.get("CS_BERT_LAYERS", "0"))  # 0 = keep default
# CS_DAGGER_P < 1: true DAgger arm (envs/dagger.py) — collection becomes a
# per-iteration trainer stage (PRELOAD=False, CS_DAGGER_ITERS iterations of
# EPOCHS/iters epochs each); iteration k>0 executes the mixed policy with
# beta = P**k while labels stay the expert's.
DAGGER_P = float(os.environ.get("CS_DAGGER_P", "1.0"))
DAGGER_ITERS = int(os.environ.get("CS_DAGGER_ITERS", "3"))
# checkpoint names are ckpt.{DAGGER.EPOCHS + global_epoch}; the DAgger arm
# splits the epoch budget across iterations, so the name offset shrinks
EPOCHS_PER_ITER = (max(EPOCHS // DAGGER_ITERS, 1) if DAGGER_P < 1.0
                   else EPOCHS)
TOTAL_EPOCHS = (EPOCHS_PER_ITER * DAGGER_ITERS if DAGGER_P < 1.0 else EPOCHS)
# instruction pad length (LangNav programs are <=40 tokens; the robo-vln
# default 200 wastes a 5x factor of instruction-LSTM scan steps)
INSTR_LEN = int(os.environ.get("CS_INSTR_LEN", "200"))
# host-driver cross-check row cost cap: the tunneled per-step transfer path
# leaks pinned buffers (docs/TPU_ENV_NOTES.md), so the host row runs on
# JAX_PLATFORMS=cpu over the first CS_HOST_EPISODES episodes only
HOST_EPISODES = int(os.environ.get("CS_HOST_EPISODES", "4"))


def build_config(data_dir: str):
    from robo_vln_tpu.config.default import get_config

    cfg = get_config(
        os.path.join(REPO, "robo_vln_tpu/config/configs", MODELS[MODEL][0])
    ).clone().defrost()
    tc = cfg.TASK_CONFIG
    tc.SIMULATOR.TYPE = "kinematic"
    tc.DATASET.DATA_PATH = os.path.join(data_dir, "{split}", "{split}.json.gz")
    # dense LangNav ground-truth trajectories (VLN-CE gt layout) — without
    # them nDTW falls back to the sparse waypoint polyline and reads ~0 even
    # for perfect rollouts (data/langnav.densify_path)
    gt = os.path.join(data_dir, "{split}", "{split}_gt.json.gz")
    tc.TASK.NDTW.GT_PATH = gt
    tc.TASK.SDTW.GT_PATH = gt
    tc.DATASET.SPLIT = "train"
    tc.ENVIRONMENT.MAX_EPISODE_STEPS = MAX_STEPS
    tc.SIMULATOR.RGB_SENSOR.WIDTH = tc.SIMULATOR.RGB_SENSOR.HEIGHT = RGB
    tc.SIMULATOR.DEPTH_SENSOR.WIDTH = tc.SIMULATOR.DEPTH_SENSOR.HEIGHT = DEPTH
    # LangNav paths are 4-12 m; the task default 3.0 m success radius would
    # make success trivial, so tighten every distance-threshold measure
    for node in (tc.TASK, tc.TASK.SUCCESS, tc.TASK.SPL, tc.TASK.NDTW,
                 tc.TASK.SDTW, tc.TASK.ORACLE_SUCCESS, tc.TASK.ORACLE_SPL):
        node.SUCCESS_DISTANCE = 1.0
    tc.TASK.VLN_ORACLE_ACTION_SENSOR.GOAL_RADIUS = 1.0
    tc.SEED = SEED

    d = cfg.DAGGER
    d.UPDATE_SIZE = N_TRAIN
    d.EPOCHS = EPOCHS
    d.BATCH_SIZE = BATCH
    d.EPISODE_LEN_BUCKETS = [100, 200, 300, 400, 500]
    d.PRELOAD_LMDB_FEATURES = True  # collection is an explicit study stage
    d.PRELOAD_TRUNK_FEATURES = FEATURE_MODE
    d.LMDB_FEATURES_DIR = os.path.join(OUT, "buffer")
    # no per-epoch val pass: the closed-loop eval curve is the study's
    # signal, and val would double the leaked per-epoch transfer volume
    d.LMDB_EVAL_DIR = os.path.join(OUT, "no_val_buffer")
    # bounded-lifetime training processes (transfer-leak workaround)
    d.RESUME = True
    d.MAX_EPOCHS_PER_RUN = EPOCHS_PER_PROC
    # short CyclicLR ramp: the paper's 1000-step ramp would keep the high
    # level at ~base_lr for this study's entire step budget
    steps_per_epoch = max(N_TRAIN // BATCH, 1)
    d.CYCLIC_BASE_LR = 1e-5
    d.CYCLIC_MAX_LR = 1e-4
    d.CYCLIC_STEP_SIZE_UP = 2 * steps_per_epoch
    d.CYCLIC_STEP_SIZE_DOWN = max((EPOCHS - 2) * steps_per_epoch, 1)

    d.COLLECT_ACTION_NOISE = NOISE  # DART-style recovery collection
    d.MAX_INSTRUCTION_LEN = INSTR_LEN
    cfg.TPU.VALID_MASK_VELOCITY_MSE = VALID_MSE
    if DAGGER_P < 1.0:
        # true-DAgger arm: collection happens INSIDE train(), one mixed
        # rollout pass per iteration (envs/dagger.py); same TOTAL epoch
        # budget as the BC arms (EPOCHS split across iterations)
        d.PRELOAD_LMDB_FEATURES = False
        d.P = DAGGER_P
        d.ITERATIONS = DAGGER_ITERS
        d.EPOCHS = max(EPOCHS // DAGGER_ITERS, 1)
        d.UPDATE_SIZE = N_TRAIN  # per iteration; buffer aggregates
    if SIMPLE_CNNS:
        cfg.MODEL.DEPTH_ENCODER.cnn_type = "SimpleDepthCNN"
        cfg.MODEL.RGB_ENCODER.cnn_type = "SimpleRGBCNN"
    if TRAIN_BERT:
        cfg.MODEL.BERT.trainable = True  # PARITY.md deviation (see knob doc)
    if BERT_LAYERS > 0:
        cfg.MODEL.BERT.num_layers = BERT_LAYERS
    if BERT_HIDDEN > 0:
        cfg.MODEL.BERT.hidden_size = BERT_HIDDEN
        cfg.MODEL.BERT.num_heads = max(BERT_HIDDEN // 64, 1)
        cfg.MODEL.BERT.intermediate_size = 4 * BERT_HIDDEN
        cfg.MODEL.VISUAL_LING_ATTN.ins_in_features = BERT_HIDDEN
    cfg.TPU.SYNC_FROZEN_TRUNKS_ON_INIT = True  # random-init trunks (no files)
    cfg.CHECKPOINT_FOLDER = os.path.join(OUT, "ckpts")
    cfg.TENSORBOARD_DIR = os.path.join(OUT, "tb")
    cfg.EVAL.VAL_LOG_DIR = os.path.join(OUT, "val")
    cfg.EVAL.USE_CKPT_CONFIG = False  # the study config stays authoritative
    cfg.EVAL.EPISODE_COUNT = N_VAL
    cfg.EVAL.ON_DEVICE = ON_DEVICE
    cfg.EVAL.NUM_ENVS = NUM_ENVS
    cfg.freeze()
    return cfg


def data_dir():
    return os.path.join(OUT, "datasets")


def ckpt_names():
    folder = os.path.join(OUT, "ckpts")
    if not os.path.isdir(folder):
        return []
    out = []
    for name in os.listdir(folder):
        if name.startswith("ckpt."):
            try:
                out.append((int(name.split(".")[1]), name))
            except ValueError:
                continue
    return [n for _, n in sorted(out)]


def pick_checkpoints(names):
    """Every EVAL_EVERY-th checkpoint, anchored at the first and last."""
    picked = names[EVAL_EVERY - 1::EVAL_EVERY]
    if names and (not picked or picked[0] != names[0]):
        picked.insert(0, names[0])
    if names and picked[-1] != names[-1]:
        picked.append(names[-1])
    return picked


def idx_of(ckpt_name: str) -> int:
    """Training epoch (0-based) encoded in 'ckpt.{EPOCHS_PER_ITER+epoch}'."""
    try:
        return int(ckpt_name.split(".")[-1]) - EPOCHS_PER_ITER
    except ValueError:
        return -1


# ---------------------------------------------------------------------------
# stage workers (subprocesses; the only code paths that import jax)
# ---------------------------------------------------------------------------

def stage_collect():
    from robo_vln_tpu.data.trajectory_store import TrajectoryStore
    from robo_vln_tpu.envs.collection import collect_dataset

    cfg = build_config(data_dir())
    buf_dir = cfg.DAGGER.LMDB_FEATURES_DIR
    have = 0
    if os.path.isdir(buf_dir):
        with TrajectoryStore(buf_dir) as s:
            have = len(s)
    if have >= N_TRAIN:  # restartability: collection appends, never redo it
        print(f"[collect] reusing existing buffer ({have} episodes)",
              flush=True)
        return
    t0 = time.time()
    n = collect_dataset(cfg, buf_dir)
    print(f"[collect] {n} episodes in {time.time() - t0:.1f}s", flush=True)


def trainer_class():
    if MODELS[MODEL][1] == "hier":
        from robo_vln_tpu.training.hierarchical_trainer import (
            HierarchicalTrainer,
        )
        return HierarchicalTrainer
    from robo_vln_tpu.training.trainer import RoboVLNTrainer
    return RoboVLNTrainer


def stage_train():
    cfg = build_config(data_dir())
    trainer_class()(cfg).train()


def stage_eval():
    split = os.environ["CS_SPLIT"]
    shuffled = bool(int(os.environ.get("CS_SHUFFLE", "0")))
    # CS_HOST=1: cross-check the final checkpoint on the float64 HOST driver
    # (EVAL.ON_DEVICE=0) — bounds the on-device float32-sim caveat with a
    # committed side-by-side row instead of a disclaimer
    host_check = bool(int(os.environ.get("CS_HOST", "0")))
    cfg = build_config(data_dir())
    if MODELS[MODEL][1] == "hier":
        from robo_vln_tpu.eval.evaluator import (
            eval_hierarchical_checkpoint as eval_fn,
        )
    else:
        from robo_vln_tpu.eval.evaluator import eval_flat_checkpoint as eval_fn
    from robo_vln_tpu.utils.logging import MetricsWriter

    # the grounding control rides the same eval machinery: same split, same
    # metrics, EVAL.SHUFFLE_INSTRUCTIONS=True (each episode gets another
    # episode's instruction) — recorded under its own row label so the
    # committed table shows grounded-vs-control side by side
    row_split = f"{split}_shuffled" if shuffled else split
    if host_check:
        row_split += "_host"
    # CS_ROWS_TAG: write rows/traces under a fresh label (fresh done-set) —
    # used by re-power and parity passes over already-evaluated checkpoints
    tag = os.environ.get("CS_ROWS_TAG", "")
    if tag:
        row_split += f"_{tag}"
    rows_path = os.path.join(OUT, f"convergence_{row_split}.jsonl")
    done = set()
    if os.path.exists(rows_path):
        with open(rows_path) as f:
            done = {json.loads(l)["ckpt"] for l in f if l.strip()}

    ecfg = cfg.clone().defrost()
    ecfg.EVAL.SPLIT = split
    ecfg.EVAL.SHUFFLE_INSTRUCTIONS = shuffled
    # per-episode traces -> tb_eval/<row_split>/trajectories.jsonl (cheap:
    # <=500x3 floats/episode) — feeds scripts/eval_parity.py's device-vs-host
    # divergence bound without re-running anything
    ecfg.EVAL.DUMP_TRAJECTORIES = True
    if host_check:
        ecfg.EVAL.ON_DEVICE = False
        # parity subset: first HOST_EPISODES episodes, compared per-episode
        # against the on-device row's tb_eval metrics.jsonl for the same ids
        ecfg.EVAL.EPISODE_COUNT = min(HOST_EPISODES, N_VAL)
    ecfg.freeze()
    trainer = trainer_class()(ecfg)
    picked = pick_checkpoints(ckpt_names())
    only = os.environ.get("CS_ONLY_CKPT", "")
    if only:  # a single named checkpoint (e.g. the best one, parity pass)
        picked = [only]
    elif host_check and picked:
        picked = picked[-1:]  # final checkpoint only: a parity row, not a curve
    with open(rows_path, "a") as rf:
        for idx, name in enumerate(picked):
            if name in done:
                continue
            t0 = time.time()
            with MetricsWriter(os.path.join(OUT, "tb_eval", row_split)) as w:
                stats = eval_fn(
                    trainer, os.path.join(OUT, "ckpts", name), w, idx
                )
            row = {
                "model": MODEL,
                "split": row_split,
                "ckpt": name,
                "epoch": idx_of(name),
                "episodes": ecfg.EVAL.EPISODE_COUNT,
                **{k: round(float(v), 4) for k, v in stats.items()
                   if isinstance(v, (int, float))},
                "eval_seconds": round(time.time() - t0, 1),
            }
            rf.write(json.dumps(row) + "\n")
            rf.flush()
            print(f"[eval] {row}", flush=True)


def stage_nonlearning():
    """Reference point for the grounding control: the RandomAgent baseline on
    the SAME split/thresholds.  A grounded policy's shuffled-instruction
    metrics should collapse toward this row (reference
    nonlearning_agents.py:150-165)."""
    split = os.environ.get("CS_SPLIT", "val_unseen")
    cfg = build_config(data_dir()).clone().defrost()
    cfg.EVAL.SPLIT = split
    cfg.EVAL.EVAL_NONLEARNING = True
    cfg.EVAL.NONLEARNING.AGENT = os.environ.get("CS_AGENT", "RandomAgent")
    cfg.TASK_CONFIG.DATASET.SPLIT = split
    cfg.freeze()
    from robo_vln_tpu.agents.nonlearning import evaluate_agent

    stats = evaluate_agent(cfg)
    row = {
        "model": f"nonlearning_{cfg.EVAL.NONLEARNING.AGENT}",
        "split": split,
        "ckpt": "-",
        "epoch": -1,
        **{k: round(float(v), 4) for k, v in stats.items()
           if isinstance(v, (int, float))},
    }
    with open(os.path.join(OUT, "convergence_nonlearning.jsonl"), "a") as f:
        f.write(json.dumps(row) + "\n")
    print(f"[nonlearning] {row}", flush=True)


# ---------------------------------------------------------------------------
# orchestrator (jax-free: one TPU client at a time)
# ---------------------------------------------------------------------------

def _machine_cache_dir() -> str:
    """Per-machine persistent-cache dir.  XLA:CPU cache entries are AOT
    compiled for the build host's exact CPU features; loading them on a
    different machine (rounds migrate hosts) warns about SIGILL and killed
    the round-4 host-check stage.  Keying the dir on the CPU flags makes a
    stale cross-host cache impossible."""
    import hashlib
    import platform

    try:
        with open("/proc/cpuinfo") as f:
            flags = next(l for l in f if l.startswith("flags"))
    except (OSError, StopIteration):
        flags = platform.processor()
    tag = hashlib.sha1(flags.encode()).hexdigest()[:10]
    return os.path.join(REPO, ".jax_cache", tag)


def run_stage(stage: str, **extra_env) -> None:
    env = {
        **os.environ,
        "CS_STAGE": stage,
        # persistent XLA cache: recycled stage processes re-init the policy
        # on the host CPU (training/trainer.py) — cache those compiles once
        "JAX_COMPILATION_CACHE_DIR": _machine_cache_dir(),
        "JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS": "0.5",
        "JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES": "-1",
        **extra_env,
    }
    cmd = [sys.executable, os.path.abspath(__file__), OUT]
    print(f"[stage {stage}] {extra_env or ''}", flush=True)
    proc = subprocess.run(cmd, env=env, cwd=REPO)
    if proc.returncode != 0:
        raise SystemExit(f"stage {stage} failed rc={proc.returncode}")


def orchestrate():
    os.makedirs(OUT, exist_ok=True)
    from robo_vln_tpu.data import langnav  # numpy-only

    langnav.generate_splits(
        data_dir(), n_train=N_TRAIN, n_val_unseen=N_VAL, n_val_seen=N_VAL,
        seed=SEED, n_segments=SEGMENTS, lengths=LENGTHS,
    )
    print(f"[data] {N_TRAIN} train / {N_VAL} val_seen / {N_VAL} val_unseen "
          f"LangNav episodes -> {data_dir()}", flush=True)

    if DAGGER_P >= 1.0:
        run_stage("collect")
    # else: the DAgger arm collects INSIDE train() (iteration 0 is the pure
    # expert pass, beta = P**0 = 1; later iterations mix the live policy)

    # bounded-lifetime training processes until all epochs are checkpointed
    t0 = time.time()
    while len(ckpt_names()) < TOTAL_EPOCHS:
        before = len(ckpt_names())
        run_stage("train")
        if len(ckpt_names()) <= before:
            raise SystemExit(
                f"train stage made no progress ({before} checkpoints)"
            )
        print(f"[train] {len(ckpt_names())}/{TOTAL_EPOCHS} epochs "
              f"({time.time() - t0:.0f}s elapsed)", flush=True)

    for split in ("val_seen", "val_unseen"):
        run_stage("eval", CS_SPLIT=split)
    # language-grounding control: val_unseen with rotated instructions —
    # grounded policies must collapse toward the nonlearning baseline here
    run_stage("eval", CS_SPLIT="val_unseen", CS_SHUFFLE="1")
    if ON_DEVICE:
        # float64 host-driver cross-check of the final checkpoint (the main
        # curve rides the fused on-device evaluator).  Forced onto the CPU
        # backend: the tunneled TPU client leaks every per-step transfer
        # buffer (~2 GB/min, OOMed the round-4 take-2 chain), and the host
        # row's per-step python loop is exactly that path.
        run_stage("eval", CS_SPLIT="val_unseen", CS_HOST="1",
                  JAX_PLATFORMS="cpu")
    # random-agent reference row for the grounding control (no policy
    # forward: keep these off the tunnel too)
    run_stage("nonlearning", CS_SPLIT="val_unseen", JAX_PLATFORMS="cpu")
    # expert upper-bound row: the data-generating policy through the same
    # closed-loop driver/thresholds — bounds what perfect imitation could score
    run_stage("nonlearning", CS_SPLIT="val_unseen", CS_AGENT="ExpertAgent",
              JAX_PLATFORMS="cpu")

    rows = []
    for split in ("val_seen", "val_unseen", "val_unseen_shuffled",
                  "val_unseen_host", "nonlearning"):
        path = os.path.join(OUT, f"convergence_{split}.jsonl")
        if not os.path.exists(path):
            continue
        with open(path) as f:
            rows += [json.loads(l) for l in f if l.strip()]
    with open(os.path.join(OUT, "convergence.jsonl"), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    table = render_table(rows)
    with open(os.path.join(OUT, "convergence.md"), "w") as f:
        f.write(table)
    print(table, flush=True)
    print("CONVERGENCE STUDY OK", flush=True)


def render_table(rows) -> str:
    cols = ["success", "spl", "ndtw", "navigation_error", "path_length"]
    out = ["| model | split | epoch | " + " | ".join(cols) + " |",
           "|---|---|---|" + "---|" * len(cols)]
    for r in sorted(rows, key=lambda r: (r["split"], r["epoch"])):
        out.append(
            f"| {r.get('model', MODEL)} | {r['split']} | {r['epoch']} | "
            + " | ".join(str(r.get(c, "—")) for c in cols) + " |"
        )
    return "\n".join(out) + "\n"


if __name__ == "__main__":
    if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
        # the ambient axon TPU plugin force-appends itself to jax_platforms,
        # so the env var alone does NOT pin CPU (tests/conftest.py) — the
        # take-3 chain's "CPU" host-check stage silently rode the tunnel and
        # leaked ~3 GB/min.  Programmatic pinning before first device use is
        # the only reliable form.
        import jax

        jax.config.update("jax_platforms", "cpu")
    stage = os.environ.get("CS_STAGE")
    if stage == "collect":
        stage_collect()
    elif stage == "train":
        stage_train()
    elif stage == "eval":
        stage_eval()
    elif stage == "nonlearning":
        stage_nonlearning()
    elif stage:
        raise SystemExit(f"unknown CS_STAGE {stage!r}")
    else:
        orchestrate()
