"""run.py CLI end-to-end: the actual user surface (reference run.py:17-73) —
yaml merge + dot-path overrides + trainer dispatch, driven as a subprocess."""

import json
import os
import subprocess
import sys

import numpy as np

from tests.test_envs import make_episode_json
from tests.test_trainers import fill_buffer


def _run_cli(args, cwd="/root/repo", timeout=600):
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    # share the suite's persistent compile cache (jax honors this env var)
    env["JAX_COMPILATION_CACHE_DIR"] = os.path.join(cwd, ".jax_cache")
    # drop the ambient TPU plugin path: it force-appends its backend even
    # under JAX_PLATFORMS=cpu, and a wedged tunnel then hangs the subprocess
    pp = [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
          if p and "axon" not in p]
    env["PYTHONPATH"] = os.pathsep.join([cwd] + pp)
    return subprocess.run(
        [sys.executable, "run.py"] + args, cwd=cwd, env=env, timeout=timeout,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )


def _tiny_overrides(tmp_path, rng):
    fill_buffer(str(tmp_path / "buf"), rng, n_eps=4)
    fill_buffer(str(tmp_path / "eval_buf"), rng, n_eps=2)
    ov = [
        "DAGGER.BATCH_SIZE", "1",
        "DAGGER.EPOCHS", "1",
        "DAGGER.tbptt_steps", "4",
        "DAGGER.EPISODE_LEN_BUCKETS", "[4, 8]",
        "DAGGER.MAX_INSTRUCTION_LEN", "12",
        "DAGGER.PRELOAD_LMDB_FEATURES", "True",
        "DAGGER.LMDB_FEATURES_DIR", str(tmp_path / "buf"),
        "DAGGER.LMDB_EVAL_DIR", str(tmp_path / "eval_buf"),
        "CHECKPOINT_FOLDER", str(tmp_path / "ckpts"),
        "TENSORBOARD_DIR", str(tmp_path / "tb"),
        "LOG_FILE", str(tmp_path / "train.log"),
        "TASK_CONFIG.SIMULATOR.RGB_SENSOR.WIDTH", "64",
        "TASK_CONFIG.SIMULATOR.RGB_SENSOR.HEIGHT", "64",
        "TASK_CONFIG.SIMULATOR.DEPTH_SENSOR.WIDTH", "64",
        "TASK_CONFIG.SIMULATOR.DEPTH_SENSOR.HEIGHT", "64",
        "MODEL.DEPTH_ENCODER.cnn_type", "SimpleDepthCNN",
        "MODEL.RGB_ENCODER.cnn_type", "SimpleRGBCNN",
        "MODEL.INSTRUCTION_ENCODER.vocab_size", "60",
        "MODEL.INSTRUCTION_ENCODER.use_pretrained_embeddings", "False",
        "MODEL.INSTRUCTION_ENCODER.hidden_size", "16",
        "MODEL.STATE_ENCODER.hidden_size", "32",
    ]
    return ov


def test_cli_train_seq2seq(tmp_path, rng):
    proc = _run_cli(
        ["--run-type", "train",
         "--exp-config", "robo_vln_tpu/config/configs/seq2seq_robo.yaml"]
        + _tiny_overrides(tmp_path, rng)
    )
    assert proc.returncode == 0, proc.stdout[-3000:]
    assert (tmp_path / "train.log").exists()
    metrics = [
        json.loads(l) for l in open(tmp_path / "tb" / "metrics.jsonl")
    ]
    assert any(m["tag"] == "Total Loss" for m in metrics)
    ckpts = os.listdir(tmp_path / "ckpts")
    assert any(c.startswith("ckpt.") for c in ckpts)


def test_cli_rejects_bad_run_type(tmp_path):
    proc = _run_cli(
        ["--run-type", "frobnicate",
         "--exp-config", "robo_vln_tpu/config/configs/seq2seq_robo.yaml"],
        timeout=120,
    )
    assert proc.returncode != 0
    assert "invalid choice" in proc.stdout


def test_cli_missing_config_errors(tmp_path):
    proc = _run_cli(
        ["--run-type", "train", "--exp-config", "no/such/config.yaml"],
        timeout=120,
    )
    assert proc.returncode != 0


def test_cli_eval_and_nonlearning(tmp_path, rng):
    """run.py --run-type eval: checkpoint-folder polling dispatch, and the
    EVAL.EVAL_NONLEARNING branch (reference run.py:62)."""
    data_path = make_episode_json(tmp_path, n_eps=2)
    ov = _tiny_overrides(tmp_path, rng) + [
        "TASK_CONFIG.SIMULATOR.TYPE", "kinematic",
        "TASK_CONFIG.DATASET.DATA_PATH", str(data_path),
        "TASK_CONFIG.ENVIRONMENT.MAX_EPISODE_STEPS", "10",
        "EVAL.SPLIT", "train",
        "EVAL.EPISODE_COUNT", "1",
        "EVAL.VAL_LOG_DIR", str(tmp_path / "val_logs"),
    ]
    # train first so a checkpoint exists for the eval poll
    proc = _run_cli(
        ["--run-type", "train",
         "--exp-config", "robo_vln_tpu/config/configs/seq2seq_robo.yaml"] + ov
    )
    assert proc.returncode == 0, proc.stdout[-2000:]

    proc = _run_cli(
        ["--run-type", "eval",
         "--exp-config", "robo_vln_tpu/config/configs/seq2seq_robo.yaml"]
        + ov + ["EVAL_CKPT_PATH_DIR", str(tmp_path / "ckpts")]
    )
    assert proc.returncode == 0, proc.stdout[-2000:]
    stats = os.path.join(tmp_path, "val_logs", "stats_ckpt_0_train.json")
    assert os.path.exists(stats)
    assert "ndtw" in json.load(open(stats))

    proc = _run_cli(
        ["--run-type", "eval",
         "--exp-config", "robo_vln_tpu/config/configs/nonlearning.yaml"]
        + ov + ["EVAL.EVAL_NONLEARNING", "True", "EVAL.NONLEARNING.AGENT",
                "RandomAgent"]
    )
    assert proc.returncode == 0, proc.stdout[-2000:]
    assert os.path.exists(
        os.path.join(tmp_path, "val_logs", "stats_complete_RandomAgent_train.json")
    )
