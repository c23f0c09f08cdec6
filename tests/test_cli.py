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


def _hcm_pth_setup(tmp_path):
    """Reference-layout HCM .pth + the override list whose model dims match
    the torch mirrors (tests/test_checkpoint_convert.py constants); sensor
    sizes match their expected inputs (rgb 128, depth 64)."""
    import torch

    from tests.test_checkpoint_convert import TorchHighLevelCMA, TorchLowLevel
    from tests.test_envs import make_episode_json

    torch.manual_seed(0)
    ckpt = {
        "high_level_state_dict": TorchHighLevelCMA().state_dict(),
        "low_level_state_dict": TorchLowLevel().state_dict(),
        # exercises the USE_CKPT_CONFIG .pth branch (restorable stanzas only)
        "config": {"DAGGER": {"tbptt_steps": 50}},
    }
    pth = tmp_path / "HCM_Agent.pth"
    torch.save(ckpt, str(pth))
    data_path = make_episode_json(tmp_path, n_eps=2)
    ov = [
        "DAGGER.MAX_INSTRUCTION_LEN", "12",
        "DAGGER.BATCH_SIZE", "1",
        "TENSORBOARD_DIR", str(tmp_path / "tb"),
        "CHECKPOINT_FOLDER", str(tmp_path / "ckpts"),
        "LOG_FILE", str(tmp_path / "eval.log"),
        "MODEL.DEPTH_ENCODER.blocks", "[1, 1, 1, 1]",
        "MODEL.RGB_ENCODER.blocks", "[1, 1, 1, 1]",
        "MODEL.DEPTH_ENCODER.output_size", "8",
        "MODEL.RGB_ENCODER.output_size", "16",
        "MODEL.STATE_ENCODER.hidden_size", "32",
        "MODEL.BERT.vocab_size", "60",
        "MODEL.BERT.hidden_size", "32",
        "MODEL.BERT.num_layers", "2",
        "MODEL.BERT.num_heads", "2",
        "MODEL.BERT.intermediate_size", "64",
        "MODEL.BERT.max_position_embeddings", "40",
        "MODEL.VISUAL_LING_ATTN.d_model", "16",
        "MODEL.VISUAL_LING_ATTN.h", "2",
        "MODEL.VISUAL_LING_ATTN.d_ff", "32",
        "MODEL.VISUAL_LING_ATTN.vis_in_features", "16",
        "MODEL.VISUAL_LING_ATTN.ins_in_features", "32",
        "MODEL.VISUAL_LING_ATTN.N", "1",
        "TASK_CONFIG.SIMULATOR.RGB_SENSOR.WIDTH", "128",
        "TASK_CONFIG.SIMULATOR.RGB_SENSOR.HEIGHT", "128",
        "TASK_CONFIG.SIMULATOR.DEPTH_SENSOR.WIDTH", "64",
        "TASK_CONFIG.SIMULATOR.DEPTH_SENSOR.HEIGHT", "64",
        "TASK_CONFIG.SIMULATOR.TYPE", "kinematic",
        "TASK_CONFIG.DATASET.DATA_PATH", str(data_path),
        "TASK_CONFIG.ENVIRONMENT.MAX_EPISODE_STEPS", "8",
        "EVAL.SPLIT", "train",
        "EVAL.EPISODE_COUNT", "1",
        "EVAL.VAL_LOG_DIR", str(tmp_path / "val_logs"),
    ]
    return pth, ov


def test_cli_eval_reference_pth_checkpoint(tmp_path, rng):
    """The flagship user path (VERDICT r2 #1): a reference-layout torch .pth
    (the published HCM_Agent.pth format, reference README.md:251-255,
    hierarchical_trainer.py:996-1006) evaluated closed-loop with ONE command —
    run.py --run-type eval EVAL_CKPT_PATH_DIR <file>.pth."""
    pth, ov = _hcm_pth_setup(tmp_path)
    proc = _run_cli(
        ["--run-type", "eval",
         "--exp-config", "robo_vln_tpu/config/configs/hierarchical_cma.yaml"]
        + ov + ["EVAL_CKPT_PATH_DIR", str(pth)]
    )
    assert proc.returncode == 0, proc.stdout[-4000:]
    assert "converted hierarchical torch checkpoint" in proc.stdout
    stats_path = os.path.join(tmp_path, "val_logs", "stats_ckpt_0_train.json")
    assert os.path.exists(stats_path)
    stats = json.load(open(stats_path))
    assert "ndtw" in stats and "actual_success" in stats
    # provenance: every trunk came from the .pth, none is random
    prov = stats["pretrained_backbones"]
    assert prov["bert"]["status"] == "checkpoint"
    assert prov["ddppo_depth"]["status"] == "checkpoint"
    assert prov["imagenet_rgb"]["status"] == "checkpoint"


def test_cli_convert_ckpt_script(tmp_path, rng):
    """scripts/convert_ckpt.py: one-time .pth -> orbax conversion, then eval
    of the converted directory (BN stats restored from the sidecar, not from
    weight files)."""
    pth, ov = _hcm_pth_setup(tmp_path)
    out = str(tmp_path / "converted")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env["JAX_COMPILATION_CACHE_DIR"] = "/root/repo/.jax_cache"
    pp = [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
          if p and "axon" not in p]
    env["PYTHONPATH"] = os.pathsep.join(["/root/repo"] + pp)
    proc = subprocess.run(
        [sys.executable, "scripts/convert_ckpt.py",
         "--exp-config", "robo_vln_tpu/config/configs/hierarchical_cma.yaml",
         "--pth", str(pth), "--out", out] + ov,
        cwd="/root/repo", env=env, timeout=600,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    assert proc.returncode == 0, proc.stdout[-4000:]
    assert os.path.exists(os.path.join(out, "framework_metadata.json"))
    assert os.path.exists(os.path.join(out, "extra_variables.npz"))

    proc = _run_cli(
        ["--run-type", "eval",
         "--exp-config", "robo_vln_tpu/config/configs/hierarchical_cma.yaml"]
        + ov + ["EVAL_CKPT_PATH_DIR", out]
    )
    assert proc.returncode == 0, proc.stdout[-4000:]
    stats = json.load(
        open(os.path.join(tmp_path, "val_logs", "stats_ckpt_0_train.json"))
    )
    assert "ndtw" in stats


def test_cli_real_data_formats_runbook(tmp_path, rng):
    """docs/RUNBOOK.md readiness (VERDICT r2 #5): format-identical
    micro-fixtures for EVERY real-data artifact — episodes
    {split}/{split}.json.gz, GT {split}/{split}_gt.json.gz, GloVe
    embeddings.json.gz, DDPPO/torchvision weight files (.npz key layouts
    identical to the torch exports, reduced stage depths) — drive
    run.py collect->train then eval with no code edits."""
    import gzip

    import torch

    from tests.test_encoders import GNResNetEncoderT, TVResNetT
    from tests.test_envs import make_episode_json

    # 1. episodes at the real directory layout data/datasets/robo_vln_v1/
    #    {split}/{split}.json.gz (reference robo_vln_task.yaml:49)
    split_dir = tmp_path / "datasets" / "train"
    split_dir.mkdir(parents=True)
    made = make_episode_json(tmp_path, n_eps=2)
    os.replace(made, split_dir / "train.json.gz")
    data_tpl = str(tmp_path / "datasets" / "{split}" / "{split}.json.gz")

    # 2. ground-truth locations (reference measures.py:299-310 layout)
    gt = {
        str(i): {"locations": [[0.0, 0.0, 0.0], [0.0, 0.0, -2.0],
                               [2.0, 0.0, -4.0 - i]]}
        for i in range(2)
    }
    with gzip.open(split_dir / "train_gt.json.gz", "wt") as f:
        json.dump(gt, f)
    gt_tpl = str(tmp_path / "datasets" / "{split}" / "{split}_gt.json.gz")

    # 3. GloVe embeddings.json.gz: json list of vectors (reference
    #    instruction_encoder.py:66-67)
    emb = rng.standard_normal((60, 8)).tolist()
    with gzip.open(tmp_path / "embeddings.json.gz", "wt") as f:
        json.dump(emb, f)

    # 4. frozen-trunk weight files in the documented formats
    torch.manual_seed(0)
    depth_sd = GNResNetEncoderT(
        in_ch=1, spatial=256, blocks=(1, 1, 1, 1)
    ).state_dict()
    np.savez(tmp_path / "ddppo.npz",
             **{k: v.numpy() for k, v in depth_sd.items()})
    rgb_sd = TVResNetT(blocks=(1, 1, 1, 1)).state_dict()
    np.savez(tmp_path / "resnet50.npz",
             **{k: v.numpy() for k, v in rgb_sd.items()})

    ov = [
        "DAGGER.BATCH_SIZE", "1",
        "DAGGER.EPOCHS", "1",
        "DAGGER.UPDATE_SIZE", "2",
        "DAGGER.PRELOAD_LMDB_FEATURES", "False",
        "DAGGER.tbptt_steps", "4",
        "DAGGER.EPISODE_LEN_BUCKETS", "[4, 8]",
        "DAGGER.MAX_INSTRUCTION_LEN", "12",
        "DAGGER.LMDB_FEATURES_DIR", str(tmp_path / "buf"),
        "DAGGER.LMDB_EVAL_DIR", str(tmp_path / "none"),
        "CHECKPOINT_FOLDER", str(tmp_path / "ckpts"),
        "TENSORBOARD_DIR", str(tmp_path / "tb"),
        "LOG_FILE", str(tmp_path / "train.log"),
        "TASK_CONFIG.SIMULATOR.TYPE", "kinematic",
        "TASK_CONFIG.DATASET.DATA_PATH", data_tpl,
        "TASK_CONFIG.TASK.NDTW.GT_PATH", gt_tpl,
        "TASK_CONFIG.TASK.SDTW.GT_PATH", gt_tpl,
        "TASK_CONFIG.SIMULATOR.RGB_SENSOR.WIDTH", "64",
        "TASK_CONFIG.SIMULATOR.RGB_SENSOR.HEIGHT", "64",
        "TASK_CONFIG.SIMULATOR.DEPTH_SENSOR.WIDTH", "64",
        "TASK_CONFIG.SIMULATOR.DEPTH_SENSOR.HEIGHT", "64",
        "TASK_CONFIG.ENVIRONMENT.MAX_EPISODE_STEPS", "10",
        "MODEL.DEPTH_ENCODER.blocks", "[1, 1, 1, 1]",
        "MODEL.RGB_ENCODER.blocks", "[1, 1, 1, 1]",
        "MODEL.DEPTH_ENCODER.output_size", "8",
        "MODEL.RGB_ENCODER.output_size", "16",
        "MODEL.STATE_ENCODER.hidden_size", "32",
        "MODEL.INSTRUCTION_ENCODER.use_pretrained_embeddings", "True",
        "MODEL.INSTRUCTION_ENCODER.embedding_file",
        str(tmp_path / "embeddings.json.gz"),
        "MODEL.INSTRUCTION_ENCODER.vocab_size", "60",
        "MODEL.INSTRUCTION_ENCODER.embedding_size", "8",
        "MODEL.INSTRUCTION_ENCODER.hidden_size", "16",
        "MODEL.DEPTH_ENCODER.ddppo_checkpoint", str(tmp_path / "ddppo.npz"),
        "MODEL.RGB_ENCODER.pretrained_weights", str(tmp_path / "resnet50.npz"),
        "EVAL.SPLIT", "train",
        "EVAL.EPISODE_COUNT", "1",
        "EVAL.VAL_LOG_DIR", str(tmp_path / "val_logs"),
    ]
    proc = _run_cli(
        ["--run-type", "train",
         "--exp-config", "robo_vln_tpu/config/configs/seq2seq_robo.yaml"] + ov
    )
    assert proc.returncode == 0, proc.stdout[-4000:]
    assert "loaded ddppo_depth weights" in proc.stdout
    assert "loaded imagenet_rgb weights" in proc.stdout

    proc = _run_cli(
        ["--run-type", "eval",
         "--exp-config", "robo_vln_tpu/config/configs/seq2seq_robo.yaml"]
        + ov + ["EVAL_CKPT_PATH_DIR", str(tmp_path / "ckpts")]
    )
    assert proc.returncode == 0, proc.stdout[-4000:]
    stats = json.load(
        open(os.path.join(tmp_path, "val_logs", "stats_ckpt_0_train.json"))
    )
    assert "ndtw" in stats
    prov = stats["pretrained_backbones"]
    assert prov["ddppo_depth"]["status"] == "loaded"
    assert prov["imagenet_rgb"]["status"] == "loaded"
    assert prov["bert"]["status"] == "not_in_model"


def test_cli_featurize_buffer_script(tmp_path, rng):
    """scripts/featurize_buffer.py: pre-builds the feature cache; a second
    run is a fingerprint-keyed no-op."""
    from tests.test_trainers import fill_buffer

    fill_buffer(str(tmp_path / "buf"), rng, n_eps=2, hw=32)
    ov = [
        "DAGGER.BATCH_SIZE", "1",
        "DAGGER.LMDB_FEATURES_DIR", str(tmp_path / "buf"),
        "DAGGER.MAX_INSTRUCTION_LEN", "12",
        "TASK_CONFIG.SIMULATOR.RGB_SENSOR.WIDTH", "32",
        "TASK_CONFIG.SIMULATOR.RGB_SENSOR.HEIGHT", "32",
        "TASK_CONFIG.SIMULATOR.DEPTH_SENSOR.WIDTH", "32",
        "TASK_CONFIG.SIMULATOR.DEPTH_SENSOR.HEIGHT", "32",
        "MODEL.DEPTH_ENCODER.blocks", "[1, 1, 1, 1]",
        "MODEL.RGB_ENCODER.blocks", "[1, 1, 1, 1]",
        "MODEL.DEPTH_ENCODER.output_size", "8",
        "MODEL.RGB_ENCODER.output_size", "16",
        "MODEL.STATE_ENCODER.hidden_size", "32",
        "MODEL.INSTRUCTION_ENCODER.vocab_size", "60",
        "MODEL.INSTRUCTION_ENCODER.use_pretrained_embeddings", "False",
        "MODEL.INSTRUCTION_ENCODER.hidden_size", "16",
        "LOG_FILE", str(tmp_path / "feat.log"),
    ]
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env["JAX_COMPILATION_CACHE_DIR"] = "/root/repo/.jax_cache"
    pp = [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
          if p and "axon" not in p]
    env["PYTHONPATH"] = os.pathsep.join(["/root/repo"] + pp)

    def run():
        return subprocess.run(
            [sys.executable, "scripts/featurize_buffer.py",
             "--exp-config", "robo_vln_tpu/config/configs/seq2seq_robo.yaml"]
            + ov,
            cwd="/root/repo", env=env, timeout=600,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )

    proc = run()
    assert proc.returncode == 0, proc.stdout[-3000:]
    assert os.path.exists(tmp_path / "buf.features" / "featurize_meta.json")
    proc2 = run()
    assert proc2.returncode == 0
    assert "reusing featurized buffer" in proc2.stdout


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
