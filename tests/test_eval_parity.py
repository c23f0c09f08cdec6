"""EVAL.DUMP_TRAJECTORIES traces + scripts/eval_parity.py comparator
(device-vs-host eval-driver divergence bound, VERDICT r4 next #4)."""

import importlib.util
import json
import os

import pytest

from tests.test_envs import make_episode_json
from tests.test_trainers import tiny_config

_SPEC = importlib.util.spec_from_file_location(
    "eval_parity",
    os.path.join(os.path.dirname(__file__), "..", "scripts",
                 "eval_parity.py"),
)
ep = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(ep)


def _traj_rows(path):
    with open(path) as f:
        return [json.loads(l) for l in f if l.strip()]


def _eval_cfg(tmp_path, on_device: bool):
    cfg = tiny_config(tmp_path, batch_size=2)
    cfg.MODEL.DEPTH_ENCODER.cnn_type = "SimpleDepthCNN"
    cfg.MODEL.RGB_ENCODER.cnn_type = "SimpleRGBCNN"
    data_path = make_episode_json(tmp_path, n_eps=3)
    cfg.TASK_CONFIG.SIMULATOR.TYPE = "kinematic"
    cfg.TASK_CONFIG.DATASET.DATA_PATH = data_path
    cfg.TASK_CONFIG.ENVIRONMENT.MAX_EPISODE_STEPS = 12
    cfg.EVAL.SPLIT = "train"
    cfg.EVAL.EPISODE_COUNT = 2
    cfg.EVAL.ON_DEVICE = on_device
    cfg.EVAL.ON_DEVICE_BATCH = 2
    cfg.EVAL.DUMP_TRAJECTORIES = True
    cfg.EVAL.VAL_LOG_DIR = str(tmp_path / "val_logs")
    cfg.freeze()
    return cfg


@pytest.mark.parametrize("on_device", [False, True],
                         ids=["host_driver", "ondevice_driver"])
def test_eval_dumps_trajectories(tmp_path, rng, on_device):
    cfg = _eval_cfg(tmp_path, on_device)
    from robo_vln_tpu.eval.evaluator import eval_flat_checkpoint
    from robo_vln_tpu.training.trainer import RoboVLNTrainer
    from robo_vln_tpu.utils.logging import MetricsWriter

    trainer = RoboVLNTrainer(cfg)
    with MetricsWriter(cfg.TENSORBOARD_DIR) as writer:
        eval_flat_checkpoint(trainer, "", writer, checkpoint_index=0)
    path = os.path.join(cfg.TENSORBOARD_DIR, "trajectories.jsonl")
    rows = _traj_rows(path)
    assert len(rows) == 2
    for r in rows:
        assert r["ckpt_index"] == 0
        # start position + one entry per executed step
        assert len(r["locations"]) == r["steps"]
        assert all(len(p) == 3 for p in r["locations"])
        assert r["success"] in (0.0, 1.0)


def test_compare_and_join(tmp_path):
    dev = {"episode_id": "e1", "success": 1.0,
           "locations": [[0, 0, 0], [0, 0, 1], [0, 0, 2.05]], "ndtw": 0.9}
    host = {"episode_id": "e1", "success": 0.0,
            "locations": [[0, 0, 0], [0, 0, 1.02], [0, 0, 1.9], [0, 0, 2.5]],
            "ndtw": 0.8}
    r = ep.compare(dev, host)
    assert not r["agree"]
    assert r["steps_device"] == 2 and r["steps_host"] == 3
    assert r["max_delta"] == pytest.approx(0.15)
    assert r["first_step_gt_0.1m"] == 2
    # final = last of each trace, even with different lengths
    assert r["final_delta"] == pytest.approx(0.45)


def test_parity_main_end_to_end(tmp_path, capsys, monkeypatch):
    arm = tmp_path / "arm"
    (arm / "ckpts").mkdir(parents=True)
    for e in range(8):
        (arm / "ckpts" / f"ckpt.{8 + e}").mkdir()
    # curve: best at epoch 3 (ckpt.11); picked = [8, 11, 15] (every 4th,
    # anchored first+last)
    with open(arm / "convergence_val_unseen.jsonl", "w") as f:
        for e, s in ((0, 0.1), (3, 0.5), (7, 0.2)):
            f.write(json.dumps({"model": "cma", "split": "val_unseen",
                                "ckpt": f"ckpt.{8 + e}", "epoch": e,
                                "episodes": 48, "success": s}) + "\n")
    dev_dir = arm / "tb_eval" / "val_unseen"
    host_dir = arm / "tb_eval" / "val_unseen_host_parity"
    dev_dir.mkdir(parents=True)
    host_dir.mkdir(parents=True)
    trace = [[0, 0, 0], [0, 0, 1], [0, 0, 2]]
    with open(dev_dir / "trajectories.jsonl", "w") as f:
        for idx in (0, 1, 2):  # all picked checkpoints were evaluated
            for eid in ("a", "b"):
                f.write(json.dumps({
                    "episode_id": eid, "ckpt_index": idx, "success": 1.0,
                    "ndtw": 0.9, "steps": 2, "locations": trace}) + "\n")
    with open(host_dir / "trajectories.jsonl", "w") as f:
        for eid in ("a", "b"):
            f.write(json.dumps({
                "episode_id": eid, "ckpt_index": 0, "success": 1.0,
                "ndtw": 0.9, "steps": 2,
                "locations": [[0, 0, 0], [0, 0, 1.01], [0, 0, 2.0]]})
                + "\n")
    monkeypatch.setattr("sys.argv", ["eval_parity.py", str(arm)])
    ep.main()
    out = capsys.readouterr().out
    assert "ckpt.11" in out  # best checkpoint resolved
    assert "success agreement: **2/2**" in out
    assert "max per-step position delta" in out
