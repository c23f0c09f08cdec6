"""bench.py driver contract: ONE JSON line with numeric value/vs_baseline,
train-step headline, forward fallback on partial failure."""

import json
import subprocess
import sys
from unittest import mock


def _run_main(train_fps, fwd_fps, capsys, monkeypatch):
    import bench

    monkeypatch.setattr(sys, "argv", ["bench.py"])

    cache = {
        "torch_cpu_fps": 2.0, "torch_cpu_train_fps": 1.0, "torch_threads": 1,
    }
    with mock.patch.object(bench, "get_torch_baselines", return_value=cache), \
         mock.patch.object(
             bench, "_measure_in_subprocess",
             side_effect=lambda which, tries=2: (
                 train_fps if which == "train" else fwd_fps
             ),
         ):
        bench.main()
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1, "bench must print exactly ONE line"
    return json.loads(out[-1])


def test_bench_json_contract(capsys, monkeypatch):
    r = _run_main(2000.0, 3000.0, capsys, monkeypatch)
    assert r["metric"] == "HCM IL train-step throughput"
    assert r["value"] == 2000.0 and r["vs_baseline"] == 2000.0
    assert r["unit"] == "frames/sec/chip"
    assert r["forward_fps"] == 3000.0 and r["forward_vs_baseline"] == 1500.0
    # feature-store train mode rides along as an extra field (the mock's
    # side_effect returns fwd_fps for any non-"train" measurement)
    assert r["feature_train_fps"] == 3000.0


def test_bench_falls_back_to_forward_headline(capsys, monkeypatch):
    r = _run_main(None, 3000.0, capsys, monkeypatch)
    assert r["metric"] == "HCM teacher-forced policy forward throughput"
    assert isinstance(r["value"], float) and isinstance(r["vs_baseline"], float)


def test_bench_raises_when_both_fail(capsys, monkeypatch):
    import pytest

    with pytest.raises(RuntimeError):
        _run_main(None, None, capsys, monkeypatch)
