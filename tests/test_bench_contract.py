"""bench.py driver contract: every stdout line is a self-contained JSON
object and the LAST line (what the driver parses) carries the final
best-so-far result — train-step headline (best config of the batch sweep),
forward fallback on partial failure, and MFU/TFLOPs efficiency fields.
Incremental re-emission after every successful measurement is intentional:
it is what makes a mid-run driver timeout lose only the extras, never the
headline (BENCH_r04 rc=124 post-mortem)."""

import json
import sys
from unittest import mock


def _run_main(train_fps, fwd_fps, capsys, monkeypatch, train_b8=None):
    import bench

    monkeypatch.setattr(sys, "argv", ["bench.py"])

    cache = {
        "torch_cpu_fps": 2.0, "torch_cpu_train_fps": 1.0, "torch_threads": 1,
    }

    def fake_sub(which, tries=2, extra_env=None, cpu=False):
        if which == "train":
            b = int((extra_env or {}).get("BENCH_BATCH", 4))
            fps = train_b8 if (b == 8 and train_b8 is not None) else train_fps
            return None if fps is None else {"fps": fps}
        if which.startswith("flops_"):
            return {"flops": 4e12, "flops_per_frame": 1e10,
                    "batch": 4, "t": 50}
        return None if fwd_fps is None else {"fps": fwd_fps}

    with mock.patch.object(bench, "get_torch_baselines", return_value=cache), \
         mock.patch.object(
             bench, "_measure_in_subprocess", side_effect=fake_sub,
         ):
        bench.main()
    out = capsys.readouterr().out.strip().splitlines()
    assert out, "bench must print at least one JSON line"
    # Every emitted line must itself be valid JSON with the scored fields,
    # so a driver that cuts the run short still parses a complete result.
    for line in out:
        partial = json.loads(line)
        assert "value" in partial and "vs_baseline" in partial
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
    # efficiency fields: fps x flops/frame vs chip peak
    assert r["flops_per_frame"] == 1e10
    assert r["tflops"] == 20.0  # 2000 f/s x 1e10 flops / 1e12
    assert abs(r["mfu"] - 20.0 / r["peak_tflops_bf16"]) < 5e-5  # 4-dp rounding
    assert r["batch"] == 4 and r["t"] == 50
    assert r["step_ms"] == 100.0  # 4*50 frames / 2000 f/s


def test_bench_headline_is_best_sweep_config(capsys, monkeypatch):
    r = _run_main(2000.0, 3000.0, capsys, monkeypatch, train_b8=2600.0)
    assert r["value"] == 2600.0 and r["batch"] == 8
    assert r["train_fps_by_batch"] == {"4": 2000.0, "8": 2600.0}
    assert r["tflops"] == 26.0


def test_bench_falls_back_to_forward_headline(capsys, monkeypatch):
    r = _run_main(None, 3000.0, capsys, monkeypatch)
    assert r["metric"] == "HCM teacher-forced policy forward throughput"
    assert isinstance(r["value"], float) and isinstance(r["vs_baseline"], float)
    assert "mfu" not in r


def test_bench_raises_when_both_fail(capsys, monkeypatch):
    import pytest

    with pytest.raises(RuntimeError):
        _run_main(None, None, capsys, monkeypatch)
