"""Collector merge semantics (VERDICT r4 weak #4 / next #6).

Covers: nonlearning-row dedup across arm dirs, re-powered-row precedence
(most episodes wins within a (arm, model, split, ckpt) group), Wilson
intervals on success columns, best-checkpoint selection, and the loud
failure for an empty arm dir.
"""

import importlib.util
import json
import os

import pytest

_SPEC = importlib.util.spec_from_file_location(
    "collect_study_results",
    os.path.join(os.path.dirname(__file__), "..", "scripts",
                 "collect_study_results.py"),
)
csr = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(csr)


def _write(path, rows):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _arm(tmp_path, name, model, curve, nonlearning=True):
    d = tmp_path / name
    _write(str(d / "convergence_val_unseen.jsonl"), [
        {"model": model, "split": "val_unseen", "ckpt": f"ckpt.{24 + e}",
         "epoch": e, "episodes": 24, "success": s, "spl": s, "ndtw": 0.01}
        for e, s in curve
    ])
    _write(str(d / "convergence_val_unseen_shuffled.jsonl"), [
        {"model": model, "split": "val_unseen_shuffled",
         "ckpt": f"ckpt.{24 + e}", "epoch": e, "episodes": 24,
         "success": 0.1, "spl": 0.1, "ndtw": 0.002}
        for e, _ in curve
    ])
    if nonlearning:
        _write(str(d / "convergence_nonlearning.jsonl"), [
            {"model": "nonlearning_RandomAgent", "split": "val_unseen",
             "ckpt": "-", "epoch": -1, "episodes": 24, "success": 0.04,
             "spl": 0.04, "ndtw": 0.002},
        ])
    return str(d)


def test_nonlearning_rows_deduped_across_arms(tmp_path):
    d1 = _arm(tmp_path, "arm_a", "cma", [(0, 0.1), (3, 0.3)])
    d2 = _arm(tmp_path, "arm_b", "seq2seq", [(0, 0.1), (3, 0.2)])
    rows = csr.load_rows([d1, d2])
    text = csr.summary(rows)
    assert text.count("nonlearning_RandomAgent") == 1


def test_repowered_rows_supersede(tmp_path):
    d = _arm(tmp_path, "arm_a", "cma", [(0, 0.1), (3, 0.29)])
    # a later 48-episode re-eval of the SAME checkpoints under a tag
    _write(os.path.join(d, "convergence_val_unseen_n48.jsonl"), [
        {"model": "cma", "split": "val_unseen_n48", "ckpt": "ckpt.27",
         "epoch": 3, "episodes": 48, "success": 0.25, "spl": 0.25,
         "ndtw": 0.02},
    ])
    rows = csr.load_rows([d])
    at3 = [r for r in rows if r.get("epoch") == 3
           and r["split"] == "val_unseen" and r["model"] == "cma"]
    assert len(at3) == 1
    assert at3[0]["episodes"] == 48 and at3[0]["success"] == 0.25


def test_best_checkpoint_and_wilson(tmp_path):
    d = _arm(tmp_path, "arm_a", "cma",
             [(0, 0.1), (3, 0.29), (7, 0.2), (23, 0.08)])
    rows = csr.load_rows([d])
    b = csr._best(rows, "arm_a", "cma", "val_unseen")
    assert b["epoch"] == 3  # peak, not final — the curves collapse late
    lo, hi = csr.wilson(0.29, 24)
    assert 0.14 < lo < 0.29 < hi < 0.52
    text = csr.summary(rows)
    assert "| arm_a | cma | 3 |" in text  # best-checkpoint row notes epoch
    assert "[" in csr.fmt_rate(b)


def test_rows_without_model_do_not_crash(tmp_path):
    d = _arm(tmp_path, "arm_a", "cma", [(0, 0.1)])
    _write(os.path.join(d, "convergence_val_seen.jsonl"), [
        {"split": "val_seen", "ckpt": "ckpt.24", "epoch": 0,
         "success": 0.5},  # legacy row: no model, no episodes
    ])
    rows = csr.load_rows([d])
    out = csr.summary(rows) + csr.table(rows)
    assert "val_seen" in out


def test_missing_arm_dir_fails_loudly(tmp_path):
    d1 = _arm(tmp_path, "arm_a", "cma", [(0, 0.1)])
    empty = tmp_path / "arm_never_ran"
    empty.mkdir()
    with pytest.raises(SystemExit, match="arm_never_ran"):
        csr.load_rows([d1, str(empty)])


def test_fisher_exact_one_sided():
    # hand-checked 2x2: 15/48 true vs 5/48 shuffled (the ground_cma_r4_n48
    # table) -> one-sided p ~= 0.022; symmetry and degenerate cases
    p = csr.fisher_greater(15, 48, 5, 48)
    assert 0.01 < p < 0.03
    assert csr.fisher_greater(0, 10, 0, 10) == pytest.approx(1.0)
    assert csr.fisher_greater(10, 10, 0, 10) < 1e-4
    # equal arms: P(X >= k) includes the observed table, p > 0.5
    assert csr.fisher_greater(5, 10, 5, 10) > 0.5


def test_grounding_table_carries_fisher_p(tmp_path):
    d = _arm(tmp_path, "arm_a", "cma", [(0, 0.1), (3, 0.625)])
    rows = csr.load_rows([d])
    text = csr.summary(rows)
    assert "Fisher p (one-sided, true>this)" in text
    # shuffled rows are 0.1 over 24 eps (helper); true best is 15/24 vs 2/24
    line = next(l for l in text.splitlines()
                if "shuffled instructions" in l)
    p = float(line.rstrip("|").rsplit("|", 1)[-1].strip())
    assert p == pytest.approx(
        csr.fisher_greater(15, 24, 2, 24), rel=0.01)
    assert p < 0.01
