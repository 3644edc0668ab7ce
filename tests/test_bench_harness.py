"""Offline tests for the bench orchestration around the COCO-Text eval.

The networked COCO phase runs exactly once, in the driver's bench
environment — these tests pin the recovery behavior that makes that
one shot robust: partial results written mid-run are recovered after a
timeout, stale results are never reported, and a no-results failure is
retried once (downloads are cached, so the retry restarts warm).
"""

import importlib.util
import json
import os
import subprocess
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_RESULTS = {"path": None}  # set per-test by the bench fixture


@pytest.fixture()
def bench(monkeypatch, tmp_path):
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", os.path.join(REPO_ROOT, "bench.py")
    )
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    monkeypatch.setenv("KERAS_OCR_TPU_BENCH_COCO_TIMEOUT_S", "5")
    # Point the eval output at a tmp file so these tests never race with
    # (or destroy) a real bench artifact at the repo root.
    _RESULTS["path"] = str(tmp_path / "coco_text_results.json")
    monkeypatch.setenv("KERAS_OCR_TPU_BENCH_COCO_RESULTS", _RESULTS["path"])
    return module


def _results_path():
    return _RESULTS["path"]


def test_coco_skipped_on_random_weights(bench):
    assert bench.run_coco_eval("random") == {"status": "skipped(random weights)"}


def test_coco_partial_recovered_after_timeout(bench, monkeypatch):
    partial = {
        "partial": True,
        "n_images": 300,
        "precision": 0.55,
        "recall": 0.56,
        "weights": "pretrained",
        "p50_latency_ms": 90.0,
    }

    def fake_run(*args, **kwargs):
        with open(_results_path(), "w", encoding="utf8") as f:
            json.dump(partial, f)
        raise subprocess.TimeoutExpired(cmd="evaluate", timeout=5)

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    out = bench.run_coco_eval("pretrained")
    assert out["status"].startswith("partial(timeout")
    assert out["n_images"] == 300
    assert out["precision"] == 0.55 and out["recall"] == 0.56


def test_coco_stale_results_never_reported(bench, monkeypatch):
    # A results file from a PREVIOUS run must not be mistaken for output
    # of a failed current run.
    with open(_results_path(), "w", encoding="utf8") as f:
        json.dump({"n_images": 1000, "precision": 0.9, "recall": 0.9}, f)

    calls = []

    def fake_run(*args, **kwargs):
        calls.append(1)
        raise subprocess.TimeoutExpired(cmd="evaluate", timeout=5)

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    out = bench.run_coco_eval("pretrained")
    # The retry shares the wall-clock budget (min 300s floor), so the
    # reported timeout is the second attempt's.
    assert out["status"].startswith("timeout(")
    # No results were produced this run, so the eval is retried once.
    assert len(calls) == 2


def test_coco_complete_results_reported_ok(bench, monkeypatch):
    final = {
        "n_images": 1000,
        "precision": 0.55,
        "recall": 0.57,
        "weights": "pretrained",
        "p50_latency_ms": 88.0,
    }

    def fake_run(*args, **kwargs):
        with open(_results_path(), "w", encoding="utf8") as f:
            json.dump(final, f)

        class Proc:
            returncode = 0
            stdout = ""
            stderr = ""

        return Proc()

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    out = bench.run_coco_eval("pretrained")
    assert out["status"] == "ok"
    assert out["n_images"] == 1000 and out["recall"] == 0.57


def test_eval_script_importable_without_install():
    # `python scripts/evaluate_coco_text.py` must bootstrap the repo root
    # onto sys.path itself; the driver bench env has no pip install.
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO_ROOT, "scripts", "evaluate_coco_text.py"),
            "--help",
        ],
        capture_output=True,
        text=True,
        cwd="/",  # definitely not the repo root
        timeout=120,
    )
    assert proc.returncode == 0, proc.stderr
    assert "--progress-every" in proc.stdout
