"""Offline tests for the weight-source resolution order.

The bench environment's network failed DNS in rounds 1 and 2, so the
quality north star (golden "eventdock" + COCO P/R with the published
weights) never ran. These tests pin the hardening that fixes that:
an in-repo vendored directory is consulted BEFORE any network use, a
successful download can be persisted into it, and mirror URLs are tried
in order when the canonical GitHub release is unreachable.
"""

import hashlib
import os

import pytest

from keras_ocr_tpu import tools
from keras_ocr_tpu import weights as weights_lib


@pytest.fixture()
def entry(tmp_path, monkeypatch):
    payload = b"fake-weight-bytes"
    config = {
        "url": "https://unreachable.invalid/release/fake_weights.h5",
        "filename": "fake_weights.h5",
        "sha256": hashlib.sha256(payload).hexdigest(),
    }
    monkeypatch.setenv("KERAS_OCR_TPU_VENDORED_WEIGHTS", str(tmp_path / "vendored"))
    monkeypatch.setenv("KERAS_OCR_TPU_CACHE_DIR", str(tmp_path / "cache"))
    monkeypatch.delenv("KERAS_OCR_TPU_WEIGHTS_MIRROR", raising=False)
    return config, payload, tmp_path


def test_vendored_file_wins_without_network(entry):
    config, payload, tmp_path = entry
    vendored_dir = tmp_path / "vendored"
    vendored_dir.mkdir()
    (vendored_dir / config["filename"]).write_bytes(payload)
    path = weights_lib.download_pretrained(config)
    assert path == str(vendored_dir / config["filename"])


def test_corrupt_vendored_file_is_not_trusted(entry, monkeypatch):
    config, payload, tmp_path = entry
    vendored_dir = tmp_path / "vendored"
    vendored_dir.mkdir()
    (vendored_dir / config["filename"]).write_bytes(b"corrupted")

    # With the vendored copy corrupt and every URL failing, the resolver
    # must raise (never silently return the bad file).
    calls = []

    def fake_download(url, filename=None, sha256=None, **kwargs):
        calls.append(url)
        raise OSError("no network")

    monkeypatch.setattr(tools, "download_and_verify", fake_download)
    with pytest.raises(RuntimeError, match="fake_weights.h5"):
        weights_lib.download_pretrained(config)
    # Canonical URL first, then the public mirrors.
    assert calls[0] == config["url"]
    assert len(calls) == 1 + len(weights_lib.WEIGHT_MIRRORS)


def test_mirror_used_when_canonical_fails(entry, monkeypatch):
    config, payload, tmp_path = entry
    cache = tmp_path / "cache"
    cache.mkdir()

    def fake_download(url, filename=None, sha256=None, **kwargs):
        if url == config["url"]:
            raise OSError("DNS failure")
        target = cache / filename
        target.write_bytes(payload)
        return str(target)

    monkeypatch.setattr(tools, "download_and_verify", fake_download)
    path = weights_lib.download_pretrained(config)
    assert path == str(cache / config["filename"])


def test_env_mirror_takes_priority(entry, monkeypatch):
    config, payload, tmp_path = entry
    monkeypatch.setenv("KERAS_OCR_TPU_WEIGHTS_MIRROR", "http://mirror.local/base/")
    seen = []

    def fake_download(url, filename=None, sha256=None, **kwargs):
        seen.append(url)
        raise OSError("down")

    monkeypatch.setattr(tools, "download_and_verify", fake_download)
    with pytest.raises(RuntimeError):
        weights_lib.download_pretrained(config)
    assert seen[0] == "http://mirror.local/base/" + config["filename"]
    assert seen[1] == config["url"]


def test_vendor_weight_file_persists_copy(entry):
    config, payload, tmp_path = entry
    src = tmp_path / "cache"
    src.mkdir()
    source = src / config["filename"]
    source.write_bytes(payload)
    dest = weights_lib.vendor_weight_file(str(source))
    assert dest == os.path.join(str(tmp_path / "vendored"), config["filename"])
    with open(dest, "rb") as f:
        assert f.read() == payload
    # Idempotent: vendoring again (same hash) leaves the file in place.
    assert weights_lib.vendor_weight_file(str(source)) == dest


def test_bench_reports_ok_but_on_complete_file_with_bad_exit(tmp_path, monkeypatch):
    import importlib.util
    import json
    import subprocess

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "bench_ok_but", os.path.join(repo_root, "bench.py")
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    out_path = tmp_path / "coco_text_results.json"
    monkeypatch.setenv("KERAS_OCR_TPU_BENCH_COCO_RESULTS", str(out_path))
    monkeypatch.setenv("KERAS_OCR_TPU_BENCH_COCO_TIMEOUT_S", "5")

    def fake_run(*args, **kwargs):
        # Eval writes its FINAL (non-partial) results, then dies rc=1.
        with open(out_path, "w", encoding="utf8") as f:
            json.dump({"n_images": 1000, "precision": 0.55, "recall": 0.57}, f)

        class Proc:
            returncode = 1
            stdout = ""
            stderr = "teardown crash"

        return Proc()

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    out = bench.run_coco_eval("pretrained")
    # Status must acknowledge both: metrics are complete AND the exit failed.
    assert out["status"].startswith("ok-but-error")
    assert out["precision"] == 0.55


def test_detector_offline_raises_unless_fallback_opted_in(monkeypatch):
    """VERDICT r3 item 7: no silent random weights (detection.py:221-276).

    When the pretrained file is unobtainable the constructor must raise by
    default; ``allow_random_fallback=True`` downgrades that to a warning and
    a randomly initialized model.
    """
    from keras_ocr_tpu.detection import Detector

    def fake_download(config):
        raise RuntimeError("could not obtain " + config["filename"])

    monkeypatch.setattr(weights_lib, "download_pretrained", fake_download)
    with pytest.raises(RuntimeError, match="could not obtain"):
        Detector(max_components=16)
    with pytest.warns(UserWarning, match="RANDOM initialization"):
        detector = Detector(max_components=16, allow_random_fallback=True)
    assert detector.variables is not None


def test_md5_corrupt_cache_retries_same_url(entry, monkeypatch, tmp_path):
    """ADVICE r3: a corrupt cached md5-entry file must trigger one
    re-download from the SAME url (download_and_verify without sha256
    trusts any existing cache file) before falling through to mirrors."""
    payload = b"good-bytes"
    config = {
        "url": "https://unreachable.invalid/release/eff.h5",
        "filename": "eff.h5",
        "md5": hashlib.md5(payload).hexdigest(),
    }
    cache = tmp_path / "md5cache"
    cache.mkdir()
    corrupt = cache / config["filename"]
    corrupt.write_bytes(b"corrupt")
    calls = []

    def fake_download(url, filename=None, sha256=None, **kwargs):
        calls.append(url)
        target = cache / filename
        if not target.is_file():
            target.write_bytes(payload)  # the retry actually downloads
        return str(target)

    monkeypatch.setattr(weights_lib.tools, "download_and_verify", fake_download)
    path = weights_lib.download_pretrained(config)
    assert path == str(corrupt)
    with open(path, "rb") as f:
        assert f.read() == payload
    # Both calls hit the canonical URL; no mirror was consulted.
    assert calls == [config["url"], config["url"]]
