"""The committed hermetic golden artifact still reads its scenes.

The artifact (tests/fixtures/golden_offline/, built on a TPU by
scripts/make_golden_artifact.py and verified at creation) is the
framework's zero-network analog of the reference's pretrained golden
test ("eventdock", reference tests/test_pipeline.py:19-20): slim
offline-trained checkpoints + fixture scenes + the words the trained
pipeline verifiably reads. bench.py runs the same check on the real chip
every round; this test runs it on CPU so the nightly suite catches any
regression in the load/restore/pipeline path that would silently break
the bench's quality signal.
"""

import os

import pytest

pytestmark = pytest.mark.slow  # compiles the slim fused pipeline on CPU

ARTIFACT = os.path.join(os.path.dirname(__file__), "fixtures", "golden_offline")


def test_golden_offline_artifact_reproduces():
    from keras_ocr_tpu.utils import golden

    if not golden.artifact_available(ARTIFACT):
        pytest.skip("golden artifact not built (scripts/make_golden_artifact.py)")
    result = golden.run_golden_check(ARTIFACT)
    assert result["n_scenes"] >= 8
    assert result["n_words"] >= 20
    assert result["pass"], {
        key: value for key, value in result.items() if key != "per_scene"
    }
