"""Tests for config and profiling utilities."""


import jax.numpy as jnp

from keras_ocr_tpu import config
from keras_ocr_tpu.utils import StageTimer


def test_runtime_config_defaults_and_replace():
    cfg = config.get_config()
    assert cfg.max_components > 0
    new = cfg.replace(max_words=128)
    assert new.max_words == 128
    assert cfg is not new


def test_configure_reports_boolean():
    assert config.configure() in (True, False)


def test_stage_timer():
    timer = StageTimer()
    with timer.stage("detect"):
        _ = StageTimer.block(jnp.ones((4, 4)) * 2)
    with timer.stage("detect"):
        pass
    with timer.stage("recognize"):
        pass
    summary = timer.summary()
    assert summary["detect"]["count"] == 2
    assert summary["recognize"]["count"] == 1
    assert "detect" in timer.report()
