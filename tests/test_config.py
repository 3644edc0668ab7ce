"""Runtime-config behavior: compile-cache pathing and dtype policy."""

import jax
import pytest

from keras_ocr_tpu import config


@pytest.fixture
def clear_jax_cache_config():
    """Temporarily unset jax's compilation-cache dir (conftest pins one)."""
    previous = jax.config.jax_compilation_cache_dir
    jax.config.update("jax_compilation_cache_dir", None)
    try:
        yield
    finally:
        jax.config.update("jax_compilation_cache_dir", previous)


def test_host_fingerprint_is_stable_and_short():
    a, b = config._host_fingerprint(), config._host_fingerprint()
    assert a == b
    assert len(a) == 12
    int(a, 16)  # hex


def test_default_cache_dir_is_host_keyed(clear_jax_cache_config, monkeypatch):
    monkeypatch.delenv("KERAS_OCR_TPU_COMPILE_CACHE", raising=False)
    directory = config.enable_compile_cache()
    # Host-keyed default: a cache written on another machine (different
    # CPU feature set) must never be loaded here — XLA:CPU AOT artifacts
    # are only valid on the machine that compiled them.
    assert directory.endswith(f"xla_cache_{config._host_fingerprint()}")
    assert jax.config.jax_compilation_cache_dir == directory


def test_cache_env_opt_out(clear_jax_cache_config, monkeypatch):
    monkeypatch.setenv("KERAS_OCR_TPU_COMPILE_CACHE", "")
    assert config.enable_compile_cache() == ""
    assert not jax.config.jax_compilation_cache_dir


def test_cache_env_override(clear_jax_cache_config, monkeypatch):
    monkeypatch.setenv("KERAS_OCR_TPU_COMPILE_CACHE", "/tmp/kot-cache-test")
    assert config.enable_compile_cache() == "/tmp/kot-cache-test"


def test_existing_configuration_wins(clear_jax_cache_config):
    jax.config.update("jax_compilation_cache_dir", "/tmp/user-set-cache")
    assert config.enable_compile_cache() == "/tmp/user-set-cache"


def test_explicit_directory_argument(clear_jax_cache_config):
    assert config.enable_compile_cache("/tmp/explicit") == "/tmp/explicit"
