"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip hardware is not required for tests: sharding/collective code is
validated on fake CPU devices via ``xla_force_host_platform_device_count``
(the strategy called out in SURVEY.md §4).

Note: this environment ships a sitecustomize that pins the TPU plugin and
overrides the ``JAX_PLATFORMS`` env var, so we must force CPU through
``jax.config`` (and ``JAX_PLATFORM_NAME`` for subprocesses) before any
test touches JAX.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite's cost is dominated by XLA
# recompiling the same pipeline/trainer programs every run. Cache compiled
# executables on disk (keyed by HLO, so code changes still recompile).
# Known rough edge: the CPU AOT loader warns about compile-vs-host machine
# feature strings on load ("prefer-no-gather...") — harmless in normal
# runs; one SIGABRT was observed only under extreme cross-process
# contention. Delete the cache dir if aborts ever repeat in clean runs.
_cache_dir = os.environ.get(
    "KERAS_OCR_TPU_TEST_CACHE", "/tmp/keras_ocr_tpu_xla_cache"
)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
