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

# Persistent compilation cache: OPT-IN ONLY (set KERAS_OCR_TPU_TEST_CACHE
# to a directory to enable). Two full-suite runs on 2026-08-20 SIGSEGV'd
# deterministically inside jax's compilation_cache.get_executable_and_time
# while deserializing an XLA:CPU AOT entry the same suite had written
# minutes earlier — a jaxlib reload bug this code cannot fix, and keying
# the directory by compile configuration did not help (the second crash
# used a directory written exclusively by its own identically-configured
# run). The cache also buys little on this jaxlib: most CPU AOT entries
# are rejected on reload anyway ("+prefer-no-gather ... doesn't match")
# and recompile. Correctness over warm-cache minutes: default OFF.
_cache_dir = os.environ.get("KERAS_OCR_TPU_TEST_CACHE", "")
if _cache_dir:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
# Ensure subprocess-based tests (graft dryrun) also skip any stale
# ambient cache unless the opt-in is set.
os.environ.setdefault("KERAS_OCR_TPU_COMPILE_CACHE", _cache_dir)
