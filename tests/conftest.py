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
#
# The directory is keyed by the EFFECTIVE compile configuration — jax
# version, XLA_FLAGS, the axon terminal env (whose remote-compile path
# merges extra flags into compiles), and the host CPU's feature set.
# Reason: XLA:CPU AOT executables embed compile-time machine-feature
# strings; loading an entry written under a different configuration
# usually just logs cpu_aot_loader rejections and recompiles, but has
# been observed to SIGSEGV inside get_executable_and_time when a shared
# directory accumulated entries from differently-configured processes
# (2026-08-20, full-suite run). Distinct configs now get distinct dirs,
# so no process ever deserializes an executable it didn't effectively
# compile.
import hashlib


def _cache_config_key():
    ident = [jax.__version__, os.environ.get("XLA_FLAGS", "")]
    ident.append(os.environ.get("PALLAS_AXON_REMOTE_COMPILE", ""))
    ident.append(os.environ.get("PALLAS_AXON_POOL_IPS", ""))
    try:
        with open("/proc/cpuinfo", encoding="utf8") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    ident.append(" ".join(sorted(line.split(":", 1)[1].split())))
                    break
    except OSError:
        pass
    return hashlib.sha256(" | ".join(ident).encode()).hexdigest()[:10]


_cache_dir = os.environ.get(
    "KERAS_OCR_TPU_TEST_CACHE",
    f"/tmp/keras_ocr_tpu_xla_cache_{_cache_config_key()}",
)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
