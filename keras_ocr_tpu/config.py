"""Runtime configuration for the TPU backend.

TPU-native analog of the reference GPU-memory configuration
(reference: /root/reference/keras_ocr/config.py:5-25). Instead of TF memory
growth flags, this controls the JAX/XLA runtime: dtype policy for the
compute path (bfloat16 on the MXU vs float32 for bit-parity), static-shape
bucketing limits used to bound recompilation, and default post-processing
capacities (connected components / words per image) that turn the
reference's dynamic Python loops into fixed-shape XLA programs.

Environment variables:
    KERAS_OCR_TPU_COMPUTE_DTYPE: "bfloat16" (default) or "float32".
    KERAS_OCR_TPU_CACHE_DIR: weight/asset cache dir (default ~/.keras-ocr,
        shared with the reference so cached weights are reused).
    MEMORY_FRACTION: forwarded to XLA_PYTHON_CLIENT_MEM_FRACTION.
"""

from __future__ import annotations

import dataclasses
import os
import typing

import jax
import jax.numpy as jnp


@dataclasses.dataclass
class RuntimeConfig:
    """Global knobs for the compiled OCR graphs.

    Attributes:
        compute_dtype: dtype used inside convolutions / matmuls. bfloat16
            feeds the MXU at full rate; float32 is used by parity tests.
        param_dtype: dtype parameters are stored in.
        max_components: static upper bound on connected components per
            heatmap considered by the on-device ``getBoxes`` equivalent.
        max_words: static upper bound on word boxes (and therefore
            recognizer crops) per image.
        size_buckets: multiple-of used when bucketing padded image sizes so
            jit recompilation count stays bounded.
    """

    compute_dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32
    max_components: int = 256
    max_words: int = 256
    size_buckets: int = 256

    def replace(self, **kwargs) -> "RuntimeConfig":
        return dataclasses.replace(self, **kwargs)


def _default_config() -> RuntimeConfig:
    dtype_name = os.environ.get("KERAS_OCR_TPU_COMPUTE_DTYPE", "bfloat16")
    compute = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[dtype_name]
    return RuntimeConfig(compute_dtype=compute)


_CONFIG = _default_config()


def get_config() -> RuntimeConfig:
    return _CONFIG


def set_config(config: RuntimeConfig) -> None:
    global _CONFIG
    _CONFIG = config


def _host_fingerprint() -> str:
    """Short id of this host's effective XLA compile configuration.

    XLA:CPU persists AOT executables whose embedded machine-feature
    strings must match on reload (mismatches log cpu_aot_loader
    rejections, and deserializing an entry written by a
    differently-configured process has been observed to SIGSEGV), and
    this repo's cache directory travels between machines (builder box vs
    bench box) and between process configurations (plain vs
    axon-terminal env, whose remote-compile path merges extra XLA
    flags). Keying the default cache path by CPU feature set + jax
    version + XLA_FLAGS + axon env keeps every configuration's artifacts
    separate; TPU executables are keyed by the runtime already, so
    sharing within one configuration is still fully effective.
    """
    import hashlib
    import platform

    import jax as _jax

    parts = [
        platform.machine(),
        _jax.__version__,
        os.environ.get("XLA_FLAGS", ""),
        os.environ.get("PALLAS_AXON_REMOTE_COMPILE", ""),
        os.environ.get("PALLAS_AXON_POOL_IPS", ""),
    ]
    try:
        with open("/proc/cpuinfo", encoding="utf8") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    parts.append(" ".join(sorted(line.split(":", 1)[1].split())))
                    break
    except OSError:
        pass
    return hashlib.sha256(" | ".join(parts).encode()).hexdigest()[:12]


def enable_compile_cache(directory: typing.Optional[str] = None) -> str:
    """Point JAX's persistent compilation cache at a stable directory.

    Compiling the fused pipeline costs ~40 s (and minutes on a busy
    tunneled runtime); the persistent cache makes every later process
    reuse the compiled executable. Called at Detector/Recognizer
    construction; a directory already configured by the user (or
    ``JAX_COMPILATION_CACHE_DIR``) is left untouched.
    """
    current = jax.config.jax_compilation_cache_dir
    if current:
        return current
    if directory is None:
        directory = os.environ.get("KERAS_OCR_TPU_COMPILE_CACHE")
        if directory is None:
            directory = os.path.join(
                os.path.expanduser("~"),
                ".cache",
                "keras_ocr_tpu",
                f"xla_cache_{_host_fingerprint()}",
            )
    if not directory:
        # KERAS_OCR_TPU_COMPILE_CACHE="" is an explicit opt-out (used e.g.
        # by the multichip dry run, which must not load executables that
        # were AOT-compiled against a different backend).
        return ""
    jax.config.update("jax_compilation_cache_dir", directory)
    return directory


def configure() -> bool:
    """Configure the accelerator runtime; returns True if a TPU is present.

    Mirrors the reference's ``config.configure()`` entry point
    (/root/reference/keras_ocr/config.py:5-25) which configured GPU memory;
    here we forward ``MEMORY_FRACTION`` to the XLA client allocator and
    report device availability.
    """
    memory_fraction = os.environ.get("MEMORY_FRACTION")
    if memory_fraction is not None:
        os.environ.setdefault("XLA_PYTHON_CLIENT_MEM_FRACTION", memory_fraction)
    try:
        devices = jax.devices()
    except RuntimeError:
        return False
    return any(d.platform in ("tpu", "axon") for d in devices)
