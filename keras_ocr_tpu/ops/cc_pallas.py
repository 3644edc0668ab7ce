"""Pallas TPU kernel for the connected-component label sweeps.

The XLA implementation in :mod:`keras_ocr_tpu.ops.cc` runs ~40 shifted
min/max passes per sweep over the full (H, W) label map; each pass is a
pad/slice/minimum chain that XLA may materialize between fusions. A
half-resolution 1280x960-input heatmap is a 640x480 int32 map (1.2 MB), so
the ENTIRE propagation fits in VMEM (~16 MB/core): this kernel reads the
label and barrier maps from HBM once, runs every doubling step of every
sweep on VMEM-resident data on the VPU, and writes the converged labels
once.

Shift-with-fill is expressed as ``pltpu.roll`` (circular) plus an iota
mask overwriting the wrapped region with the sentinel — no concatenation,
no relayouts; the whole loop is int32 arithmetic on (sublane, lane) tiles.

NOT dispatched by default: on-chip measurement (PERF.md, "Conv-block
fusion"/CC sections) shows this kernel only TIES the XLA lowering of
:func:`keras_ocr_tpu.ops.cc.segmented_min_sweeps` — XLA already keeps the
propagation VMEM-resident and fused — so the simpler XLA path stays the
production one. The kernel is kept, tested (interpreter-mode oracle
parity in ``tests/test_cc_pallas.py``), and benchmarked as the baseline
to beat for any future hand-scheduled variant.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sweep_kernel(values_ref, barrier_ref, out_ref, *, sentinel, num_sweeps):
    height, width = values_ref.shape
    v0 = values_ref[:]
    barrier = barrier_ref[:]

    def segmented_min(v, axis, reverse):
        # The iota is regenerated per scan (not hoisted) to keep the
        # scoped-VMEM live set small — the kernel sits near the limit.
        idx = jax.lax.broadcasted_iota(jnp.int32, (height, width), axis)
        size = width if axis == 1 else height
        f = barrier
        distance = 1
        while distance < size:
            shift = (size - distance) if reverse else distance
            if reverse:
                wrapped = (idx >= size - distance).astype(jnp.int32)
            else:
                wrapped = (idx < distance).astype(jnp.int32)
            vs = pltpu.roll(v, shift, axis)
            fs = pltpu.roll(f, shift, axis)
            # Fill the wrapped band arithmetically (vs<-sentinel, fs<-1).
            vs = vs + wrapped * (sentinel - vs)
            fs = jnp.maximum(fs, wrapped)
            v = v + (1 - f) * (jnp.minimum(v, vs) - v)
            f = jnp.maximum(f, fs)
            distance *= 2
        return v

    def run_min(v, axis):
        best = jnp.minimum(
            segmented_min(v, axis, reverse=False),
            segmented_min(v, axis, reverse=True),
        )
        return best + barrier * (sentinel - best)

    # fori_loop (not unrolled) bounds the live-temporary set: fully
    # unrolling num_sweeps * ~40 passes makes Mosaic's scoped VMEM stack
    # blow far past its limit.
    v = jax.lax.fori_loop(
        0, num_sweeps, lambda _, v: run_min(run_min(v, axis=1), axis=0), v0
    )
    out_ref[:] = v


@functools.partial(
    jax.jit, static_argnames=("sentinel", "num_sweeps", "interpret")
)
def segmented_min_sweeps_pallas(
    values: jnp.ndarray,
    barrier: jnp.ndarray,
    sentinel: int,
    num_sweeps: int,
    interpret: bool = False,
):
    """VMEM-resident equivalent of :func:`keras_ocr_tpu.ops.cc.segmented_min_sweeps`.

    Args:
        values: (H, W) int32; barrier positions must hold ``sentinel``.
        barrier: (H, W) int32 0/1 (1 = propagation barrier).
        sentinel: value acting as +inf (static).
        num_sweeps: static number of row+column propagation sweeps.
        interpret: run in the Pallas interpreter (for CPU tests).
    """
    height, width = values.shape
    kernel = functools.partial(
        _sweep_kernel, sentinel=sentinel, num_sweeps=num_sweeps
    )
    kwargs = {}
    if not interpret:
        # A 640x480 int32 map needs ~8 live (H, W) temporaries through the
        # scan loop; the default 16 MB scoped-VMEM budget is a hair short,
        # so ask Mosaic for more (v5e has headroom above the default cap).
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((height, width), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
        **kwargs,
    )(values.astype(jnp.int32), barrier.astype(jnp.int32))
