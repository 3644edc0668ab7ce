"""Tracing and per-stage timing utilities.

The reference has no profiling support (latency numbers were hand-measured
in a notebook, SURVEY.md §5); this module provides the TPU-native
observability layer: ``jax.profiler`` trace capture for TensorBoard and a
lightweight stage timer used by the pipeline and benchmarks.
"""

from __future__ import annotations

import contextlib
import time
import typing

import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace (view with TensorBoard)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up in profiler traces."""
    import jax

    return jax.profiler.TraceAnnotation(name)


class StageTimer:
    """Accumulates wall-clock timings per named stage.

    Note: on asynchronous backends a stage is only fully accounted for if
    its outputs are materialized (``block()``) inside the stage.
    """

    def __init__(self):
        self.records: typing.Dict[str, typing.List[float]] = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        start = time.perf_counter()
        try:
            yield
        finally:
            self.records.setdefault(name, []).append(time.perf_counter() - start)

    @staticmethod
    def block(tree):
        """Force materialization of a pytree of device arrays."""
        import jax

        for leaf in jax.tree.leaves(tree):
            np.asarray(leaf)
        return tree

    def summary(self) -> typing.Dict[str, typing.Dict[str, float]]:
        out = {}
        for name, values in self.records.items():
            arr = np.asarray(values)
            out[name] = {
                "count": int(arr.size),
                "mean_ms": float(arr.mean() * 1000),
                "p50_ms": float(np.median(arr) * 1000),
                "total_ms": float(arr.sum() * 1000),
            }
        return out

    def report(self) -> str:
        lines = []
        for name, stats in self.summary().items():
            lines.append(
                f"{name:>16}: p50 {stats['p50_ms']:8.2f} ms  "
                f"mean {stats['mean_ms']:8.2f} ms  x{stats['count']}"
            )
        return "\n".join(lines)
