"""Connected-component labeling as a jittable XLA program.

Replaces ``cv2.connectedComponentsWithStats``
(/root/reference/keras_ocr/detection.py:227-229) with iterative min-label
propagation: each foreground pixel starts with its flat index as its
label; every sweep propagates the running minimum across entire foreground
runs of all rows and columns using segmented min-scans (Hillis-Steele
shift-doubling - contiguous pad/slice/minimum passes).

Performance notes (measured on TPU v5e; amortized over a 32-deep on-device
chain so the tunneled runtime's ~27ms RPC floor divides out):
* 8 full sweeps cost ~0.25ms at 640x480 — a hand-written Pallas kernel
  (:mod:`keras_ocr_tpu.ops.cc_pallas`) ties it, so the XLA lowering is
  already VMEM-resident and well-fused;
* a convergence ``while_loop`` host-syncs every iteration on the deferred
  runtime, so the sweep count is STATIC and unrolled on TPU (``lax.scan``
  on CPU, where unrolling explodes compile time);
* ``lax.associative_scan`` lowers far slower than hand-rolled doubling;
* bool masks force (32,128)->(8,128) tile relayouts against int32 data on
  every pass, so the hot loop is all-int32 with arithmetic selects;
* XLA:TPU lowers gathers with fully dynamic indices to serialized loops,
  so compact component ids are PROPAGATED to pixels with the same sweep
  machinery instead of looked up through ``order[label]``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _shift(arr, distance, axis, reverse, fill):
    """Bring the element `distance` positions behind (ahead if reverse)."""
    size = arr.shape[axis]
    if reverse:
        sliced = jax.lax.slice_in_dim(arr, distance, size, axis=axis)
        pad = jnp.full(
            arr.shape[:axis] + (distance,) + arr.shape[axis + 1 :], fill, arr.dtype
        )
        return jnp.concatenate([sliced, pad], axis=axis)
    sliced = jax.lax.slice_in_dim(arr, 0, size - distance, axis=axis)
    pad = jnp.full(
        arr.shape[:axis] + (distance,) + arr.shape[axis + 1 :], fill, arr.dtype
    )
    return jnp.concatenate([pad, sliced], axis=axis)


def segmented_min_sweeps(values, barrier, sentinel, num_sweeps, check_convergence=False):
    """Propagate per-component minima of ``values`` across a barrier mask.

    Args:
        values: (H, W) int32; barrier positions must hold ``sentinel``.
        barrier: (H, W) int32 0/1 (1 = background / propagation barrier).
        sentinel: value acting as +inf.
        num_sweeps: static number of row+column propagation sweeps; each
            sweep resolves one direction change of a component's shape.
        check_convergence: when True, run ONE extra sweep and report
            whether it changed anything — the propagation is monotone, so
            an unchanged sweep proves the fixpoint was reached and the
            labeling is exact; a changed one proves ``num_sweeps`` was too
            small (e.g. a serpentine component with more direction changes
            than sweeps, which would otherwise SILENTLY split into
            several components). Callers escalate ``num_sweeps`` on a
            False flag, mirroring the component-cap escalation.

    Returns:
        (H, W) int32: per-component minimum at every non-barrier position,
        ``sentinel`` at barriers. With ``check_convergence``, a tuple of
        (values after the extra sweep, scalar bool ``converged``).
    """

    def segmented_min(v0, axis, reverse):
        v = v0
        f = barrier
        distance = 1
        size = v0.shape[axis]
        while distance < size:
            vs = _shift(v, distance, axis, reverse, sentinel)
            fs = _shift(f, distance, axis, reverse, 1)
            v = v + (1 - f) * (jnp.minimum(v, vs) - v)
            f = jnp.maximum(f, fs)
            distance *= 2
        return v

    def run_min(lab, axis):
        forward = segmented_min(lab, axis, reverse=False)
        backward = segmented_min(lab, axis, reverse=True)
        best = jnp.minimum(forward, backward)
        return best + barrier * (sentinel - best)

    def sweep(lab):
        return run_min(run_min(lab, axis=1), axis=0)

    if jax.default_backend() == "cpu":
        # Unrolling explodes XLA:CPU compile time; a static-length scan is
        # compile-cheap and still avoids data-dependent predicates.
        out, _ = jax.lax.scan(
            lambda lab, _: (sweep(lab), None), values, None, length=num_sweeps
        )
    else:
        out = values
        for _ in range(num_sweeps):
            out = sweep(out)
    if check_convergence:
        final = sweep(out)
        return final, jnp.all(final == out)
    return out


@functools.partial(jax.jit, static_argnames=("num_sweeps", "check_convergence"))
def label_components(
    fg: jnp.ndarray, num_sweeps: int = 8, check_convergence: bool = False
):
    """4-connected component labels for a boolean mask.

    Args:
        fg: (H, W) bool foreground mask.
        num_sweeps: static number of propagation sweeps; 8 handles shapes
            with up to 8 direction changes (far beyond real text blobs,
            which converge in 1-2). Raise for pathological masks.
        check_convergence: also return a scalar bool proving the labeling
            reached its fixpoint (see :func:`segmented_min_sweeps`).

    Returns:
        (H, W) int32 array: for foreground pixels, the flat index of the
        component's minimum pixel (root); for background, ``H * W``.
        With ``check_convergence``, a (labels, converged) tuple.
    """
    height, width = fg.shape
    sentinel = height * width
    idx = jnp.arange(sentinel, dtype=jnp.int32).reshape(height, width)
    label = jnp.where(fg, idx, sentinel)
    barrier = (~fg).astype(jnp.int32)
    return segmented_min_sweeps(
        label, barrier, sentinel, num_sweeps, check_convergence=check_convergence
    )


@functools.partial(
    jax.jit, static_argnames=("max_components", "num_sweeps", "check_convergence")
)
def compact_labels(
    label: jnp.ndarray,
    max_components: int,
    num_sweeps: int = 8,
    check_convergence: bool = False,
):
    """Compact root labels to dense component ids in raster order.

    Gather-free: the compact id is written at each component's root pixel
    (a cumsum over the root indicator) and then PROPAGATED to the rest of
    the component with the same segmented min-sweeps used for labeling —
    XLA:TPU serializes dynamically-indexed table gathers, while the
    sweeps stream on the VPU (~0.25ms per 8 sweeps at 640x480).

    Args:
        label: output of :func:`label_components`, (H, W) int32.
        max_components: static capacity; components beyond it are dropped.

    Returns:
        comp: (H, W) int32 in [0, max_components) for foreground pixels of
            kept components, ``max_components`` otherwise (dump segment).
        num_components: scalar int32, total roots found (may exceed capacity).
        With ``check_convergence``, additionally a scalar bool proving the
        id propagation reached every pixel (see
        :func:`segmented_min_sweeps`).
    """
    height, width = label.shape
    sentinel = height * width
    flat = label.reshape(-1)
    idx = jnp.arange(sentinel, dtype=jnp.int32)
    is_root = (flat == idx).astype(jnp.int32)
    order = jnp.cumsum(is_root) - 1  # compact id at root pixels
    fg_int = (flat < sentinel).astype(jnp.int32).reshape(height, width)
    barrier = 1 - fg_int
    seeded = (is_root * order + (1 - is_root) * sentinel).reshape(height, width)
    seeded = seeded + barrier * (sentinel - seeded)
    comp = segmented_min_sweeps(
        seeded, barrier, sentinel, num_sweeps, check_convergence=check_convergence
    )
    if check_convergence:
        comp, converged = comp
    comp = jnp.where(
        fg_int.astype(bool) & (comp < max_components), comp, max_components
    )
    if check_convergence:
        return comp, is_root.sum().astype(jnp.int32), converged
    return comp, is_root.sum().astype(jnp.int32)
