"""Connected-component labeling as a jittable XLA program.

Replaces ``cv2.connectedComponentsWithStats``
(/root/reference/keras_ocr/detection.py:227-229) with an iterative
min-label propagation: each foreground pixel starts with its flat index as
its label; every iteration takes the 4-neighborhood minimum and then
applies two pointer-jumping steps (``label = min(label, label[label])``,
a gather on the flattened image) so convergence is O(log diameter)
instead of O(diameter). Runs under ``lax.while_loop`` with a convergence
flag and a hard iteration bound, fully vectorized on the VPU.

Component ids are then compacted to ``[0, max_components)`` in raster
order of their root pixels — the same ordering
``cv2.connectedComponents`` produces — with a validity mask for overflow.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("max_iters",))
def label_components(fg: jnp.ndarray, max_iters: int = 64) -> jnp.ndarray:
    """4-connected component labels for a boolean mask.

    Each iteration propagates the running minimum across entire foreground
    runs of every row and column at once (segmented min-scans via
    ``lax.associative_scan``, O(log W) VPU passes) and then applies two
    pointer-jumping steps. Straight/convex text blobs converge in one
    iteration; snake-like shapes need one iteration per bend, bounded by
    ``max_iters``.

    Args:
        fg: (H, W) bool foreground mask.
        max_iters: safety bound on propagation iterations.

    Returns:
        (H, W) int32 array: for foreground pixels, the flat index of the
        component's minimum pixel (root); for background, ``H * W``.
    """
    height, width = fg.shape
    sentinel = height * width
    idx = jnp.arange(sentinel, dtype=jnp.int32).reshape(height, width)
    label = jnp.where(fg, idx, sentinel)
    barrier = ~fg

    def segmented_min(values, axis, reverse):
        # Min over the contiguous foreground run ending at each position.
        def combine(left, right):
            v1, f1 = left
            v2, f2 = right
            return jnp.where(f2, v2, jnp.minimum(v1, v2)), f1 | f2

        out, _ = jax.lax.associative_scan(
            combine, (values, barrier), axis=axis, reverse=reverse
        )
        return out

    def run_min(lab, axis):
        forward = segmented_min(lab, axis, reverse=False)
        backward = segmented_min(lab, axis, reverse=True)
        return jnp.where(fg, jnp.minimum(forward, backward), sentinel)

    def pointer_jump(flat):
        # flat[p] indexes another pixel in the same component; chase it.
        padded = jnp.concatenate([flat, jnp.array([sentinel], flat.dtype)])
        jumped = padded[jnp.minimum(flat, sentinel)]
        return jnp.where(flat < sentinel, jnp.minimum(flat, jumped), flat)

    def body(state):
        lab, _, it = state
        new = run_min(run_min(lab, axis=1), axis=0)
        flat = new.reshape(-1)
        flat = pointer_jump(pointer_jump(flat))
        new = flat.reshape(height, width)
        return new, jnp.any(new != lab), it + 1

    def cond(state):
        _, changed, it = state
        return changed & (it < max_iters)

    label, _, _ = jax.lax.while_loop(cond, body, (label, jnp.bool_(True), 0))
    return label


@functools.partial(jax.jit, static_argnames=("max_components",))
def compact_labels(label: jnp.ndarray, max_components: int):
    """Compact root labels to dense component ids in raster order.

    Args:
        label: output of :func:`label_components`, (H, W) int32.
        max_components: static capacity; components beyond it are dropped.

    Returns:
        comp: (H, W) int32 in [0, max_components) for foreground pixels of
            kept components, ``max_components`` otherwise (dump segment).
        num_components: scalar int32, total roots found (may exceed capacity).
    """
    height, width = label.shape
    sentinel = height * width
    flat = label.reshape(-1)
    idx = jnp.arange(sentinel, dtype=jnp.int32)
    is_root = flat == idx
    order = jnp.cumsum(is_root.astype(jnp.int32)) - 1  # compact id at root pixels
    padded = jnp.concatenate([order, jnp.array([max_components], jnp.int32)])
    comp = padded[jnp.minimum(flat, sentinel)]
    comp = jnp.where(
        (flat < sentinel) & (comp < max_components), comp, max_components
    )
    return comp.reshape(height, width), is_root.sum().astype(jnp.int32)
