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


def _shift2(arr, dy, dx, fill):
    """Bring the element at offset (-dy, -dx); edges filled with ``fill``."""
    out = arr
    if dy:
        out = _shift(out, abs(dy), axis=0, reverse=dy < 0, fill=fill)
    if dx:
        out = _shift(out, abs(dx), axis=1, reverse=dx < 0, fill=fill)
    return out


_DIAGONALS = ((-1, -1), (-1, 1), (1, -1), (1, 1))


def _prefix_max_payload(measure, payloads, axis, reverse, fill):
    """Running (prefix) max of ``measure`` along ``axis`` with payloads.

    Hillis-Steele doubling; ``payloads`` ride along with the winning
    position. ``reverse=True`` scans from the high end (suffix max).
    """
    distance = 1
    size = measure.shape[axis]
    while distance < size:
        ms = _shift(measure, distance, axis, reverse, fill)
        take = ms > measure
        measure = jnp.maximum(measure, ms)
        payloads = [
            jnp.where(take, _shift(p, distance, axis, reverse, 0), p)
            for p in payloads
        ]
        distance *= 2
    return measure, payloads


def brushfire_dilate(seed, comp, grow_a, grow_b):
    """Per-component square dilation of ``seed`` in one (H, W) plane.

    Computes the union over seed pixels p of the square
    ``[px - b_p, px + a_p] x [py - b_p, py + a_p]`` (cv2.dilate geometry
    with per-component kernel sizes, clipped at the image border), via
    separable max-plus prefix scans: a seed at x covers x' >= x iff
    ``x + a >= x'``, so prefix-max of ``x + a`` decides coverage and its
    arg carries the covering component. Where several components' squares
    overlap, ONE winner is recorded; seed pixels always keep their own
    component. Downstream blob counting therefore can only OVER-count a
    component's dilated blobs (a contested pixel lost to another
    component may split a blob, never merge one) — the conservative
    direction for the multi-blob refinement flag.

    Args:
        seed: (H, W) bool seed mask.
        comp: (H, W) int32 component id at seed pixels.
        grow_a: (H, W) float32 growth toward +x/+y at seed pixels.
        grow_b: (H, W) float32 growth toward -x/-y at seed pixels.

    Returns:
        cover: (H, W) bool dilated set.
        cover_comp: (H, W) int32 covering component id (-1 outside).
    """
    height, width = seed.shape
    neg = jnp.float32(-3e9)

    def axis_pass(active, acomp, a_bud, b_bud, axis):
        pos = (
            jnp.arange(active.shape[axis], dtype=jnp.float32)
            .reshape((-1, 1) if axis == 0 else (1, -1))
        )
        pos = jnp.broadcast_to(pos, active.shape)
        mf, (cf, af, bf) = _prefix_max_payload(
            jnp.where(active, pos + a_bud, neg),
            [acomp, a_bud, b_bud],
            axis,
            reverse=False,
            fill=neg,
        )
        covered_f = mf >= pos
        mb, (cb, ab, bb) = _prefix_max_payload(
            jnp.where(active, b_bud - pos, neg),
            [acomp, a_bud, b_bud],
            axis,
            reverse=True,
            fill=neg,
        )
        covered_b = mb >= -pos
        covered = covered_f | covered_b
        ncomp = jnp.where(covered_f, cf, cb)
        na = jnp.where(covered_f, af, ab)
        nb = jnp.where(covered_f, bf, bb)
        # Seeds of THIS pass always keep their own identity (see above).
        ncomp = jnp.where(active, acomp, ncomp)
        na = jnp.where(active, a_bud, na)
        nb = jnp.where(active, b_bud, nb)
        return covered, ncomp, na, nb

    covered, ncomp, na, nb = axis_pass(seed, comp, grow_a, grow_b, axis=1)
    covered, ncomp, _, _ = axis_pass(covered, ncomp, na, nb, axis=0)
    return covered, jnp.where(covered, ncomp, -1)


def _keyed_run_min(values, key, fg, sentinel, axis):
    """Bidirectional min over maximal same-key foreground runs along axis."""

    def one_direction(reverse):
        prev_fg = _shift(fg.astype(jnp.int32), 1, axis, reverse, 0)
        prev_key = _shift(key, 1, axis, reverse, -1)
        head = (
            (~fg).astype(jnp.int32)
            | (1 - prev_fg)
            | (prev_key != key).astype(jnp.int32)
        )
        v, f = values, head
        distance = 1
        size = values.shape[axis]
        while distance < size:
            vs = _shift(v, distance, axis, reverse, sentinel)
            fs = _shift(f, distance, axis, reverse, 1)
            v = jnp.where(f == 0, jnp.minimum(v, vs), v)
            f = f | fs
            distance *= 2
        return v

    best = jnp.minimum(one_direction(False), one_direction(True))
    return jnp.where(fg, best, sentinel)


@functools.partial(jax.jit, static_argnames=("num_sweeps", "check_convergence"))
def label_blobs_keyed(mask, key, num_sweeps=8, check_convergence=False):
    """8-connected blob labels within ``mask``, segmented by ``key``.

    Two adjacent (8-neighborhood) mask pixels join a blob only when their
    ``key`` values match — the labeling of several components' (possibly
    interleaved) dilated sets in ONE plane, where each component's blobs
    must stay independent. Row/column propagation uses keyed run scans
    (a run breaks at background OR at a key change); diagonals use keyed
    single steps.

    Returns (H, W) int32 root-flat-index labels (sentinel at background);
    with ``check_convergence`` a (labels, converged) tuple.
    """
    height, width = mask.shape
    sentinel = height * width
    idx = jnp.arange(sentinel, dtype=jnp.int32).reshape(height, width)
    label = jnp.where(mask, idx, sentinel)

    def diagonal_step(lab):
        best = lab
        for dy, dx in _DIAGONALS:
            cand = _shift2(lab, dy, dx, sentinel)
            cand = jnp.where(_shift2(key, dy, dx, -2) == key, cand, sentinel)
            best = jnp.minimum(best, cand)
        return jnp.where(mask, best, sentinel)

    def sweep(lab):
        lab = _keyed_run_min(lab, key, mask, sentinel, axis=1)
        lab = _keyed_run_min(lab, key, mask, sentinel, axis=0)
        return diagonal_step(lab)

    if jax.default_backend() == "cpu":
        out, _ = jax.lax.scan(
            lambda lab, _: (sweep(lab), None), label, None, length=num_sweeps
        )
    else:
        out = label
        for _ in range(num_sweeps):
            out = sweep(out)
    if check_convergence:
        final = sweep(out)
        return final, jnp.all(final == out)
    return out


@functools.partial(
    jax.jit, static_argnames=("num_sweeps", "check_convergence")
)
def label_components_8conn(
    fg, num_sweeps=8, comp=None, check_convergence=False
):
    """8-connected component labels (cv2.findContours blob connectivity).

    Same min-label propagation as :func:`label_components`, with one
    diagonal-neighbor min step per sweep bridging the diagonal adjacencies
    that the row/column run scans cannot cross. When ``comp`` is given
    (an int32 plane of 4-connected component ids), diagonal bridging is
    restricted to equal ``comp`` values: 4-adjacent foreground pixels
    always share a 4-connected component, but DIAGONAL neighbors may not
    — keying on ``comp`` keeps each component's sub-blob labeling
    independent, exactly like the reference's per-component
    ``findContours`` call (/root/reference/keras_ocr/detection.py:267).

    Returns (H, W) int32 root-flat-index labels (sentinel at background);
    with ``check_convergence`` a (labels, converged) tuple. The root of a
    blob is its raster-first (topmost, then leftmost) pixel.
    """
    height, width = fg.shape
    sentinel = height * width
    idx = jnp.arange(sentinel, dtype=jnp.int32).reshape(height, width)
    label = jnp.where(fg, idx, sentinel)
    barrier = (~fg).astype(jnp.int32)

    def diagonal_step(lab):
        best = lab
        for dy, dx in _DIAGONALS:
            cand = _shift2(lab, dy, dx, sentinel)
            if comp is not None:
                cand = jnp.where(
                    _shift2(comp, dy, dx, -1) == comp, cand, sentinel
                )
            best = jnp.minimum(best, cand)
        return jnp.where(barrier == 1, sentinel, best)

    def sweep(lab):
        lab = segmented_min_sweeps(lab, barrier, sentinel, 1)
        return diagonal_step(lab)

    if jax.default_backend() == "cpu":
        out, _ = jax.lax.scan(
            lambda lab, _: (sweep(lab), None), label, None, length=num_sweeps
        )
    else:
        out = label
        for _ in range(num_sweeps):
            out = sweep(out)
    if check_convergence:
        final = sweep(out)
        return final, jnp.all(final == out)
    return out


@functools.partial(
    jax.jit, static_argnames=("num_sweeps", "check_convergence")
)
def flood_from_seeds(mask, seeds, num_sweeps=8, check_convergence=False):
    """4-connected reachability inside ``mask`` from ``seeds`` (both bool).

    The background-flood primitive for hole semantics: with ``mask`` the
    background of a blob plane and ``seeds`` its border-adjacent
    background, the result marks the NON-hole background — exactly the
    complement (within background) of what ``scipy.binary_fill_holes``
    would fill. Returns (H, W) bool reached; with ``check_convergence`` a
    (reached, converged) tuple.
    """
    height, width = mask.shape
    sentinel = height * width
    values = jnp.where(seeds & mask, 0, sentinel).astype(jnp.int32)
    barrier = (~mask).astype(jnp.int32)
    values = jnp.where(mask, values, sentinel)
    out = segmented_min_sweeps(
        values, barrier, sentinel, num_sweeps, check_convergence=check_convergence
    )
    if check_convergence:
        out, converged = out
        return (out == 0) & mask, converged
    return (out == 0) & mask


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
