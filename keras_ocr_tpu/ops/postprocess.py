"""On-device CRAFT heatmap -> word-box post-processing.

XLA-native re-design of the reference's host OpenCV ``getBoxes`` loop
(/root/reference/keras_ocr/detection.py:207-287), which per image runs
threshold -> connectedComponentsWithStats -> per-component filters ->
dilate -> findContours -> minAreaRect on the CPU. Here the whole thing is
one fixed-shape jitted program so it fuses with the CRAFT forward pass:

* threshold / combine: elementwise ``>`` (detection.py:221-226),
* connected components: :mod:`keras_ocr_tpu.ops.cc` label propagation,
* per-component statistics: *five* batched segment reductions total
  (areas, moments, bounding boxes, max text confidence, rotated extents)
  over ``MAX_COMPONENTS`` static segments — no data-dependent shapes,
* size / confidence filters as masks (detection.py:233-241),
* the per-component dilation with a ``(1+niter)`` square kernel
  (detection.py:258-264) is applied *analytically*: extents of the
  dilated set along any fixed direction equal the original extents plus
  the kernel's support, so no dilated mask is ever materialized,
* rotated rectangle: extents along the segmap's principal (PCA) axis —
  for (near-)rectangular text blobs this matches ``cv2.minAreaRect``'s
  optimal angle; accuracy vs the exact host oracle is asserted in tests,
* the "diamond" fallback to the axis-aligned bounding box when the
  rectangle is nearly square (detection.py:276-281) is reproduced
  *exactly* (the dilated set's bbox is the segmap bbox expanded by the
  kernel's anchored offsets, clipped at the image border),
* clockwise corner order rolled so the corner with minimal x+y is first
  (detection.py:284), and coordinates scaled x2 back to input resolution
  (detection.py:285).

Returns fixed-shape ``(B, MAX_COMPONENTS, 4, 2)`` boxes plus a validity
mask; the ragged Python-list API of the reference is recovered at the
host boundary by ``Detector.detect``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .cc import compact_labels, label_components

@functools.partial(
    jax.jit,
    static_argnames=("max_components", "refine_angles"),
)
def get_boxes(
    heatmaps: jnp.ndarray,
    detection_threshold: float = 0.7,
    text_threshold: float = 0.4,
    link_threshold: float = 0.4,
    size_threshold: int = 10,
    max_components: int = 256,
    refine_angles: int = 0,
):
    """Batched heatmaps -> (boxes, mask).

    Args:
        heatmaps: (B, H, W, 2) float text/link maps in [0, 1].
        refine_angles: if > 0, evaluate this many candidate angles around
            each component's PCA axis (+-12 deg) and keep the one whose
            (dilation-expanded) bounding rectangle has minimal area —
            closing the gap to cv2.minAreaRect's exact optimum at the cost
            of two extra wide segment reductions.

    Returns:
        boxes: (B, max_components, 4, 2) float32 corners in input-image
            coordinates (heatmap coords x2), clockwise, min-(x+y) first.
        mask: (B, max_components) bool validity.
    """

    def single(hm):
        return _get_boxes_single(
            hm,
            detection_threshold,
            text_threshold,
            link_threshold,
            size_threshold,
            max_components,
            refine_angles,
        )

    return jax.vmap(single)(heatmaps)


def _refine_theta(theta, xs, ys, seg_ids, max_components, num_segments, num_angles):
    """Pick the minimum-area rectangle angle from candidates around PCA.

    cv2.minAreaRect's optimum shares a direction with a convex-hull edge;
    for text blobs that direction sits near the PCA axis, so a +-12 deg
    sweep recovers it. Both extent reductions are batched into single wide
    segment calls. (The per-angle dilation expansion varies by <2% inside
    this window and is ignored for the area comparison.)
    """
    offsets = jnp.linspace(-12.0, 12.0, num_angles) * (jnp.pi / 180.0)
    theta_per_pixel = jnp.concatenate([theta, jnp.zeros((1,))])[
        jnp.minimum(seg_ids, max_components)
    ]
    angles = theta_per_pixel[:, None] + offsets[None, :]  # (N, K)
    cos_a, sin_a = jnp.cos(angles), jnp.sin(angles)
    u = xs[:, None] * cos_a + ys[:, None] * sin_a
    v = -xs[:, None] * sin_a + ys[:, None] * cos_a
    payload = jnp.concatenate([u, v], axis=1)  # (N, 2K)
    mins = jax.ops.segment_min(payload, seg_ids, num_segments)[:-1]
    maxs = jax.ops.segment_max(payload, seg_ids, num_segments)[:-1]
    num = num_angles
    area = (maxs[:, :num] - mins[:, :num]) * (maxs[:, num:] - mins[:, num:])
    best = jnp.argmin(area, axis=1)
    return theta + offsets[best]


def _get_boxes_single(
    hm,
    detection_threshold,
    text_threshold,
    link_threshold,
    size_threshold,
    max_components,
    refine_angles=0,
):
    height, width = hm.shape[0], hm.shape[1]
    n = height * width
    num_segments = max_components + 1  # last segment = dumped pixels

    textmap = hm[..., 0]
    linkmap = hm[..., 1]
    text_score = textmap > text_threshold
    link_score = linkmap > link_threshold
    fg = text_score | link_score

    label = label_components(fg)
    comp, _ = compact_labels(label, max_components)
    ids = comp.reshape(-1)

    xs = jnp.tile(jnp.arange(width, dtype=jnp.float32), height)
    ys = jnp.repeat(jnp.arange(height, dtype=jnp.float32), width)

    # ---- full-component stats (filters + dilation radius) ----
    area = jax.ops.segment_sum(jnp.ones((n,), jnp.float32), ids, num_segments)[:-1]
    full_mins = jax.ops.segment_min(jnp.stack([xs, ys], 1), ids, num_segments)[:-1]
    full_maxs = jax.ops.segment_max(
        jnp.stack([xs, ys, textmap.reshape(-1)], 1), ids, num_segments
    )[:-1]
    xmin, ymin = full_mins[:, 0], full_mins[:, 1]
    xmax, ymax, tmax = full_maxs[:, 0], full_maxs[:, 1], full_maxs[:, 2]
    bw = xmax - xmin + 1.0
    bh = ymax - ymin + 1.0

    valid = (area >= size_threshold) & (tmax >= detection_threshold)

    # Dilation kernel geometry (detection.py:258-264): square side 1+niter
    # with cv2 anchor at (1+niter)//2. dst(x) = max over src(x + o),
    # o in [-anchor, k-1-anchor], so the *set* grows by `a = anchor` to the
    # right/down and `b = k-1-anchor` to the left/up.
    niter = jnp.floor(jnp.sqrt(area * jnp.minimum(bw, bh) / (bw * bh)) * 2.0)
    k = 1.0 + niter
    a = jnp.floor(k / 2.0)
    b = k - 1.0 - a

    # ---- segmap stats (component minus link/text overlap, detection.py:244-246) ----
    overlap = (link_score & text_score).reshape(-1)
    seg_ids = jnp.where(overlap, max_components, ids)
    seg_feats = jnp.stack(
        [jnp.ones((n,), jnp.float32), xs, ys, xs * xs, ys * ys, xs * ys], 1
    )
    sums = jax.ops.segment_sum(seg_feats, seg_ids, num_segments)[:-1]
    n_seg, sx, sy, sxx, syy, sxy = (sums[:, i] for i in range(6))
    n_safe = jnp.maximum(n_seg, 1.0)
    mx, my = sx / n_safe, sy / n_safe
    cxx = sxx / n_safe - mx * mx
    cyy = syy / n_safe - my * my
    cxy = sxy / n_safe - mx * my
    theta = 0.5 * jnp.arctan2(2.0 * cxy, cxx - cyy)

    if refine_angles > 0:
        theta = _refine_theta(
            theta, xs, ys, seg_ids, max_components, num_segments, refine_angles
        )
    cos_t, sin_t = jnp.cos(theta), jnp.sin(theta)

    seg_mins = jax.ops.segment_min(jnp.stack([xs, ys], 1), seg_ids, num_segments)[:-1]
    seg_maxs = jax.ops.segment_max(jnp.stack([xs, ys], 1), seg_ids, num_segments)[:-1]
    sxmin, symin = seg_mins[:, 0], seg_mins[:, 1]
    sxmax, symax = seg_maxs[:, 0], seg_maxs[:, 1]

    # Rotated extents: per-pixel projection onto the component's own axis.
    cos_p = jnp.concatenate([cos_t, jnp.ones((1,))])[jnp.minimum(seg_ids, max_components)]
    sin_p = jnp.concatenate([sin_t, jnp.zeros((1,))])[jnp.minimum(seg_ids, max_components)]
    u = xs * cos_p + ys * sin_p
    v = -xs * sin_p + ys * cos_p
    uv_mins = jax.ops.segment_min(jnp.stack([u, v], 1), seg_ids, num_segments)[:-1]
    uv_maxs = jax.ops.segment_max(jnp.stack([u, v], 1), seg_ids, num_segments)[:-1]
    umin, vmin = uv_mins[:, 0], uv_mins[:, 1]
    umax, vmax = uv_maxs[:, 0], uv_maxs[:, 1]

    # Analytic Minkowski expansion by the kernel's offsets [-b, a]^2.
    def support(cx, cy):
        # max / min over the 4 kernel corners of dx*cx + dy*cy.
        corners = jnp.stack(
            [
                -b * cx - b * cy,
                -b * cx + a * cy,
                a * cx - b * cy,
                a * cx + a * cy,
            ],
            0,
        )
        return corners.max(0), corners.min(0)

    du_max, du_min = support(cos_t, sin_t)
    dv_max, dv_min = support(-sin_t, cos_t)
    umax = umax + du_max
    umin = umin + du_min
    vmax = vmax + dv_max
    vmin = vmin + dv_min

    rw = umax - umin
    rh = vmax - vmin
    ratio = jnp.maximum(rw, rh) / (jnp.minimum(rw, rh) + 1e-5)
    diamond = jnp.abs(1.0 - ratio) <= 0.1

    # Rotated-rect corners (cyclic order).
    corners_u = jnp.stack([umin, umax, umax, umin], 1)  # (C, 4)
    corners_v = jnp.stack([vmin, vmin, vmax, vmax], 1)
    rot_x = corners_u * cos_t[:, None] - corners_v * sin_t[:, None]
    rot_y = corners_u * sin_t[:, None] + corners_v * cos_t[:, None]

    # Diamond fallback: exact bbox of the dilated segmap (detection.py:276-281).
    dl = jnp.maximum(sxmin - b, 0.0)
    dt = jnp.maximum(symin - b, 0.0)
    dr = jnp.minimum(sxmax + a, width - 1.0)
    db = jnp.minimum(symax + a, height - 1.0)
    dia_x = jnp.stack([dl, dr, dr, dl], 1)
    dia_y = jnp.stack([dt, dt, db, db], 1)

    box_x = jnp.where(diamond[:, None], dia_x, rot_x)
    box_y = jnp.where(diamond[:, None], dia_y, rot_y)
    boxes = jnp.stack([box_x, box_y], axis=-1)  # (C, 4, 2)

    # Roll so the min-(x+y) corner comes first, preserving cyclic order
    # (detection.py:284). The diamond branch is already in that order but
    # goes through the same roll harmlessly.
    start = jnp.argmin(box_x + box_y, axis=1)  # (C,)
    gather_idx = (start[:, None] + jnp.arange(4)[None, :]) % 4
    boxes = jnp.take_along_axis(boxes, gather_idx[..., None], axis=1)

    valid = valid & (n_seg > 0)
    boxes = jnp.where(valid[:, None, None], boxes * 2.0, 0.0)
    return boxes.astype(jnp.float32), valid
