"""Batched on-device perspective word-crop extraction.

Replaces the reference's per-word host loop —
``tools.warpBox`` with ``cv2.getPerspectiveTransform`` +
``cv2.warpPerspective`` called once per box
(/root/reference/keras_ocr/recognition.py:511-519, tools.py:61-117) — with
one fixed-shape XLA program: order the corners, solve all 4-point
homographies as a batched 8x8 linear system, and bilinearly gather every
crop in parallel. All (image x word) pairs are processed in a single
vmapped kernel so detection -> crop -> recognition never leaves the device.

Semantics parity notes (baked into tests vs tools.warpBox):
* corners re-ordered tl-tr-br-bl like ``tools.get_rotated_box`` (for
  boxes that are already rectangles the min-area-rect step is an identity,
  so only the imutils-style ordering matters),
* target width/height = int-truncated mean edge lengths; scale =
  min(target_w / w, target_h / h); the crop occupies the top-left
  ``(int(scale*h), int(scale*w))`` region of the (31, 200) canvas and the
  rest is ``cval`` (tools.py:95-114),
* out-of-image samples read 0 (cv2 constant border).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def order_corners(box: jnp.ndarray) -> jnp.ndarray:
    """Order 4 points tl-tr-br-bl (imutils scheme, tools.py:552-578).

    Args:
        box: (4, 2) float points (any order, assumed near-rectangle).
    """
    x = box[:, 0]
    y = box[:, 1]
    # Two leftmost points -> (tl, bl) by y; two rightmost -> (br, tr) by
    # distance from tl. Implemented with argsort for vectorizability.
    order = jnp.argsort(x, stable=True)
    left = box[order[:2]]
    right = box[order[2:]]
    left_order = jnp.argsort(left[:, 1], stable=True)
    tl = left[left_order[0]]
    bl = left[left_order[1]]
    d = jnp.linalg.norm(right - tl, axis=1)
    far = jnp.argmax(d)
    br = right[far]
    tr = right[1 - far]
    return jnp.stack([tl, tr, br, bl], axis=0)


def square_to_quad(quad: jnp.ndarray) -> jnp.ndarray:
    """Closed-form homography mapping the unit square onto a quad.

    Heckbert's projective-mapping formula: quad rows correspond to unit
    square corners (0,0), (1,0), (1,1), (0,1). Pure elementwise math — no
    linear solve — so it batches perfectly on the VPU (TPU LU
    factorizations are scalar-unit-bound and slow).
    """
    x0, x1, x2, x3 = quad[0, 0], quad[1, 0], quad[2, 0], quad[3, 0]
    y0, y1, y2, y3 = quad[0, 1], quad[1, 1], quad[2, 1], quad[3, 1]
    sx = x0 - x1 + x2 - x3
    sy = y0 - y1 + y2 - y3
    dx1 = x1 - x2
    dx2 = x3 - x2
    dy1 = y1 - y2
    dy2 = y3 - y2
    den = dx1 * dy2 - dx2 * dy1
    den = jnp.where(jnp.abs(den) < 1e-12, 1e-12, den)
    g = (sx * dy2 - sy * dx2) / den
    h = (dx1 * sy - dy1 * sx) / den
    a = x1 - x0 + g * x1
    b = x3 - x0 + h * x3
    c = x0
    d = y1 - y0 + g * y1
    e = y3 - y0 + h * y3
    f = y0
    return jnp.array([[a, b, c], [d, e, f], [g, h, 1.0]])


def perspective_transform(src: jnp.ndarray, dst: jnp.ndarray) -> jnp.ndarray:
    """3x3 homography mapping src (4,2) onto dst (4,2) via an 8x8 solve."""
    x, y = src[:, 0], src[:, 1]
    u, v = dst[:, 0], dst[:, 1]
    zeros = jnp.zeros((4,))
    ones = jnp.ones((4,))
    rows_u = jnp.stack([x, y, ones, zeros, zeros, zeros, -u * x, -u * y], axis=1)
    rows_v = jnp.stack([zeros, zeros, zeros, x, y, ones, -v * x, -v * y], axis=1)
    A = jnp.concatenate([rows_u, rows_v], axis=0)  # (8, 8)
    b = jnp.concatenate([u, v], axis=0)
    h = jnp.linalg.solve(A, b)
    return jnp.concatenate([h, jnp.ones((1,))]).reshape(3, 3)


@functools.partial(jax.jit, static_argnames=("target_height", "target_width"))
def warp_boxes(
    image: jnp.ndarray,
    boxes: jnp.ndarray,
    target_height: int = 31,
    target_width: int = 200,
    cval: float = 0.0,
) -> jnp.ndarray:
    """Crop every box of one image into a (target_height, target_width) canvas.

    Args:
        image: (H, W) or (H, W, C) float image.
        boxes: (N, 4, 2) float corner coordinates.

    Returns:
        (N, target_height, target_width[, C]) float32 crops.
    """
    squeeze = image.ndim == 2
    if squeeze:
        image = image[..., None]
    height, width, channels = image.shape

    def one(box):
        box = order_corners(box)
        w = jnp.floor(
            (jnp.linalg.norm(box[0] - box[1]) + jnp.linalg.norm(box[2] - box[3])) / 2
        )
        h = jnp.floor(
            (jnp.linalg.norm(box[0] - box[3]) + jnp.linalg.norm(box[1] - box[2])) / 2
        )
        w = jnp.maximum(w, 1.0)
        h = jnp.maximum(h, 1.0)
        scale = jnp.minimum(target_width / w, target_height / h)
        sw = scale * w
        sh = scale * h
        # Inverse map: target pixel -> source coords. The destination is an
        # axis-aligned [0,sw]x[0,sh] rect, so the inverse homography is the
        # unit-square->box map composed with a diagonal rescale — no 8x8
        # solve needed (see square_to_quad).
        M_inv = square_to_quad(box)
        xs = jnp.arange(target_width, dtype=jnp.float32)
        ys = jnp.arange(target_height, dtype=jnp.float32)
        gx, gy = jnp.meshgrid(xs, ys)
        gu = gx / sw
        gv = gy / sh
        denom = M_inv[2, 0] * gu + M_inv[2, 1] * gv + M_inv[2, 2]
        sx = (M_inv[0, 0] * gu + M_inv[0, 1] * gv + M_inv[0, 2]) / denom
        sy = (M_inv[1, 0] * gu + M_inv[1, 1] * gv + M_inv[1, 2]) / denom

        # Bilinear gather with zero padding outside the image.
        x0 = jnp.floor(sx)
        y0 = jnp.floor(sy)
        fx = sx - x0
        fy = sy - y0

        def tap(yy, xx):
            inside = (xx >= 0) & (xx < width) & (yy >= 0) & (yy < height)
            xi = jnp.clip(xx, 0, width - 1).astype(jnp.int32)
            yi = jnp.clip(yy, 0, height - 1).astype(jnp.int32)
            vals = image[yi, xi]
            return jnp.where(inside[..., None], vals, 0.0)

        out = (
            tap(y0, x0) * ((1 - fx) * (1 - fy))[..., None]
            + tap(y0, x0 + 1) * (fx * (1 - fy))[..., None]
            + tap(y0 + 1, x0) * ((1 - fx) * fy)[..., None]
            + tap(y0 + 1, x0 + 1) * (fx * fy)[..., None]
        )
        # Only the top-left int(scale*w) x int(scale*h) region is the crop;
        # the remainder of the canvas is cval (tools.py:107-114).
        valid = (gx < jnp.floor(sw)) & (gy < jnp.floor(sh))
        return jnp.where(valid[..., None], out, cval)

    crops = jax.vmap(one)(boxes.astype(jnp.float32))
    if squeeze:
        crops = crops[..., 0]
    return crops.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("target_height", "target_width"))
def warp_boxes_batch(
    images: jnp.ndarray,
    boxes: jnp.ndarray,
    target_height: int = 31,
    target_width: int = 200,
) -> jnp.ndarray:
    """(B, H, W[, C]) images x (B, N, 4, 2) boxes -> (B, N, th, tw[, C])."""
    fn = functools.partial(
        warp_boxes, target_height=target_height, target_width=target_width
    )
    return jax.vmap(fn)(images, boxes)
