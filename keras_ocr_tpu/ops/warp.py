"""Batched on-device perspective word-crop extraction.

Replaces the reference's per-word host loop —
``tools.warpBox`` with ``cv2.getPerspectiveTransform`` +
``cv2.warpPerspective`` called once per box
(/root/reference/keras_ocr/recognition.py:511-519, tools.py:61-117) — with
one fixed-shape XLA program: order the corners, compute all homographies
in closed form, and resample every crop in parallel. All (image x word)
pairs are processed in a single vmapped kernel so detection -> crop ->
recognition never leaves the device.

Execution strategy (TPU): XLA lowers dynamically-indexed gathers to a
serialized scalar loop (~15ms for 64 crops x 6200 px x 4 taps), so the
bilinear resampling is expressed as MXU matmuls instead:

1. slice a static ``(window_height, window_width)`` source window per
   crop (a batched ``dynamic_slice`` — contiguous, fast). When the quad's
   padded AABB exceeds the window, the window extraction itself is a
   separable one-hot-matmul downscale so the quad always fits; when it
   fits natively the "downscale" weights degenerate to exact one-hots
   (an integer translation), so the common case stays bit-exact.
2. the coupled perspective resampling is two one-hot matmul stages over
   the window: the 2-D bilinear kernel factorizes per output pixel as
   ``w_y(r) * w_x(c)``, giving ``T[p, r] = sum_c hat(wx_p - c) win[r, c]``
   (MXU) and ``out[p] = sum_r hat(wy_p - r) T[p, r]``.

Out-of-range hat taps simply have no column/row and contribute 0 — which
is exactly the reference's cv2 constant-border (0) semantics, so no
per-tap masking is needed.

Semantics parity notes (baked into tests vs tools.warpBox):
* corners re-ordered tl-tr-br-bl like ``tools.get_rotated_box`` (for
  boxes that are already rectangles the min-area-rect step is an identity,
  so only the imutils-style ordering matters),
* target width/height = int-truncated mean edge lengths; scale =
  min(target_w / w, target_h / h); the crop occupies the top-left
  ``(int(scale*h), int(scale*w))`` region of the (31, 200) canvas and the
  rest is ``cval`` (tools.py:95-114),
* out-of-image samples read 0 (cv2 constant border),
* quads whose padded AABB exceeds the source window (default 64 x 512 —
  beyond any word crop the 31 x 200 recognizer meaningfully resolves) are
  resampled through the window downscale: a double bilinear interpolation
  (mildly antialiased) instead of the reference's aliased point sampling.
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


def _hat(delta: jnp.ndarray) -> jnp.ndarray:
    """Bilinear interpolation weight: max(0, 1 - |delta|)."""
    return jnp.maximum(0.0, 1.0 - jnp.abs(delta))


@functools.partial(
    jax.jit,
    static_argnames=("target_height", "target_width", "window_height", "window_width"),
)
def warp_boxes(
    image: jnp.ndarray,
    boxes: jnp.ndarray,
    target_height: int = 31,
    target_width: int = 200,
    cval: float = 0.0,
    window_height: int = 64,
    window_width: int = 512,
) -> jnp.ndarray:
    """Crop every box of one image into a (target_height, target_width) canvas.

    Args:
        image: (H, W) or (H, W, C) float image.
        boxes: (N, 4, 2) float corner coordinates.
        window_height / window_width: static per-crop source window; quads
            whose (1px-padded) AABB fits are resampled bit-exactly, larger
            ones through a separable downscale (see module docstring).

    Returns:
        (N, target_height, target_width[, C]) float32 crops.
    """
    squeeze = image.ndim == 2
    if squeeze:
        image = image[..., None]
    height, width, _ = image.shape
    # Out-of-image taps must read 0: pad so every window slice is in range
    # and padding supplies the zeros.
    pad_h = max(window_height, height) - height
    pad_w = max(window_width, width) - width
    if pad_h or pad_w:
        image = jnp.pad(image, ((0, pad_h), (0, pad_w), (0, 0)))
    padded_h, padded_w, _ = image.shape

    src_rows = jnp.arange(padded_h, dtype=jnp.float32)
    src_cols = jnp.arange(padded_w, dtype=jnp.float32)
    win_rows = jnp.arange(window_height, dtype=jnp.float32)
    win_cols = jnp.arange(window_width, dtype=jnp.float32)

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

        # ---- source window: 1px-padded AABB of the ordered quad ----
        bx, by = box[:, 0], box[:, 1]
        x_start = jnp.clip(
            jnp.floor(bx.min()) - 1.0, 0.0, float(padded_w - window_width)
        )
        y_start = jnp.clip(
            jnp.floor(by.min()) - 1.0, 0.0, float(padded_h - window_height)
        )
        src_w = jnp.ceil(bx.max()) - jnp.floor(bx.min()) + 3.0
        src_h = jnp.ceil(by.max()) - jnp.floor(by.min()) + 3.0
        # Window sampling rate: identity (exact slice) when the AABB fits.
        rate_x = jnp.where(src_w <= window_width, 1.0, (window_width - 1.0) / src_w)
        rate_y = jnp.where(src_h <= window_height, 1.0, (window_height - 1.0) / src_h)

        # Separable window extraction: win = Wr @ image @ Wc^T. With
        # rate == 1 the hats sit on integers -> exact one-hot slice.
        w_r = _hat(y_start + win_rows[:, None] / rate_y - src_rows[None, :])
        w_c = _hat(x_start + win_cols[:, None] / rate_x - src_cols[None, :])
        strip = jnp.einsum("rh,hwc->rwc", w_r, image)  # (WH, Wp, C)
        win = jnp.einsum("rwc,xw->rxc", strip, w_c)  # (WH, WW, C)

        # ---- coupled perspective resample from the window (MXU) ----
        wx = (sx.reshape(-1) - x_start) * rate_x  # (P,) window-space coords
        wy = (sy.reshape(-1) - y_start) * rate_y
        w_x = _hat(wx[:, None] - win_cols[None, :])  # (P, WW)
        w_y = _hat(wy[:, None] - win_rows[None, :])  # (P, WH)
        t = jnp.einsum("px,rxc->prc", w_x, win)  # (P, WH, C)
        out = jnp.einsum("pr,prc->pc", w_y, t)  # (P, C)
        out = out.reshape(target_height, target_width, -1)

        # Only the top-left int(scale*w) x int(scale*h) region is the crop;
        # the remainder of the canvas is cval (tools.py:107-114).
        valid = (gx < jnp.floor(sw)) & (gy < jnp.floor(sh))
        return jnp.where(valid[..., None], out, cval)

    crops = jax.vmap(one)(boxes.astype(jnp.float32))
    if squeeze:
        crops = crops[..., 0]
    return crops.astype(jnp.float32)


# Source-window escalation ladder for the fused pipeline: quads whose
# padded AABB exceeds the current (height, width) window go through the
# antialiased downscale (see module docstring); the pipeline detects the
# overflow on device and relaunches at the next rung so the common case
# stays bit-exact without paying the big window's memory. At the ladder
# top the (measured, tests/test_warp.py) mildly-antialiased downscale is
# accepted: words wider than 2048 px exceed anything the 31x200
# recognizer input meaningfully resolves. Quantified at protocol level
# (test_warp_boxes_giant_crop_top_rung_bounded_error): for 0.9-3k px
# crops past the top rung, the final (31, 200) recognizer canvas — the
# exact array the recognizer consumes, including the zero padding that a
# squat crop letterboxes in — differs from the reference's exact
# point-sampled warp by MEAN 0.3-1.0 gray levels, p99 <= 10/255.
# Restricted to the valid crop content (the int(scale*h) x int(scale*w)
# region, excluding shared padding) the mean is ~2x higher (~2.2 gray
# levels for a 3000x200 crop; asserted <= 4.0 in the same test) — the
# canvas is itself a heavy downscale of such crops, so the intermediate
# antialiasing washes out either way.
WINDOW_LADDER = ((64, 512), (128, 1024), (256, 2048))


@functools.partial(
    jax.jit,
    static_argnames=(
        "target_height",
        "target_width",
        "window_height",
        "window_width",
        "word_chunk",
    ),
)
def warp_boxes_batch(
    images: jnp.ndarray,
    boxes: jnp.ndarray,
    target_height: int = 31,
    target_width: int = 200,
    window_height: int = 64,
    window_width: int = 512,
    word_chunk: int = 8,
) -> jnp.ndarray:
    """(B, H, W[, C]) images x (B, N, 4, 2) boxes -> (B, N, th, tw[, C]).

    ``word_chunk`` bounds HBM: the resampling one-hot matrices cost
    ~15-25 MB per (image x word) pair, so vmapping all B x N pairs at once
    peaks at ~10 GB for a 32-image x 16-word batch (the round-3 batch-32
    OOM). Words are instead processed ``word_chunk`` at a time through a
    ``lax.map`` loop whose buffers XLA reuses across iterations, capping
    the live set at B x word_chunk pairs. The loop is over words (never
    the batch), so per-chunk work stays wide enough for the MXU; 0 means
    no chunking.
    """
    fn = functools.partial(
        warp_boxes,
        target_height=target_height,
        target_width=target_width,
        window_height=window_height,
        window_width=window_width,
    )
    batch, num = boxes.shape[0], boxes.shape[1]
    if not word_chunk or num <= word_chunk:
        return jax.vmap(fn)(images, boxes)
    pad = -num % word_chunk
    if pad:
        boxes = jnp.concatenate(
            [boxes, jnp.zeros((batch, pad) + boxes.shape[2:], boxes.dtype)],
            axis=1,
        )
    k = (num + pad) // word_chunk
    chunks = jnp.moveaxis(
        boxes.reshape(batch, k, word_chunk, 4, 2), 1, 0
    )  # (K, B, chunk, 4, 2)
    crops = jax.lax.map(lambda cb: jax.vmap(fn)(images, cb), chunks)
    crops = jnp.moveaxis(crops, 0, 1).reshape(
        (batch, k * word_chunk) + crops.shape[3:]
    )
    return crops[:, :num]


def window_overflow(boxes: jnp.ndarray, mask: jnp.ndarray, window_height: int, window_width: int):
    """(B, N, 4, 2) boxes + validity -> (B,) bool: any valid quad's padded
    AABB exceeds the static source window (the warp_boxes downscale
    trigger; same +3 px padding as warp_boxes)."""
    bx = boxes[..., 0]
    by = boxes[..., 1]
    src_w = jnp.ceil(bx.max(-1)) - jnp.floor(bx.min(-1)) + 3.0
    src_h = jnp.ceil(by.max(-1)) - jnp.floor(by.min(-1)) + 3.0
    over = (src_w > window_width) | (src_h > window_height)
    return jnp.any(over & mask, axis=-1)
