"""Windowed contours[0] refinement for multi-blob components (tier 2).

The reference rect-fits only the FIRST contour that ``cv2.findContours``
returns on each component's dilated segmap
(/root/reference/keras_ocr/detection.py:267-273): among top-level blobs
(those not nested inside another blob's filled hole) the one whose
topmost-leftmost pixel comes LAST in raster order. Tier 1
(:func:`keras_ocr_tpu.ops.postprocess.get_boxes`) fits the whole dilated
set — exact whenever that set is ONE blob, which its dilated-blob census
proves per component. The rare flagged components (measured ~1/25 real
heatmaps have any) are re-fit here, exactly:

* each flagged component gets a static window around its reference ROI
  (detection.py:258-264), extracted with ``dynamic_slice`` — windows are
  per-component, so inter-component contention cannot occur;
* the segmap is re-dilated inside the window by unit-shift steps (the
  exact cv2 ``(1+niter)`` square with its asymmetric anchor), intersected
  with the ROI;
* blobs are labeled 8-connected; the border-connected background (4-conn,
  cv2's background duality / scipy ``binary_fill_holes`` semantics) marks
  which blobs are top-level: a blob is top-level iff the pixel above its
  raster-first (= root) pixel is border-connected background or the blob
  starts at the ROI's top row — a blob nested in a hole sees hole
  background there instead;
* the top-level blob with the maximal root index (reverse raster
  discovery = ``contours[0]``) is selected, and the rectangle bank fit
  runs on just its pixels.

Every step carries a proof obligation: window covers the ROI, dilation
budget suffices, both propagations converged. ``refine_ok`` is False when
any fails (or more components are flagged than ``refine_cap``); callers
escalate the (window, iterations, cap) ladder and finally fall back to
the exact host oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .cc import _shift2, flood_from_seeds, label_components_8conn
from .postprocess import _BIG, boxes_from_bank_extents, component_analysis


def _dynamic_shift(mask, distance, axis, reverse):
    """Bring the element ``distance`` positions behind (ahead if reverse)
    along ``axis``; ``distance`` may be traced. Wrapped lanes are cleared."""
    size = mask.shape[axis]
    idx = jnp.arange(size)
    idx = idx.reshape((-1, 1) if axis == 0 else (1, -1))
    if reverse:
        rolled = jnp.roll(mask, -distance, axis=axis)
        return rolled & (idx < size - distance)
    rolled = jnp.roll(mask, distance, axis=axis)
    return rolled & (idx >= distance)


def _grow_dynamic(mask, amount, axis, reverse, n_bits):
    """Grow ``mask`` by a TRACED ``amount`` of pixels in one direction.

    Doubling with the step rule d = min(r + 1, amount - r): a set already
    grown by r unioned with itself shifted by d <= r + 1 is grown by
    r + d (no gaps), so growth reaches ``amount`` in O(log) steps.
    """
    grown = mask
    r = jnp.zeros((), jnp.int32)
    for _ in range(n_bits):
        d = jnp.clip(jnp.minimum(r + 1, amount - r), 0, None)
        grown = grown | _dynamic_shift(grown, d, axis, reverse)
        r = r + d
    return grown

# Escalation ladder for Detector/Pipeline callers: (window_h, window_w,
# max_dilate, num_iters, refine_cap). Window dims are clamped to the
# heatmap by the callers; the last level always covers (full heatmap).
LADDER = (
    (128, 512, 32, 16, 8),
    (512, 1024, 64, 32, 16),
    (4096, 4096, 128, 64, 32),
)


@functools.partial(
    jax.jit,
    static_argnames=(
        "detection_threshold",
        "text_threshold",
        "link_threshold",
        "size_threshold",
        "max_components",
        "num_angles",
        "num_sweeps",
        "refine_cap",
        "window_h",
        "window_w",
        "max_dilate",
        "num_iters",
    ),
)
def refine_boxes(
    heatmaps,
    boxes,
    detection_threshold: float = 0.7,
    text_threshold: float = 0.4,
    link_threshold: float = 0.4,
    size_threshold: int = 10,
    max_components: int = 256,
    num_angles: int = 36,
    num_sweeps: int = 8,
    refine_cap: int = 8,
    window_h: int = 128,
    window_w: int = 512,
    max_dilate: int = 32,
    num_iters: int = 16,
):
    """Replace flagged components' tier-1 boxes with exact contours[0] fits.

    Args:
        heatmaps: (B, H, W, 2) CRAFT heatmaps (same array tier 1 saw).
        boxes: (B, max_components, 4, 2) tier-1 boxes to patch.

    Returns:
        boxes: patched (B, max_components, 4, 2).
        refine_ok: (B,) bool — every flagged component in this image was
            refined with all proofs holding; False demands escalation.
        n_flagged: (B,) int32 — flagged component count (may exceed
            ``refine_cap``).
    """
    height = heatmaps.shape[1]
    width = heatmaps.shape[2]
    window_h = min(window_h, height)
    window_w = min(window_w, width)

    def single(hm, image_boxes):
        return _refine_single(
            hm,
            image_boxes,
            detection_threshold,
            text_threshold,
            link_threshold,
            size_threshold,
            max_components,
            num_angles,
            num_sweeps,
            refine_cap,
            window_h,
            window_w,
            max_dilate,
            num_iters,
        )

    return jax.vmap(single)(heatmaps, boxes)


def _refine_single(
    hm,
    boxes_in,
    detection_threshold,
    text_threshold,
    link_threshold,
    size_threshold,
    max_components,
    num_angles,
    num_sweeps,
    refine_cap,
    window_h,
    window_w,
    max_dilate,
    num_iters,
):
    height, width = hm.shape[0], hm.shape[1]
    analysis = component_analysis(
        hm,
        detection_threshold,
        text_threshold,
        link_threshold,
        size_threshold,
        max_components,
        num_sweeps=num_sweeps,
        per_component_census=True,
    )
    need = analysis["valid0"] & (analysis["n_dilblobs"] > 1.5)  # (C,)
    n_flagged = jnp.sum(need.astype(jnp.int32))
    order = jnp.argsort(~need, stable=True)  # flagged first, by comp id
    slot_comp = order[:refine_cap]  # (R,)
    slot_active = jnp.take(need, slot_comp)

    def take(name):
        return jnp.take(analysis[name], slot_comp)

    comp_plane = analysis["comp"]
    ov_plane = analysis["overlap"].astype(jnp.int32)

    # Reference ROI (detection.py:258-264 window around the component).
    niter = take("niter")
    sx = jnp.maximum(take("xmin") - niter, 0.0)
    sy = jnp.maximum(take("ymin") - niter, 0.0)
    ex = jnp.minimum(take("xmax") + niter + 2.0, float(width))
    ey = jnp.minimum(take("ymax") + niter + 2.0, float(height))
    a_c = take("a")
    b_c = take("b")

    refined, slot_ok = jax.vmap(
        _refine_one,
        in_axes=(0,) * 7 + (None,) * 7,
    )(
        slot_comp,
        sx,
        sy,
        ex,
        ey,
        a_c,
        b_c,
        comp_plane,
        ov_plane,
        window_h,
        window_w,
        max_dilate,
        num_iters,
        num_angles,
    )

    use = slot_active & slot_ok
    orig_rows = jnp.take(boxes_in, slot_comp, axis=0)  # (R, 4, 2)
    new_rows = jnp.where(use[:, None, None], refined, orig_rows)
    boxes_out = boxes_in.at[slot_comp].set(new_rows)
    refine_ok = jnp.all(slot_ok | ~slot_active) & (n_flagged <= refine_cap)
    return boxes_out, refine_ok, n_flagged


def _refine_one(
    c,
    sx,
    sy,
    ex,
    ey,
    a_c,
    b_c,
    comp_plane,
    ov_plane,
    window_h,
    window_w,
    max_dilate,
    num_iters,
    num_angles,
):
    height, width = comp_plane.shape

    fits = (
        (ey - sy <= window_h)
        & (ex - sx <= window_w)
        & (a_c <= max_dilate)
        & (b_c <= max_dilate)
    )
    oy = jnp.clip(sy.astype(jnp.int32), 0, max(height - window_h, 0))
    ox = jnp.clip(sx.astype(jnp.int32), 0, max(width - window_w, 0))
    comp_w = jax.lax.dynamic_slice(comp_plane, (oy, ox), (window_h, window_w))
    ov_w = jax.lax.dynamic_slice(ov_plane, (oy, ox), (window_h, window_w))

    abs_r = (oy + jnp.arange(window_h, dtype=jnp.int32)).astype(jnp.float32)
    abs_c = (ox + jnp.arange(window_w, dtype=jnp.int32)).astype(jnp.float32)
    roi = ((abs_r >= sy) & (abs_r < ey))[:, None] & (
        (abs_c >= sx) & (abs_c < ex)
    )[None, :]
    seg = (comp_w == c) & (ov_w == 0) & roi

    # cv2 square dilation: grow a_c toward +x/+y, b_c toward -x/-y
    # (detection.py:258-264 anchor geometry), then restrict to the ROI
    # exactly as the reference does (dilated &= roi). The per-component
    # growth amounts are traced, so each direction uses O(log max_dilate)
    # dynamic shifts (see _grow_dynamic).
    n_bits = max(1, max_dilate.bit_length())
    a_i = a_c.astype(jnp.int32)
    b_i = b_c.astype(jnp.int32)
    m = seg
    m = _grow_dynamic(m, a_i, axis=1, reverse=False, n_bits=n_bits)
    m = _grow_dynamic(m, b_i, axis=1, reverse=True, n_bits=n_bits)
    m = _grow_dynamic(m, a_i, axis=0, reverse=False, n_bits=n_bits)
    m = _grow_dynamic(m, b_i, axis=0, reverse=True, n_bits=n_bits)
    m = m & roi

    label, conv8 = label_components_8conn(
        m, num_sweeps=num_iters, check_convergence=True
    )
    bg = ~m
    border = jnp.zeros((window_h, window_w), bool)
    border = border.at[0, :].set(True).at[-1, :].set(True)
    border = border.at[:, 0].set(True).at[:, -1].set(True)
    seeds = bg & (~roi | border)
    b0, conv_flood = flood_from_seeds(
        bg, seeds, num_sweeps=num_iters, check_convergence=True
    )

    wi = jnp.arange(window_h * window_w, dtype=jnp.int32).reshape(
        window_h, window_w
    )
    is_root = (label == wi) & m
    above_b0 = _shift2(b0.astype(jnp.int32), 1, 0, 0) == 1
    top_ok = (abs_r == sy)[:, None] | above_b0
    top_roots = is_root & top_ok
    chosen = jnp.max(jnp.where(top_roots, wi, -1))
    sel = m & (label == chosen)

    # Rectangle bank fit on just the selected blob's pixels.
    present_r = jnp.any(sel, axis=1)  # (Wh,)
    colsf = abs_c[None, :]
    rxmin = jnp.min(jnp.where(sel, colsf, _BIG), axis=1)
    rxmax = jnp.max(jnp.where(sel, colsf, -_BIG), axis=1)
    yabs = abs_r

    alphas = jnp.arange(num_angles, dtype=jnp.float32) * (
        jnp.pi / 2.0 / num_angles
    )
    cos_k = jnp.cos(alphas)
    sin_k = jnp.sin(alphas)
    pm = present_r[:, None]
    umax = jnp.max(
        jnp.where(pm, rxmax[:, None] * cos_k + yabs[:, None] * sin_k, -_BIG), 0
    )
    umin = jnp.min(
        jnp.where(pm, rxmin[:, None] * cos_k + yabs[:, None] * sin_k, _BIG), 0
    )
    vmax = jnp.max(
        jnp.where(pm, -rxmin[:, None] * sin_k + yabs[:, None] * cos_k, -_BIG), 0
    )
    vmin = jnp.min(
        jnp.where(pm, -rxmax[:, None] * sin_k + yabs[:, None] * cos_k, _BIG), 0
    )
    left = jnp.min(jnp.where(present_r, rxmin, _BIG))
    right = jnp.max(jnp.where(present_r, rxmax, -_BIG))
    top = jnp.min(jnp.where(present_r, yabs, _BIG))
    bottom = jnp.max(jnp.where(present_r, yabs, -_BIG))

    box = boxes_from_bank_extents(
        umin[None],
        umax[None],
        vmin[None],
        vmax[None],
        cos_k,
        sin_k,
        left[None],
        top[None],
        right[None],
        bottom[None],
    )[0] * 2.0

    ok = fits & conv8 & conv_flood & (chosen >= 0)
    return box.astype(jnp.float32), ok
