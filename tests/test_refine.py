"""contours[0] multi-blob selection: device tier-2 vs the host oracle.

The reference rect-fits only the first contour of each component's dilated
segmap (/root/reference/keras_ocr/detection.py:267-273). The host oracle
(keras_ocr_tpu.detection.getBoxes + _first_contour_pixels) replicates that
exactly; these tests prove the device path (tier-1 dilated-blob census in
ops/postprocess.py + tier-2 windowed refinement in ops/refine.py) matches
it, including through Detector.detect's escalation ladder.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from keras_ocr_tpu import detection
from keras_ocr_tpu.ops import postprocess as postprocess_ops
from keras_ocr_tpu.ops import refine as refine_ops


def _multiblob_heatmap(rng, height=96, width=128, n_words=None):
    """Words whose segmap splits into islands that dilation does NOT
    re-merge: two text islands joined by a region where text and link BOTH
    exceed their thresholds (the overlap that detection.py:244-246
    removes), with a gap larger than the dilation radius."""
    text = np.zeros((height, width), "float32")
    link = np.zeros((height, width), "float32")
    n = rng.randint(1, 4) if n_words is None else n_words
    for _ in range(n):
        y = rng.randint(10, height - 14)
        x = rng.randint(8, width - 60)
        gap = rng.randint(14, 30)
        text[y : y + 6, x : x + 7] = 0.95
        text[y : y + 6, x + 7 + gap : x + 14 + gap] = 0.9
        text[y + 2 : y + 4, x + 7 : x + 7 + gap] = 0.45
        link[y + 2 : y + 4, x + 6 : x + 8 + gap] = 0.5
    return np.stack([text, link], -1)


def _canon(boxes):
    return np.array(sorted(boxes.tolist(), key=lambda b: (np.sum(b), b[0][0])))


def test_tier1_flags_only_true_multiblob_components():
    """Benign CRAFT-like maps (dilation re-merges the char islands) must
    NOT flag; constructed split words must."""
    import sys, os

    sys.path.insert(0, os.path.dirname(__file__))
    from test_postprocess import _synthetic_heatmap

    for seed in range(4):
        hm = _synthetic_heatmap(np.random.RandomState(seed))
        _, _, diag = postprocess_ops.get_boxes(jnp.asarray(hm[None]))
        assert int(np.asarray(diag["n_multiblob"])[0]) == 0, seed

    hm = _multiblob_heatmap(np.random.RandomState(0), n_words=2)
    _, _, diag = postprocess_ops.get_boxes(jnp.asarray(hm[None]))
    assert int(np.asarray(diag["n_multiblob"])[0]) == 2


@pytest.mark.parametrize("seed", range(8))
def test_refined_boxes_match_host_oracle(seed):
    """The acceptance bar from VERDICT r2: zero extent mismatches between
    the refined device boxes and the host oracle on multi-blob segmaps."""
    rng = np.random.RandomState(seed)
    hm = _multiblob_heatmap(rng)
    boxes, mask, diag = postprocess_ops.get_boxes(
        jnp.asarray(hm[None]), max_components=64
    )
    host = detection.getBoxes(hm[None])[0]
    if int(np.asarray(diag["n_multiblob"])[0]):
        boxes, ok, _ = refine_ops.refine_boxes(
            jnp.asarray(hm[None]), boxes, max_components=64
        )
        assert bool(np.asarray(ok)[0])
    dev = detection.boxes_from_mask(boxes, mask)[0]
    assert len(dev) == len(host)
    np.testing.assert_allclose(_canon(dev), _canon(host), atol=3.0)


def test_unrefined_tier1_box_is_superset_then_fixed():
    """Sanity on the gap itself: tier 1 alone produces a superset box on a
    split word; the refinement shrinks it to the oracle's contours[0]."""
    hm = _multiblob_heatmap(np.random.RandomState(3), n_words=1)
    boxes, mask, _ = postprocess_ops.get_boxes(
        jnp.asarray(hm[None]), max_components=64
    )
    tier1 = detection.boxes_from_mask(boxes, mask)[0]
    host = detection.getBoxes(hm[None])[0]
    assert len(tier1) == len(host) == 1
    # tier-1 spans both islands -> wider than the single-contour oracle box
    assert tier1[0][:, 0].max() - tier1[0][:, 0].min() > (
        host[0][:, 0].max() - host[0][:, 0].min() + 8
    )
    refined, ok, _ = refine_ops.refine_boxes(
        jnp.asarray(hm[None]), boxes, max_components=64
    )
    fixed = detection.boxes_from_mask(refined, mask)[0]
    np.testing.assert_allclose(_canon(fixed), _canon(host), atol=3.0)


def test_nested_blob_is_skipped_like_cv2():
    """A blob nested inside another blob's filled hole must never be
    selected (cv2 RETR_TREE: parents precede children), even when its
    raster rank is higher."""
    H, W = 64, 64
    text = np.zeros((H, W), "float32")
    link = np.zeros((H, W), "float32")
    # One component: a ring (outer blob with a hole) + an island inside the
    # hole + a second island far right; all joined into ONE 4-connected
    # component by overlap bridges that the segmap step removes.
    text[10:30, 10:30] = 0.95  # will become ring via overlap hole
    text[16:24, 16:24] = 0.45  # hole region: overlap removes it...
    link[15:25, 15:25] = 0.5  # ...because link is high there too
    text[18:22, 18:22] = 0.95  # island INSIDE the hole (overlap-free)
    link[17:23, 17:23] = 0.3  # keep island itself out of overlap? no:
    # overlap = text>0.4 & link>0.4 -> island (text .95, link .5) IS overlap
    # unless link lowered there:
    link[18:22, 18:22] = 0.35
    # bridge to a far island so the component is one but splits
    text[19:21, 30:50] = 0.45
    link[19:21, 29:51] = 0.5
    text[12:28, 50:58] = 0.9
    hm = np.stack([text, link], -1)

    host = detection.getBoxes(hm[None])[0]
    boxes, mask, diag = postprocess_ops.get_boxes(
        jnp.asarray(hm[None]), max_components=64
    )
    if int(np.asarray(diag["n_multiblob"])[0]):
        boxes, ok, _ = refine_ops.refine_boxes(
            jnp.asarray(hm[None]), boxes, max_components=64
        )
        assert bool(np.asarray(ok)[0])
    dev = detection.boxes_from_mask(boxes, mask)[0]
    assert len(dev) == len(host)
    np.testing.assert_allclose(_canon(dev), _canon(host), atol=3.0)


def test_detector_detect_runs_the_refine_ladder():
    """End-to-end Detector.detect on a multi-blob scene equals the host
    oracle path (use_device_postprocess=False)."""
    hm = _multiblob_heatmap(np.random.RandomState(5), n_words=3)
    detector = detection.Detector(weights=None)
    detector._forward = lambda variables, x: jnp.asarray(hm[None])
    dummy = np.zeros((hm.shape[0] * 2, hm.shape[1] * 2, 3), "uint8")
    dev = detector.detect(images=[dummy])[0]
    host = detector.detect(images=[dummy], use_device_postprocess=False)[0]
    assert len(dev) == len(host)
    np.testing.assert_allclose(_canon(dev), _canon(host), atol=3.0)


@pytest.mark.slow
def test_refine_escalates_past_small_window():
    """A flagged component wider than the first ladder window must report
    refine_ok=False there and succeed at a higher level (the escalation
    contract Detector.detect relies on)."""
    H, W = 200, 640
    text = np.zeros((H, W), "float32")
    link = np.zeros((H, W), "float32")
    # One huge word spanning > 512 columns, split in the middle.
    text[80:140, 10:300] = 0.95
    text[80:140, 340:630] = 0.9
    text[100:120, 300:340] = 0.45
    link[100:120, 295:345] = 0.5
    hm = np.stack([text, link], -1)
    boxes, mask, diag = postprocess_ops.get_boxes(
        jnp.asarray(hm[None]), max_components=64
    )
    assert int(np.asarray(diag["n_multiblob"])[0]) >= 1
    wh, ww, md, it, rc = refine_ops.LADDER[0]
    _, ok0, _ = refine_ops.refine_boxes(
        jnp.asarray(hm[None]), boxes, max_components=64,
        refine_cap=rc, window_h=wh, window_w=ww, max_dilate=md, num_iters=it,
    )
    assert not bool(np.asarray(ok0)[0])  # ROI wider than 512
    wh, ww, md, it, rc = refine_ops.LADDER[1]
    refined, ok1, _ = refine_ops.refine_boxes(
        jnp.asarray(hm[None]), boxes, max_components=64,
        refine_cap=rc, window_h=wh, window_w=ww, max_dilate=md, num_iters=it,
    )
    assert bool(np.asarray(ok1)[0])
    host = detection.getBoxes(hm[None])[0]
    dev = detection.boxes_from_mask(refined, mask)[0]
    assert len(dev) == len(host)
    np.testing.assert_allclose(_canon(dev), _canon(host), atol=4.0)
