"""A/B: on-device getBoxes vs the host oracle on realistic heatmaps.

Quantifies the device post-processing approximations flagged in round 1
(VERDICT "What's weak" #4): the static angle bank and the multi-blob
(``contours[0]``) discrepancy, now that the analytic dilation is
border-clipped (exact). Two heatmap populations:

1. GT maps built by ``compute_maps`` from synthetic scenes — the exact
   distribution the detector is trained to emit (reference
   detection.py:106-198 semantics), including words clipped at borders.
2. Gaussian char/link bump fields like the kernel oracle tests, at
   several canvas sizes and rotations.

Reports, per population and overall:

* matched-box IoU distribution (mean / p10 / min),
* box-count agreement,
* geometric protocol P/R of device boxes scored against host-oracle
  boxes as ground truth at the benchmark's IoU >= 0.5 threshold,
* incidence of multi-blob dilated segmaps (where the reference's
  ``contours[0]`` pick could diverge from the all-pixels fit both this
  host oracle and the device kernel use).

Run: python scripts/ab_postprocess.py [--scenes N] [--out results.json]
"""

import argparse
import json
import string

import numpy as np

import jax.numpy as jnp

from scipy import ndimage

import os
import sys

# Make the in-repo package importable when run as `python scripts/<name>.py`
# without a pip install (sys.path[0] is scripts/, not the repo root).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from keras_ocr_tpu import detection, evaluation
from keras_ocr_tpu.data import generation
from keras_ocr_tpu.data.detection_targets import compute_maps
from keras_ocr_tpu.ops import postprocess as postprocess_ops
from keras_ocr_tpu.ops import refine as refine_ops


def synthetic_scene_heatmaps(n_scenes, height=256, width=320, seed=0):
    """GT text/link maps from rendered scenes (the trained-detector target)."""
    rng = np.random.RandomState(seed)
    np.random.seed(seed)
    alphabet = string.ascii_lowercase + " "
    text_gen = generation.get_text_generator(alphabet=alphabet, lowercase=True)
    image_gen = generation.get_image_generator(
        height=height,
        width=width,
        font_groups={alphabet: [None]},
        text_generator=text_gen,
        font_size=(14, 28),
        rotationZ=(-15, 15),
        margin=rng.randint(0, 8),
    )
    template = detection.get_gaussian_heatmap(size=512, distanceRatio=1.5)
    heatmaps = []
    for _ in range(n_scenes):
        _, lines = next(image_gen)
        hm = compute_maps(
            heatmap=template, image_height=height, image_width=width, lines=lines
        )
        heatmaps.append(hm)
    return heatmaps


def bump_heatmaps(n_maps, seed=0):
    """Gaussian char bumps along rotated lines, some clipped at borders."""
    rng = np.random.RandomState(seed)
    heatmaps = []
    for index in range(n_maps):
        height = int(rng.choice([96, 128, 192]))
        width = int(rng.choice([128, 192, 256]))
        textmap = np.zeros((height, width), dtype="float32")
        linkmap = np.zeros_like(textmap)
        yy, xx = np.mgrid[0:height, 0:width]
        near_border = index % 3 == 0  # every third map hugs the border
        for _ in range(rng.randint(2, 6)):
            n_chars = rng.randint(3, 8)
            if near_border:
                cx = rng.choice([rng.uniform(0, 12), rng.uniform(width - 12, width)])
                cy = rng.uniform(0, height)
            else:
                cx = rng.uniform(20, width - 20)
                cy = rng.uniform(15, height - 15)
            angle = rng.uniform(-0.7, 0.7)
            spacing = rng.uniform(6, 11)
            sigma = rng.uniform(2.0, 4.0)
            for i in range(n_chars):
                t = (i - (n_chars - 1) / 2) * spacing
                px, py = cx + t * np.cos(angle), cy + t * np.sin(angle)
                bump = np.exp(-((xx - px) ** 2 + (yy - py) ** 2) / (2 * sigma**2))
                textmap = np.maximum(textmap, 0.95 * bump.astype("float32"))
                if i:
                    lx = cx + (t - spacing / 2) * np.cos(angle)
                    ly = cy + (t - spacing / 2) * np.sin(angle)
                    lbump = np.exp(
                        -((xx - lx) ** 2 + (yy - ly) ** 2) / (2 * sigma**2)
                    )
                    linkmap = np.maximum(linkmap, 0.85 * lbump.astype("float32"))
        heatmaps.append(np.stack([textmap, linkmap], axis=-1))
    return heatmaps


def multiblob_heatmaps(n_maps, seed=0):
    """Words whose segmap splits into islands that dilation does NOT
    re-merge (text islands joined by an overlap bridge, gap > dilation
    radius) — the population where the reference's ``contours[0]`` pick
    diverges from a whole-set fit. Exercises the tier-2 refinement."""
    rng = np.random.RandomState(seed)
    heatmaps = []
    for _ in range(n_maps):
        height = int(rng.choice([96, 128]))
        width = int(rng.choice([128, 192]))
        text = np.zeros((height, width), "float32")
        link = np.zeros_like(text)
        for _ in range(rng.randint(1, 4)):
            y = rng.randint(8, height - 16)
            x = rng.randint(6, width - 64)
            gap = rng.randint(14, 30)
            text[y : y + 6, x : x + 7] = 0.95
            text[y : y + 6, x + 7 + gap : x + 14 + gap] = 0.9
            text[y + 2 : y + 4, x + 7 : x + 7 + gap] = 0.45
            link[y + 2 : y + 4, x + 6 : x + 8 + gap] = 0.5
        heatmaps.append(np.stack([text, link], -1))
    return heatmaps


def count_multiblob_segmaps(hm):
    """How many surviving components split into >1 blob after dilation.

    Reproduces the oracle's per-component loop and counts the cases where
    the reference's ``contours[0]`` choice is ambiguous.
    """
    four = [[0, 1, 0], [1, 1, 1], [0, 1, 0]]
    textmap, linkmap = hm[..., 0], hm[..., 1]
    text_score = textmap > 0.4
    link_score = linkmap > 0.4
    labels, n = ndimage.label(text_score | link_score, structure=four)
    split = total = 0
    for component_id in range(1, n + 1):
        mask = labels == component_id
        size = int(mask.sum())
        if size < 10 or textmap[mask].max() < 0.7:
            continue
        total += 1
        segmap = mask & ~(link_score & text_score)
        ys, xs = np.nonzero(mask)
        w = xs.max() - xs.min() + 1
        h = ys.max() - ys.min() + 1
        niter = int(np.sqrt(size * min(w, h) / (w * h)) * 2)
        dilated = detection._dilate_cv2_style(segmap, niter)
        _, blobs = ndimage.label(dilated, structure=np.ones((3, 3)))
        if blobs > 1:
            split += 1
    return split, total


def run_population(name, heatmaps, results):
    ious = []
    count_mismatch = 0
    true_annotations = {}
    predictions = {}
    split = total = 0
    extent_mismatch_boxes = 0
    refined_images = 0
    for index, hm in enumerate(heatmaps):
        host = detection.getBoxes(hm[None])[0]
        boxes, mask, diag = postprocess_ops.get_boxes(
            jnp.asarray(hm[None]), max_components=128
        )
        # The production escalation: flagged multi-blob components get the
        # tier-2 contours[0] refinement (as Detector.detect does).
        if int(np.asarray(diag["n_multiblob"])[0]) > 0:
            refined_images += 1
            for wh, ww, md, it, rc in refine_ops.LADDER:
                boxes, ok, _ = refine_ops.refine_boxes(
                    jnp.asarray(hm[None]), boxes, max_components=128,
                    refine_cap=rc, window_h=wh, window_w=ww,
                    max_dilate=md, num_iters=it,
                )
                if bool(np.asarray(ok)[0]):
                    break
        device = detection.boxes_from_mask(boxes, mask)[0]
        s, t = count_multiblob_segmaps(hm)
        split += s
        total += t
        if len(device) != len(host):
            count_mismatch += 1
        key = f"{name}-{index}"
        true_annotations[key] = [
            {"text": "word", "vertices": b, "ignore": False} for b in host
        ]
        predictions[key] = [{"text": "word", "vertices": b} for b in device]
        for hb in host:
            best, best_db = 0.0, None
            for db in device:
                iou = evaluation.iou_score(hb, db)
                if iou >= best:
                    best, best_db = iou, db
            ious.append(best)
            # Extent mismatch: matched device box's axis-aligned extents
            # differ from the host oracle's by more than the angle-bank
            # tolerance (the VERDICT r2 acceptance signal).
            if best_db is None or np.abs(
                np.concatenate([
                    best_db.min(0) - hb.min(0), best_db.max(0) - hb.max(0)
                ])
            ).max() > 2.5:
                extent_mismatch_boxes += 1
    _, (precision, recall) = evaluation.score(
        true=true_annotations, pred=predictions
    )
    ious = np.array(ious) if ious else np.array([np.nan])
    results[name] = {
        "n_heatmaps": len(heatmaps),
        "n_host_boxes": int(np.sum(np.isfinite(ious))),
        "iou_mean": float(np.nanmean(ious)),
        "iou_p10": float(np.nanpercentile(ious, 10)),
        "iou_min": float(np.nanmin(ious)),
        "box_count_mismatch_images": count_mismatch,
        "protocol_precision_vs_host": float(precision),
        "protocol_recall_vs_host": float(recall),
        "multiblob_segmaps": split,
        "surviving_components": total,
        "refined_images": refined_images,
        "extent_mismatch_boxes": extent_mismatch_boxes,
    }
    return results


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--scenes", type=int, default=40)
    parser.add_argument("--bumps", type=int, default=40)
    parser.add_argument("--out", default="ab_postprocess_results.json")
    args = parser.parse_args()

    results = {}
    run_population(
        "gt_maps", synthetic_scene_heatmaps(args.scenes), results
    )
    run_population("bump_maps", bump_heatmaps(args.bumps), results)
    run_population(
        "multiblob_maps", multiblob_heatmaps(args.bumps), results
    )
    print(json.dumps(results, indent=2))
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
