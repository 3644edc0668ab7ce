"""Per-stage latency breakdown of the fused pipeline on the real chip.

Times cumulative prefixes of the device program (upload-only, CRAFT,
+get_boxes, +warp crops, +CRNN+CTC) by fetching a scalar sum of each
prefix's output — so download cost stays constant (~4 bytes) and the
difference between consecutive prefixes isolates one stage's compute.

Each prefix is its own XLA compile (~5 min first run on the tunneled
TPU); run in the background. Prints one JSON line per stage.
"""

import json
import sys
import time

import os as _os
import sys as _sys

# Make the in-repo package importable when run as `python scripts/<name>.py`
# without a pip install (sys.path[0] is scripts/, not the repo root).
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np


def main():
    import argparse

    argparse.ArgumentParser(description=__doc__).parse_args()

    import jax
    import jax.numpy as jnp

    from keras_ocr_tpu.detection import Detector
    from keras_ocr_tpu.recognition import Recognizer
    from keras_ocr_tpu.ops import ctc as ctc_ops
    from keras_ocr_tpu.ops import postprocess as postprocess_ops
    from keras_ocr_tpu.ops.image import compute_input, resize_bilinear, rgb_to_grayscale
    from keras_ocr_tpu.ops.warp import warp_boxes_batch

    try:
        detector = Detector(compute_dtype=jnp.bfloat16)
        recognizer = Recognizer(compute_dtype=jnp.bfloat16)
    except Exception:
        import string

        detector = Detector(weights=None, compute_dtype=jnp.bfloat16)
        recognizer = Recognizer(
            weights=None,
            alphabet=string.digits + string.ascii_lowercase,
            compute_dtype=jnp.bfloat16,
        )

    rng = np.random.RandomState(0)
    image = rng.randint(0, 255, size=(480, 640, 3), dtype="uint8")
    for _ in range(12):
        x, y = rng.randint(0, 560), rng.randint(0, 440)
        w, h = rng.randint(30, 80), rng.randint(8, 20)
        image[y : y + h, x : x + w] = rng.randint(0, 60)
    batch_np = image[None]

    det_vars = detector.variables
    rec_vars = recognizer.variables
    max_components = detector.max_components
    max_words = 64
    rec_h, rec_w, _ = recognizer.input_shape

    def stage_upload(images):
        return jnp.sum(images.astype(jnp.float32))

    def _front(images):
        images = images.astype(jnp.float32)
        images = resize_bilinear(images, 960, 1280)
        x = compute_input(images)
        return images, detector.model.apply(det_vars, x, train=False)

    def stage_craft(images):
        _, heatmaps = _front(images)
        return jnp.sum(heatmaps.astype(jnp.float32))

    def _boxes(images):
        images, heatmaps = _front(images)
        boxes, mask, _ = postprocess_ops.get_boxes(heatmaps, max_components=max_components)
        order = jnp.argsort(~mask, axis=1, stable=True)[:, :max_words]
        boxes_c = jnp.take_along_axis(boxes, order[..., None, None], axis=1)
        mask_c = jnp.take_along_axis(mask, order, axis=1)
        return images, boxes_c, mask_c

    def stage_boxes(images):
        _, boxes_c, mask_c = _boxes(images)
        return jnp.sum(boxes_c) + jnp.sum(mask_c)

    def _crops(images):
        images, boxes_c, mask_c = _boxes(images)
        gray = jnp.rint(jnp.clip(rgb_to_grayscale(images), 0, 255))
        crops = warp_boxes_batch(gray, boxes_c, target_height=rec_h, target_width=rec_w)
        return (crops / 255.0)[..., None], boxes_c, mask_c

    def stage_crops(images):
        crops, _, _ = _crops(images)
        return jnp.sum(crops)

    def stage_full(images):
        crops, boxes_c, mask_c = _crops(images)
        b, w = crops.shape[0], crops.shape[1]
        probs = recognizer.model.apply(
            rec_vars, crops.reshape((b * w,) + crops.shape[2:]), train=False
        )
        decoded = ctc_ops.ctc_greedy_decode(probs)
        return jnp.sum(decoded) + jnp.sum(boxes_c) + jnp.sum(mask_c)

    stages = [
        ("upload_only", stage_upload),
        ("craft_fwd", stage_craft),
        ("plus_get_boxes", stage_boxes),
        ("plus_warp_crops", stage_crops),
        ("plus_crnn_ctc", stage_full),
    ]
    results = {}
    for name, fn in stages:
        jitted = jax.jit(fn)
        t0 = time.perf_counter()
        np.asarray(jitted(jnp.asarray(batch_np)))  # compile + run
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(30):
            start = time.perf_counter()
            np.asarray(jitted(jnp.asarray(batch_np)))
            times.append(time.perf_counter() - start)
        p50 = float(np.median(times) * 1000)
        mn = float(np.min(times) * 1000)
        results[name] = mn
        print(
            json.dumps({"stage": name, "min_ms": round(mn, 2), "p50_ms": round(p50, 2), "compile_s": round(compile_s, 1)}),
            flush=True,
        )

    keys = [k for k, _ in stages]
    for prev, cur in zip(keys, keys[1:]):
        print(
            json.dumps({"delta": f"{cur}-{prev}", "min_ms": round(results[cur] - results[prev], 2)}),
            flush=True,
        )


if __name__ == "__main__":
    sys.exit(main())
