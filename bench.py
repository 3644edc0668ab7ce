"""End-to-end benchmark: fused OCR pipeline latency/throughput at scale=2.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference's 417 ms/image sequential end-to-end latency at
scale=2 on a Tesla P4 (BASELINE.md; reference README.md:68,72).
vs_baseline = 417ms / our p50 (>1 means faster than the reference).

Protocol: 640x480 input images (COCO-Text-like), Pipeline(scale=2) ->
1280x960 on device, sequential single-image recognize() calls including
host pre/post-processing, p50 over the timed runs. Pretrained weights are
used when cached; otherwise random weights (identical compute).
"""

import json
import sys
import time

import numpy as np


def main():
    import jax.numpy as jnp

    # Importing keras_ocr_tpu points JAX's persistent compile cache at
    # ~/.cache/keras_ocr_tpu/xla_cache, so repeated bench runs skip the
    # cold XLA compile of the fused pipeline.

    from keras_ocr_tpu.detection import Detector
    from keras_ocr_tpu.recognition import Recognizer
    from keras_ocr_tpu.pipeline import Pipeline

    try:
        detector = Detector(compute_dtype=jnp.bfloat16)
        recognizer = Recognizer(compute_dtype=jnp.bfloat16)
    except Exception:  # no network/cache: bench with random weights
        import string

        detector = Detector(weights=None, compute_dtype=jnp.bfloat16)
        recognizer = Recognizer(
            weights=None,
            alphabet=string.digits + string.ascii_lowercase,
            compute_dtype=jnp.bfloat16,
        )
    pipeline = Pipeline(detector=detector, recognizer=recognizer, scale=2)

    rng = np.random.RandomState(0)
    images = [
        rng.randint(0, 255, size=(480, 640, 3), dtype="uint8") for _ in range(8)
    ]
    # Draw some text-like rectangles so post-processing has work to do.
    for image in images:
        for _ in range(12):
            x, y = rng.randint(0, 560), rng.randint(0, 440)
            w, h = rng.randint(30, 80), rng.randint(8, 20)
            image[y : y + h, x : x + w] = rng.randint(0, 60)

    # Warmup / compile.
    pipeline.recognize(images=[images[0]])

    # 24 timed runs: the tunneled runtime's RPC latency jitters by +-10ms
    # run-to-run, so a larger sample stabilizes the p50.
    times = []
    for i in range(24):
        start = time.perf_counter()
        pipeline.recognize(images=[images[i % len(images)]])
        times.append(time.perf_counter() - start)
    p50_ms = float(np.median(times) * 1000)
    baseline_ms = 417.0
    print(
        json.dumps(
            {
                "metric": "e2e_p50_latency_scale2_640x480",
                "value": round(p50_ms, 2),
                "unit": "ms/image",
                "vs_baseline": round(baseline_ms / p50_ms, 3),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
