"""Batched throughput benchmark: images/sec/chip at scale=2.

Complements bench.py (sequential single-image p50 latency — the
reference's protocol) with the serving-oriented metric from BASELINE.md:
batched images/sec on one chip. The batch amortizes the tunneled
runtime's per-call RPC floor; on local chips it amortizes dispatch.

Run: python scripts/bench_throughput.py [--batch-size 8] [--iters 6]
"""

import argparse
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
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--iters", type=int, default=6)
    args = parser.parse_args()

    import jax.numpy as jnp

    from keras_ocr_tpu.detection import Detector
    from keras_ocr_tpu.recognition import Recognizer
    from keras_ocr_tpu.pipeline import Pipeline

    try:
        detector = Detector(compute_dtype=jnp.bfloat16)
        recognizer = Recognizer(compute_dtype=jnp.bfloat16)
    except Exception:  # no network/cache: random weights, identical compute
        import string

        detector = Detector(weights=None, compute_dtype=jnp.bfloat16)
        recognizer = Recognizer(
            weights=None,
            alphabet=string.digits + string.ascii_lowercase,
            compute_dtype=jnp.bfloat16,
        )
    pipeline = Pipeline(detector=detector, recognizer=recognizer, scale=2)

    rng = np.random.RandomState(0)
    batches = []
    for _ in range(2):
        images = []
        for _ in range(args.batch_size):
            image = rng.randint(0, 255, size=(480, 640, 3), dtype="uint8")
            for _ in range(12):
                x, y = rng.randint(0, 560), rng.randint(0, 440)
                w, h = rng.randint(30, 80), rng.randint(8, 20)
                image[y : y + h, x : x + w] = rng.randint(0, 60)
            images.append(image)
        batches.append(images)

    pipeline.recognize(images=batches[0])  # warmup/compile

    times = []
    for i in range(args.iters):
        start = time.perf_counter()
        pipeline.recognize(images=batches[i % 2])
        times.append(time.perf_counter() - start)
    p50 = float(np.median(times))

    # Pipelined mode: recognize_many keeps queue_depth fused programs in
    # flight so host prep + upload of batch i+1 hides under batch i's
    # device compute (identical results).
    stream = batches[0] + batches[1] + batches[0] + batches[1]
    pipeline.recognize_many(stream, batch_size=args.batch_size)  # warm sticky
    start = time.perf_counter()
    out = pipeline.recognize_many(stream, batch_size=args.batch_size)
    pipelined_s = time.perf_counter() - start
    assert len(out) == len(stream)
    pipelined_rate = len(stream) / pipelined_s

    print(
        json.dumps(
            {
                "metric": "throughput_scale2_640x480",
                "value": round(max(args.batch_size / p50, pipelined_rate), 2),
                "unit": "images/sec/chip",
                "batch_size": args.batch_size,
                "p50_batch_ms": round(p50 * 1000, 2),
                "batched_rate": round(args.batch_size / p50, 2),
                "pipelined_rate": round(pipelined_rate, 2),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
