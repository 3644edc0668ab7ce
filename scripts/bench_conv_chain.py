"""Benchmark the fused conv-chain Pallas kernel vs XLA on CRAFT shapes.

Each candidate is applied to REPS distinct stacked inputs via lax.scan
(nothing hoists, no artificial carry arithmetic); cost = (total - floor)
/ REPS. Inputs/outputs stream HBM like they do inside the real model.

Usage: python scripts/bench_conv_chain.py [tile_h ...]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

import os
import sys

# Make the in-repo package importable when run as `python scripts/<name>.py`
# without a pip install (sys.path[0] is scripts/, not the repo root).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from keras_ocr_tpu.ops.conv_pallas import conv_chain

REPS = 16


def timed(fn, *args):
    fn_j = jax.jit(fn)
    out = fn_j(*args)
    jax.block_until_ready(out)
    best = np.inf
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(fn_j(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def scan_over(step, xs):
    def fn(xs):
        _, ys = jax.lax.scan(lambda c, x: (c, step(x)), 0, xs)
        return ys

    return fn, xs


def floor_time():
    xs = jnp.zeros((REPS, 8, 128), jnp.bfloat16)
    fn, xs = scan_over(lambda x: x + 1, xs)
    return timed(fn, xs)


def main():
    if any(a in ("-h", "--help") for a in sys.argv[1:]):
        print(__doc__)
        return 0
    tile_hs = [int(a) for a in sys.argv[1:]] or [16, 32]
    print("devices:", jax.devices())
    f = floor_time()
    print(f"floor: {f*1e3:.2f} ms")

    # (name, H, W, chain plan [(k, cin, cout, relu)], pool)
    cases = [
        ("C1 960x1280 3>64>64 pool", 960, 1280, [(3, 3, 64, 1), (3, 64, 64, 1)], True),
        ("C2 480x640 64>128>128 pool", 480, 640, [(3, 64, 128, 1), (3, 128, 128, 1)], True),
        ("C3 240x320 128>256>256", 240, 320, [(3, 128, 256, 1), (3, 256, 256, 1)], False),
        ("C4 240x320 256>256 pool", 240, 320, [(3, 256, 256, 1)], True),
        ("C5 120x160 256>512>512", 120, 160, [(3, 256, 512, 1), (3, 512, 512, 1)], False),
        ("C6 120x160 512>512 pool", 120, 160, [(3, 512, 512, 1)], True),
        ("C7 60x80 512>512>512", 60, 80, [(3, 512, 512, 1), (3, 512, 512, 0)], False),
        ("cls 480x640 64>32>32>16", 480, 640, [(3, 64, 32, 1), (3, 32, 32, 1), (3, 32, 16, 1)], False),
    ]
    rng = np.random.RandomState(0)
    for name, h, w, plan, pool in cases:
        cin0 = plan[0][1]
        xs = jnp.asarray(
            rng.rand(REPS, h, w, cin0).astype("float32") - 0.5, jnp.bfloat16
        )
        convs = [
            (
                jnp.asarray((rng.rand(k, k, ci, co) - 0.5).astype("float32") * 0.1, jnp.bfloat16),
                jnp.asarray((rng.rand(co) - 0.5).astype("float32") * 0.1),
                bool(r),
            )
            for k, ci, co, r in plan
        ]
        gflop = sum(2 * h * w * k * k * ci * co for k, ci, co, _ in plan) / 1e9

        def xla_step(x):
            y = x
            for (wk, bk, r) in convs:
                y = (
                    jax.lax.conv_general_dilated(
                        y[None], wk, (1, 1), "SAME",
                        dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    )[0]
                    + bk.astype(jnp.bfloat16)
                )
                if r:
                    y = jnp.maximum(y, 0.0)
            if pool:
                y = jax.lax.reduce_window(
                    y, -jnp.inf, jax.lax.max, (2, 2, 1), (2, 2, 1), "VALID"
                )
            return y

        t_xla = (timed(*scan_over(xla_step, xs)) - f) / REPS
        line = f"{name:32s} {gflop:7.1f} GF  xla {t_xla*1e3:7.3f} ms ({gflop/t_xla/1e3:5.1f} TF/s)"
        for th in tile_hs:
            if pool and th % 2:
                continue
            try:
                t_p = (
                    timed(*scan_over(lambda x, th=th: conv_chain(x, convs, pool=pool, tile_h=th), xs))
                    - f
                ) / REPS
                line += f"  th{th} {t_p*1e3:7.3f} ms ({gflop/t_p/1e3:5.1f} TF/s)"
            except Exception as e:  # noqa: BLE001
                line += f"  th{th} FAIL({type(e).__name__})"
        print(line)


if __name__ == "__main__":
    main()
