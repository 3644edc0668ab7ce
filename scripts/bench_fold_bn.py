"""A/B: CRAFT forward with vs without inference-time BN folding.

VERDICT r4 item 2 asks for a numbers-backed decision on raising CRAFT MXU
utilization; BN folding (models/craft.py:fold_bn_variables) removes the
21 BatchNorm affine passes from the inference graph. This script times
the full CRAFT forward both ways on the current backend with the
PERF.md stage-budget method (lax.scan over REPS distinct inputs, scalar
fetch, floor-corrected min-over-reps) and prints one JSON line.

Usage: python scripts/bench_fold_bn.py [--height 960] [--width 1280]
"""

import argparse
import json
import os as _os
import sys as _sys
import time

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

REPS = 8


def timed(fn, *args):
    import jax

    fn_j = jax.jit(fn)
    jax.block_until_ready(fn_j(*args))
    best = np.inf
    for _ in range(5):
        start = time.perf_counter()
        jax.block_until_ready(fn_j(*args))
        best = min(best, time.perf_counter() - start)
    return best


def scan_cost(step, xs, floor_s):
    import jax
    import jax.numpy as jnp

    def fn(xs):
        def body(carry, x):
            return carry, jnp.sum(step(x)).astype(jnp.float32)

        _, ys = jax.lax.scan(body, 0, xs)
        return jnp.sum(ys)

    return (timed(fn, xs) - floor_s) / xs.shape[0]


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--height", type=int, default=960)
    parser.add_argument("--width", type=int, default=1280)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from keras_ocr_tpu.models import init_variables
    from keras_ocr_tpu.models.craft import CRAFT, fold_bn_variables

    h, w = args.height, args.width
    rng = np.random.RandomState(0)

    model = CRAFT(backbone_name="vgg", dtype=jnp.bfloat16)
    variables = init_variables(model, (1, 64, 64, 3))
    folded_model = CRAFT(backbone_name="vgg", fold_bn=True, dtype=jnp.bfloat16)
    folded = fold_bn_variables(variables)

    def floor_fn(xs):
        def body(carry, x):
            return carry, jnp.sum(x[0, 0, 0, :2]).astype(jnp.float32)

        _, ys = jax.lax.scan(body, 0, xs)
        return jnp.sum(ys)

    x_full = jnp.asarray(
        rng.rand(REPS, 1, h, w, 3).astype("float32"), dtype=jnp.bfloat16
    )
    floor_s = timed(floor_fn, x_full)

    unfolded_s = scan_cost(
        lambda x: model.apply(variables, x, train=False), x_full, floor_s
    )
    folded_s = scan_cost(
        lambda x: folded_model.apply(folded, x, train=False), x_full, floor_s
    )
    print(
        json.dumps(
            {
                "shape": [h, w],
                "backend": jax.default_backend(),
                "craft_forward_ms": round(unfolded_s * 1000, 3),
                "craft_forward_folded_ms": round(folded_s * 1000, 3),
                "speedup": round(unfolded_s / folded_s, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
