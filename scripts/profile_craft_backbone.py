"""Sub-stage latency breakdown of the CRAFT forward pass on the real chip.

PERF.md attributes ~14 ms of the fused pipeline to the CRAFT forward at
960x1280 (backbone 8.8 + s5/decoder/cls 5.4) at ~26-40% MXU — well below
the ~3.7 ms bf16 speed-of-light of its ~730 GFLOP. This script isolates
where the gap lives: each candidate sub-graph is applied to REPS distinct
stacked inputs via lax.scan (nothing hoists), cost = (total - floor) /
REPS, scalar-fetched so download cost is constant.

Usage: python scripts/profile_craft_backbone.py [--height 960] [--width 1280]
"""

import argparse
import json
import time

import os as _os
import sys as _sys

# Make the in-repo package importable when run as `python scripts/<name>.py`
# without a pip install (sys.path[0] is scripts/, not the repo root).
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

REPS = 8


def timed(fn, *args):
    import jax

    fn_j = jax.jit(fn)
    out = fn_j(*args)
    jax.block_until_ready(out)
    best = np.inf
    for _ in range(5):
        start = time.perf_counter()
        jax.block_until_ready(fn_j(*args))
        best = min(best, time.perf_counter() - start)
    return best


def scan_cost(step, xs, floor_s):
    """Per-application cost of `step` over stacked inputs, floor-corrected."""
    import jax

    def fn(xs):
        def body(carry, x):
            return carry, jax.numpy.sum(step(x)).astype(jax.numpy.float32)

        _, ys = jax.lax.scan(body, 0, xs)
        return jax.numpy.sum(ys)

    return (timed(fn, xs) - floor_s) / xs.shape[0]


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--height", type=int, default=960)
    parser.add_argument("--width", type=int, default=1280)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import flax.linen as nn

    from keras_ocr_tpu.models.craft import CRAFT, VGG16BN, ConvBN
    from keras_ocr_tpu.models import init_variables

    h, w = args.height, args.width
    rng = np.random.RandomState(0)

    model = CRAFT(backbone_name="vgg", dtype=jnp.bfloat16)
    variables = init_variables(model, (1, 64, 64, 3))
    backbone = VGG16BN(dtype=jnp.bfloat16)
    bb_vars = {"params": variables["params"]["basenet"],
               "batch_stats": variables["batch_stats"]["basenet"]}

    # Floor: an empty scan of the same length fetching one scalar.
    def floor_fn(xs):
        def body(carry, x):
            return carry, jnp.sum(x[0, 0, 0, :2]).astype(jnp.float32)

        _, ys = jax.lax.scan(body, 0, xs)
        return jnp.sum(ys)

    x_full = jnp.asarray(
        rng.rand(REPS, 1, h, w, 3).astype("float32"), dtype=jnp.bfloat16
    )
    floor_s = timed(floor_fn, x_full)
    results = {}

    def report(name, seconds, gflop=None):
        entry = {"ms": round(seconds * 1000, 3)}
        if gflop is not None:
            entry["gflop"] = round(gflop, 1)
            entry["tflops"] = round(gflop / seconds / 1000, 1)
            entry["mxu_pct_of_197T"] = round(100 * gflop / seconds / 1000 / 197, 1)
        results[name] = entry
        print(name, json.dumps(entry), flush=True)

    px = h * w
    gf = {
        "block1": (px * 64 * 27 * 2 + px * 64 * 576 * 2) / 1e9,
        "backbone": 0.0,
    }
    # Full-backbone GFLOP at this resolution (13 convs, pools halve spatial).
    spec = [(1, 3, 64), (1, 64, 64), (2, 64, 128), (2, 128, 128),
            (4, 128, 256), (4, 256, 256), (4, 256, 256), (8, 256, 512),
            (8, 512, 512), (8, 512, 512), (16, 512, 512), (16, 512, 512),
            (16, 512, 512)]
    gf["backbone"] = sum(
        (px / (d * d)) * co * (ci * 9) * 2 / 1e9 for d, ci, co in spec
    )

    # 1. Full CRAFT forward.
    report(
        "craft_full",
        scan_cost(lambda x: model.apply(variables, x, train=False), x_full, floor_s),
    )

    # 2. Backbone only.
    report(
        "backbone",
        scan_cost(
            lambda x: sum(jnp.sum(t.astype(jnp.float32))
                          for t in backbone.apply(bb_vars, x, train=False)),
            x_full,
            floor_s,
        ),
        gflop=gf["backbone"],
    )

    # 3. Block1 (two convs at full resolution) isolated.
    block1 = nn.Sequential([
        ConvBN(features=64, kernel=3, dtype=jnp.bfloat16),
        ConvBN(features=64, kernel=3, dtype=jnp.bfloat16),
    ])
    b1_vars = jax.jit(block1.init)(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.bfloat16))
    report(
        "block1",
        scan_cost(lambda x: block1.apply(b1_vars, x), x_full, floor_s),
        gflop=gf["block1"],
    )

    # 4. s5 dilated conv alone (512->1024, 3x3 dilation 6 @ H/16).
    s5 = nn.Conv(1024, (3, 3), kernel_dilation=(6, 6), padding="SAME", dtype=jnp.bfloat16)
    x_s5 = jnp.asarray(
        rng.rand(REPS, 1, h // 16, w // 16, 512).astype("float32"), dtype=jnp.bfloat16
    )
    s5_vars = jax.jit(s5.init)(jax.random.PRNGKey(0), x_s5[0])
    floor_s5 = timed(floor_fn, x_s5)
    gflop_s5 = (px / 256) * 1024 * 512 * 9 * 2 / 1e9
    report("s5_dilated_conv", scan_cost(lambda x: s5.apply(s5_vars, x), x_s5, floor_s5), gflop=gflop_s5)

    # 5. conv_cls head at H/2 (small-channel convs).
    def cls_head(x, params):
        for name in ("conv_cls_0", "conv_cls_2", "conv_cls_4", "conv_cls_6", "conv_cls_8"):
            kernel = params[name]["kernel"].astype(jnp.bfloat16)
            bias = params[name]["bias"].astype(jnp.bfloat16)
            x = jax.lax.conv_general_dilated(
                x, kernel, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + bias
            if name != "conv_cls_8":
                x = nn.relu(x)
        return x

    x_cls = jnp.asarray(
        rng.rand(REPS, 1, h // 2, w // 2, 32).astype("float32"), dtype=jnp.bfloat16
    )
    floor_cls = timed(floor_fn, x_cls)
    gflop_cls = (px / 4) * (32 * 32 * 9 + 32 * 32 * 9 + 16 * 32 * 9 + 16 * 16 + 2 * 16) * 2 / 1e9
    report(
        "conv_cls_head",
        scan_cost(lambda x: cls_head(x, variables["params"]), x_cls, floor_cls),
        gflop=gflop_cls,
    )

    print(json.dumps(results))


if __name__ == "__main__":
    main()
