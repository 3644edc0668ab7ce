"""Isolated cost of the dilated-blob census on the tier-1 get_boxes path.

ADVICE r3 #4: the census (per-pixel dilation budgets + brushfire prefix
scans + keyed blob labeling) guards a ~1/25-image event but runs on EVERY
get_boxes call; its cost was never isolated. This times, on the real
chip:

  1. the full tier-1 ``get_boxes`` (census included),
  2. the census block alone,
  3. the shared component-analysis front (threshold/label/compact/tables)
     the census builds on,

each chained CHAIN times inside one jit via ``lax.scan`` with a carry
perturbation (so nothing hoists) and scalar-fetched — the tunneled
runtime's RPC floor then amortizes over the chain instead of dominating
a per-call sample. Prints one JSON line per measurement.
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

CHAIN = 16
REPS = 12


def make_heatmaps(batch):
    """Text/link bump fields shaped like a trained detector's output."""
    rng = np.random.RandomState(0)
    hm = np.zeros((batch, 480, 640, 2), dtype="float32")
    yy, xx = np.mgrid[0:480, 0:640]
    for b in range(batch):
        for _ in range(12):
            cx, cy = rng.randint(20, 620), rng.randint(20, 460)
            w, h = rng.randint(15, 40), rng.randint(5, 10)
            bump = np.exp(-(((xx - cx) / w) ** 2 + ((yy - cy) / h) ** 2) * 2.5)
            hm[b, :, :, 0] = np.maximum(hm[b, :, :, 0], bump)
            hm[b, :, :, 1] = np.maximum(hm[b, :, :, 1], bump * 0.6)
    return hm


def main():
    import argparse

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--batch", type=int, default=16)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from keras_ocr_tpu.ops import postprocess as pp
    from keras_ocr_tpu.ops.cc import (
        brushfire_dilate,
        compact_labels,
        label_blobs_keyed,
        label_components,
    )

    max_components = 64
    num_segments = max_components + 1

    def census_single(hm):
        """The census block of component_analysis, verbatim data flow."""
        textmap, linkmap = hm[..., 0], hm[..., 1]
        text_score = textmap > 0.4
        link_score = linkmap > 0.4
        fg = text_score | link_score
        label, _ = label_components(fg, num_sweeps=8, check_convergence=True)
        comp, _, _ = compact_labels(
            label, max_components, num_sweeps=8, check_convergence=True
        )
        segmask = fg & ~(link_score & text_score)
        height, width = hm.shape[0], hm.shape[1]
        a = jnp.ones((max_components,))
        b = jnp.ones((max_components,))
        valid0 = jnp.ones((max_components,), bool)
        iota_seg = jnp.arange(num_segments, dtype=jnp.int32)
        onehot_px = comp[..., None] == iota_seg

        def per_pixel(values):
            return jnp.sum(
                jnp.where(onehot_px, values[None, None, :], 0.0), axis=2
            )

        grow_a = per_pixel(jnp.concatenate([a, jnp.zeros((1,))]))
        grow_b = per_pixel(jnp.concatenate([b, jnp.zeros((1,))]))
        valid_ext = jnp.concatenate([valid0, jnp.zeros((1,), bool)])
        seeds = segmask & (per_pixel(valid_ext.astype(jnp.float32)) > 0.5)
        cover, cover_comp = brushfire_dilate(seeds, comp, grow_a, grow_b)
        dil_label = label_blobs_keyed(cover, cover_comp, num_sweeps=8)
        flat_idx = jnp.arange(height * width, dtype=jnp.int32).reshape(
            height, width
        )
        return jnp.sum(((dil_label == flat_idx) & cover).astype(jnp.int32))

    def front_single(hm):
        """Shared front the census builds on (its own cost excluded)."""
        fg = (hm[..., 0] > 0.4) | (hm[..., 1] > 0.4)
        label, _ = label_components(fg, num_sweeps=8, check_convergence=True)
        comp, n_total, _ = compact_labels(
            label, max_components, num_sweeps=8, check_convergence=True
        )
        return jnp.sum(comp) + n_total

    def chained(fn):
        def run(hms):
            def body(carry, _):
                out = fn(hms + carry * 1e-7)
                return carry + out.astype(jnp.float32) * 1e-9, out

            carry, outs = jax.lax.scan(
                body, jnp.zeros(hms.shape[1:]), None, length=CHAIN
            )
            return jnp.sum(carry) + jnp.sum(outs)

        return jax.jit(run)

    def get_boxes_scalar(hms):
        boxes, mask, diag = pp.get_boxes(hms, max_components=max_components)
        return (
            jnp.sum(boxes)
            + jnp.sum(mask)
            + jnp.sum(diag["n_components"])
            + jnp.sum(diag["n_multiblob"])
        )

    hms = jnp.asarray(make_heatmaps(args.batch))
    measurements = {}
    for name, fn in [
        ("get_boxes_full", get_boxes_scalar),
        ("census_block", lambda h: jax.vmap(census_single)(h).sum()),
        ("shared_front", lambda h: jax.vmap(front_single)(h).sum()),
    ]:
        jitted = chained(fn)
        t0 = time.perf_counter()
        np.asarray(jitted(hms))
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(REPS):
            start = time.perf_counter()
            np.asarray(jitted(hms))
            times.append(time.perf_counter() - start)
        per_call_ms = float(np.min(times)) * 1000 / CHAIN
        measurements[name] = per_call_ms
        print(
            json.dumps(
                {
                    "measurement": name,
                    "batch": args.batch,
                    "per_batch_ms": round(per_call_ms, 3),
                    "compile_s": round(compile_s, 1),
                }
            ),
            flush=True,
        )
    print(
        json.dumps(
            {
                "census_isolated_ms": round(
                    measurements["census_block"] - measurements["shared_front"], 3
                ),
                "note": "census cost beyond the labeling/compaction it shares "
                "with tier-1 anyway; per batch of "
                f"{args.batch} 480x640 heatmaps",
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
