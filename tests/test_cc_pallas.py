"""Pallas CC sweep kernel vs the XLA implementation (interpreter mode)."""

import numpy as np
import pytest

import jax.numpy as jnp

from keras_ocr_tpu.ops import cc
from keras_ocr_tpu.ops.cc_pallas import segmented_min_sweeps_pallas


@pytest.mark.parametrize("seed,density", [(0, 0.4), (1, 0.6), (2, 0.8)])
def test_pallas_sweeps_match_xla(seed, density):
    rng = np.random.RandomState(seed)
    height, width = 96, 160
    fg = rng.rand(height, width) < density
    sentinel = height * width
    idx = np.arange(sentinel, dtype=np.int32).reshape(height, width)
    label = np.where(fg, idx, sentinel).astype(np.int32)
    barrier = (~fg).astype(np.int32)
    ref = np.asarray(
        cc.segmented_min_sweeps(jnp.asarray(label), jnp.asarray(barrier), sentinel, 8)
    )
    out = np.asarray(
        segmented_min_sweeps_pallas(
            jnp.asarray(label), jnp.asarray(barrier), sentinel, 8, interpret=True
        )
    )
    np.testing.assert_array_equal(ref, out)


def test_pallas_sweeps_labels_blobs():
    """End-to-end: pallas sweeps produce correct component roots."""
    height, width = 64, 128
    fg = np.zeros((height, width), dtype=bool)
    fg[5:15, 10:40] = True  # blob A, root = 5*128+10
    fg[30:40, 60:90] = True  # blob B, root = 30*128+60
    sentinel = height * width
    idx = np.arange(sentinel, dtype=np.int32).reshape(height, width)
    label = np.where(fg, idx, sentinel).astype(np.int32)
    barrier = (~fg).astype(np.int32)
    out = np.asarray(
        segmented_min_sweeps_pallas(
            jnp.asarray(label), jnp.asarray(barrier), sentinel, 4, interpret=True
        )
    )
    assert (out[5:15, 10:40] == 5 * 128 + 10).all()
    assert (out[30:40, 60:90] == 30 * 128 + 60).all()
    assert (out[~fg] == sentinel).all()
