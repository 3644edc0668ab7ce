"""Pallas fused 3x3 conv kernel vs lax.conv (interpreter mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from keras_ocr_tpu.ops.conv_pallas import conv3x3_bias_act, conv_chain


def _ref_chain(x, convs, pool):
    y = x[None]
    for w, b, relu in convs:
        y = (
            jax.lax.conv_general_dilated(
                y, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
            )
            + b
        )
        if relu:
            y = jnp.maximum(y, 0.0)
    if pool:
        y = jax.lax.reduce_window(
            y, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
        )
    return np.asarray(y[0])


def _random_chain(rng, cin, plan):
    convs = []
    for k, cout, relu in plan:
        w = jnp.asarray((rng.rand(k, k, cin, cout) - 0.5).astype("float32"))
        b = jnp.asarray((rng.rand(cout) - 0.5).astype("float32") * 0.1)
        convs.append((w, b, relu))
        cin = cout
    return convs


@pytest.mark.parametrize(
    "height,width,cin,plan,pool,tile_h",
    [
        # VGG-style double conv + pool (the CRAFT slice1/slice2 shape).
        (16, 24, 3, [(3, 16, True), (3, 16, True)], True, 8),
        # Triple conv, no pool.
        (14, 16, 8, [(3, 8, True), (3, 16, True), (3, 8, False)], False, 8),
        # Mixed 1x1 + 3x3 (the upconv block shape, detection.py:65-84).
        (12, 16, 8, [(1, 16, True), (3, 8, True)], False, 4),
        # Single conv + pool; height not a multiple of tile_h.
        (18, 20, 4, [(3, 8, True)], True, 8),
    ],
)
def test_conv_chain_matches_lax(height, width, cin, plan, pool, tile_h):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(height, width, cin).astype("float32"))
    convs = _random_chain(rng, cin, plan)
    ref = _ref_chain(x, convs, pool)
    out = np.asarray(
        conv_chain(x, convs, pool=pool, tile_h=tile_h, interpret=True)
    )
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_conv_chain_tap_prepool():
    """tap_prepool returns the pre-pool activation (the CRAFT s1 tap)."""
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.rand(16, 16, 4).astype("float32"))
    convs = _random_chain(rng, 4, [(3, 8, True), (3, 8, True)])
    pooled, tap = conv_chain(
        x, convs, pool=True, tap_prepool=True, tile_h=8, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(tap), _ref_chain(x, convs, pool=False), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(pooled), _ref_chain(x, convs, pool=True), atol=1e-4
    )


@pytest.mark.parametrize(
    "height,width,cin,cout,relu",
    [(24, 40, 8, 16, True), (17, 33, 16, 8, False), (16, 128, 32, 32, True)],
)
def test_conv3x3_matches_lax_conv(height, width, cin, cout, relu):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(height, width, cin).astype("float32"))
    w = jnp.asarray((rng.rand(3, 3, cin, cout) - 0.5).astype("float32"))
    b = jnp.asarray((rng.rand(cout) - 0.5).astype("float32"))
    ref = (
        jax.lax.conv_general_dilated(
            x[None], w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )[0]
        + b
    )
    ref = np.asarray(ref)
    if relu:
        ref = np.maximum(ref, 0)
    out = np.asarray(
        conv3x3_bias_act(x, w, b, tile_h=8, relu=relu, interpret=True)
    )
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_conv3x3_non_multiple_strip_height():
    """Heights that don't divide tile_h are padded and trimmed exactly."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(13, 24, 8).astype("float32"))
    w = jnp.asarray((rng.rand(3, 3, 8, 8) - 0.5).astype("float32"))
    b = jnp.zeros((8,))
    ref = jax.lax.conv_general_dilated(
        x[None], w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )[0]
    ref = np.maximum(np.asarray(ref), 0)
    out = np.asarray(conv3x3_bias_act(x, w, b, tile_h=8, interpret=True))
    assert out.shape == (13, 24, 8)
    np.testing.assert_allclose(out, ref, atol=1e-4)
