"""Pallas fused 3x3 conv kernel vs lax.conv (interpreter mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from keras_ocr_tpu.ops.conv_pallas import conv3x3_bias_act


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
