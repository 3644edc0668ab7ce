"""On-device warp_boxes vs the host tools.warpBox oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from keras_ocr_tpu import tools
from keras_ocr_tpu.ops import warp as warp_ops


def test_order_corners_matches_get_rotated_box():
    rng = np.random.RandomState(0)
    for _ in range(10):
        theta = rng.uniform(-1.2, 1.2)
        c, s = np.cos(theta), np.sin(theta)
        rot = np.array([[c, -s], [s, c]])
        base = np.array([[0, 0], [50, 0], [50, 14], [0, 14]], dtype="float64")
        quad = (base - base.mean(0)) @ rot.T + rng.uniform(40, 60, 2)
        perm = quad[rng.permutation(4)]
        expected, _ = tools.get_rotated_box(perm)
        ours = np.asarray(warp_ops.order_corners(jnp.asarray(perm, dtype=jnp.float32)))
        np.testing.assert_allclose(ours, expected, atol=1e-3)


def test_perspective_transform_matches_host():
    rng = np.random.RandomState(1)
    src = rng.uniform(0, 100, (4, 2)).astype("float32")
    src = np.array([[0, 0], [80, 5], [85, 40], [2, 38]], dtype="float32")
    dst = np.array([[0, 0], [100, 0], [100, 31], [0, 31]], dtype="float32")
    ours = np.asarray(warp_ops.perspective_transform(jnp.asarray(src), jnp.asarray(dst)))
    expected = tools.get_perspective_transform(src, dst)
    np.testing.assert_allclose(ours, expected, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("angle", [0.0, 0.3, -0.5])
def test_warp_boxes_matches_host_warpbox(angle):
    rng = np.random.RandomState(3)
    image = rng.randint(0, 255, size=(120, 160), dtype="uint8")
    c, s = np.cos(angle), np.sin(angle)
    rot = np.array([[c, -s], [s, c]])
    base = np.array([[0, 0], [60, 0], [60, 18], [0, 18]], dtype="float64")
    box = ((base - base.mean(0)) @ rot.T + [80, 60]).astype("float32")

    host = tools.warpBox(image, box.copy(), target_height=31, target_width=200)
    device = np.asarray(
        warp_ops.warp_boxes(
            jnp.asarray(image, dtype=jnp.float32),
            jnp.asarray(box[None]),
            target_height=31,
            target_width=200,
        )
    )[0]
    # Both are (31, 200); interiors should match closely (boundary pixels
    # can differ by interpolation-edge handling).
    diff = np.abs(device.astype("float64") - host.astype("float64"))
    # Compare away from crop borders.
    interior = diff[2:-2, 2:120]
    assert interior.mean() < 2.0, interior.mean()
    assert np.median(diff) <= 1.0


def test_warp_boxes_axis_aligned_exact():
    rng = np.random.RandomState(4)
    image = rng.randint(0, 255, size=(64, 96), dtype="uint8")
    box = np.array([[10, 20], [50, 20], [50, 31], [10, 31]], dtype="float32")
    # target exactly 4x the box size -> pure upsample; compare to host
    host = tools.warpBox(image, box.copy(), target_height=31, target_width=200)
    device = np.asarray(
        warp_ops.warp_boxes(
            jnp.asarray(image, dtype=jnp.float32), jnp.asarray(box[None])
        )
    )[0]
    diff = np.abs(device.astype("float64") - host.astype("float64"))
    assert diff[1:-1, 1:-1].mean() < 2.0


def test_warp_boxes_batch_shape():
    images = jnp.zeros((2, 64, 96))
    boxes = jnp.tile(
        jnp.asarray([[10, 10], [40, 10], [40, 20], [10, 20]], dtype=jnp.float32),
        (2, 3, 1, 1),
    )
    crops = warp_ops.warp_boxes_batch(images, boxes)
    assert crops.shape == (2, 3, 31, 200)
