"""Native hostops library vs the pure NumPy/scipy implementations."""

import numpy as np
import pytest

from scipy import ndimage

from keras_ocr_tpu import native, tools
from keras_ocr_tpu.detection import _dilate_cv2_style

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native hostops not buildable"
)


def test_native_resize_matches_numpy_semantics():
    rng = np.random.RandomState(0)
    image = rng.randint(0, 255, (40, 60, 3), dtype="uint8")
    out = native.resize_bilinear(image, 80, 120)
    assert out.shape == (80, 120, 3)
    # identity resize is exact
    same = native.resize_bilinear(image, 40, 60)
    np.testing.assert_array_equal(same, image)
    # against PIL-based _resize (same half-pixel convention): mean close
    ref = tools._resize(image, width=120, height=80)
    assert np.abs(out.astype(int) - ref.astype(int)).mean() < 3.0


def test_native_warp_matches_host():
    rng = np.random.RandomState(1)
    image = rng.randint(0, 255, (50, 70, 3), dtype="uint8")
    src = np.array([[5, 5], [60, 8], [58, 40], [4, 38]], dtype="float32")
    dst = np.array([[0, 0], [64, 0], [64, 32], [0, 32]], dtype="float32")
    M = tools.get_perspective_transform(src, dst)
    ours = native.warp_perspective(image, M, dsize=(64, 32))
    ref = tools.warp_perspective(image, M, dsize=(64, 32))
    diff = np.abs(ours.astype(int) - ref.astype(int))
    assert np.median(diff) <= 1
    assert diff.mean() < 2.0


def test_native_label_components_matches_scipy():
    rng = np.random.RandomState(2)
    for _ in range(5):
        mask = rng.rand(50, 80) > 0.6
        labels, count = native.label_components(mask)
        expected, n = ndimage.label(mask, structure=[[0, 1, 0], [1, 1, 1], [0, 1, 0]])
        assert count == n
        # identical partitions and identical first-appearance numbering
        np.testing.assert_array_equal(labels, expected)


def test_native_dilate_matches_reference():
    rng = np.random.RandomState(3)
    for niter in range(5):
        mask = rng.rand(30, 40) > 0.85
        ours = native.dilate_square(mask, niter)
        ref = _dilate_cv2_style(mask, niter)
        np.testing.assert_array_equal(ours, ref)
