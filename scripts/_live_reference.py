"""Import the LIVE reference package (/root/reference/keras_ocr) in-process.

Shared by the offline head-to-head benchmark. Mirrors the stub strategy of
tests/test_reference_live.py's ``ref`` fixture: the reference's TF/Keras +
OpenCV core runs for real; absent auxiliary dependencies (imgaug, shapely,
pyclipper, editdistance, efficientnet, essential_generators) are stubbed
inertly because no head-to-head code path touches them — except
``shapely.geometry.MultiPoint.minimum_rotated_rectangle``, which
``tools.get_rotated_box`` needs and which is backed by this framework's
rotating-calipers ``min_area_rect``.
"""

import importlib.util
import os
import sys
import types

REFERENCE_DIR = "/root/reference"


def reference_available() -> bool:
    if not os.path.isdir(os.path.join(REFERENCE_DIR, "keras_ocr")):
        return False
    return all(
        importlib.util.find_spec(mod) is not None
        for mod in ("tensorflow", "tf_keras", "cv2", "h5py")
    )


def import_reference():
    """Return the reference ``keras_ocr`` module, CPU-only, Keras-2 era."""
    from unittest import mock

    import numpy as np

    # Must precede the first tensorflow import anywhere in the process.
    os.environ.setdefault("TF_USE_LEGACY_KERAS", "1")
    os.environ.setdefault("CUDA_VISIBLE_DEVICES", "-1")
    for name in (
        "efficientnet",
        "efficientnet.tfkeras",
        "imgaug",
        "imgaug.augmenters",
        "imgaug.augmenters.meta",
        "essential_generators",
        "pyclipper",
        "editdistance",
        "shapely",
        "shapely.geometry",
    ):
        try:
            __import__(name)
        except ImportError:
            sys.modules[name] = mock.MagicMock(name=name)
    if importlib.util.find_spec("validators") is None:
        validators = types.ModuleType("validators")
        validators.url = lambda s: isinstance(s, str) and s.startswith(
            ("http://", "https://")
        )
        sys.modules["validators"] = validators
    if isinstance(sys.modules.get("shapely"), mock.MagicMock):
        from keras_ocr_tpu.tools import min_area_rect

        class _Ring:
            def __init__(self, rect):
                closed = np.vstack([rect, rect[:1]])
                self.xy = (closed[:, 0], closed[:, 1])

        class _Rect:
            def __init__(self, rect):
                self.exterior = _Ring(rect)

        class _MultiPoint:
            def __init__(self, points):
                points = np.asarray(points, dtype="float64")
                if len(points) < 3:
                    raise AttributeError("not enough points")
                self.minimum_rotated_rectangle = _Rect(min_area_rect(points))

        geometry = types.ModuleType("shapely.geometry")
        geometry.MultiPoint = _MultiPoint
        shapely = types.ModuleType("shapely")
        shapely.geometry = geometry
        sys.modules["shapely"] = shapely
        sys.modules["shapely.geometry"] = geometry
    if REFERENCE_DIR not in sys.path:
        sys.path.insert(0, REFERENCE_DIR)
    import keras_ocr  # noqa: F401  (the reference package, not this repo)

    return keras_ocr
