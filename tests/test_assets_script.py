"""Offline tests for the assets script's font/background filter logic.

(The crawl/zip paths need network; the retention rules — the part that
determines what the published asset packs contain — are pure and tested
here. Reference: /root/reference/scripts/create_fonts_and_backgrounds.py.)
"""

import importlib.util
import pathlib
import sys

import numpy as np

_SCRIPT = pathlib.Path(__file__).parent.parent / "scripts" / "create_fonts_and_backgrounds.py"
_spec = importlib.util.spec_from_file_location("assets_script", _SCRIPT)
assets_script = importlib.util.module_from_spec(_spec)
sys.modules["assets_script"] = assets_script
_spec.loader.exec_module(assets_script)


def test_blacklist_matches_reference_count_and_spot_checks():
    blacklist = assets_script.FONTS_BLACKLIST
    assert len(blacklist) == 75  # the reference's full list
    for name in [
        "AlmendraDisplay-Regular.ttf",
        "LibreBarcode128-Regular.ttf",
        "jsMath-cmsy10.ttf",
        "Raleway-Thin.ttf",
        "AdobeBlank-Regular.ttf",
    ]:
        assert name in blacklist


def test_select_fonts_dedup_and_blacklist():
    contents = {
        "a/Alpha-Regular.ttf": b"alpha",
        "b/Alpha-Regular.ttf": b"alpha-other",  # dup basename, different bytes
        "c/Beta-Regular.ttf": b"alpha",  # dup bytes, different basename
        "d/Gamma-Regular.ttf": b"gamma",
        "e/Raleway-Thin.ttf": b"raleway",  # blacklisted
    }
    kept = assets_script.select_fonts(
        sorted(contents), read_bytes=lambda path: contents[path]
    )
    assert kept == ["a/Alpha-Regular.ttf", "d/Gamma-Regular.ttf"]


def test_select_fonts_keeps_input_order():
    contents = {f"{i}/F{i}.ttf": bytes([i]) for i in range(5)}
    paths = sorted(contents, reverse=True)
    kept = assets_script.select_fonts(paths, read_bytes=lambda p: contents[p])
    assert kept == paths


class _FakeDetector:
    def __init__(self, boxes):
        self._boxes = boxes

    def detect(self, images):
        return [self._boxes for _ in images]


def test_background_is_usable_filters():
    usable = np.full((1200, 1600, 3), 220, dtype="uint8")
    no_text = _FakeDetector(boxes=[])
    has_text = _FakeDetector(boxes=[np.zeros((4, 2))])
    assert assets_script.background_is_usable(usable, no_text)
    # Text detected -> rejected (the reference's CRAFT-filter step).
    assert not assets_script.background_is_usable(usable, has_text)
    # Extreme aspect ratio -> rejected.
    panorama = np.full((200, 1600, 3), 220, dtype="uint8")
    assert not assets_script.background_is_usable(panorama, no_text)
    # Largest uniform region below the (4*fontsize)^2 floor -> no contour.
    tiny = (np.random.RandomState(0).rand(100, 100, 3) * 255).astype("uint8")
    assert not assets_script.background_is_usable(tiny, no_text)
    # Uniform region exists but under the 1e6-px area threshold -> rejected.
    small_flat = np.full((400, 400, 3), 220, dtype="uint8")
    assert not assets_script.background_is_usable(small_flat, no_text)
