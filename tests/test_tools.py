"""Tests for host-side geometry/image utilities.

Covers the reference's test surface (/root/reference/tests/test_tools.py:5-24,
fix_line ordering) plus oracle tests for the NumPy replacements of the
OpenCV/shapely primitives (min_area_rect vs scipy-hull brute force,
perspective transforms round-tripping, warpBox identity crops).
"""

import numpy as np
import pytest

from keras_ocr_tpu import tools


def test_fix_line_horizontal():
    character_boxes = [
        np.array([[0, 0], [10, 0], [10, 10], [0, 10]]),
        np.array([[10, 0], [20, 0], [20, 10], [10, 10]]),
        np.array([[20, 0], [30, 0], [30, 10], [20, 10]]),
    ]
    line = [(box, c) for box, c in zip(character_boxes, "abc")]
    shuffled = [line[2], line[0], line[1]]
    fixed, orientation = tools.fix_line(shuffled)
    assert orientation == "horizontal"
    assert "".join(c for _, c in fixed) == "abc"


def test_fix_line_vertical():
    character_boxes = [
        np.array([[0, 0], [10, 0], [10, 10], [0, 10]]),
        np.array([[0, 10], [10, 10], [10, 20], [0, 20]]),
        np.array([[0, 20], [10, 20], [10, 30], [0, 30]]),
    ]
    line = [(box, c) for box, c in zip(character_boxes, "abc")]
    shuffled = [line[1], line[2], line[0]]
    fixed, orientation = tools.fix_line(shuffled)
    assert orientation == "vertical"
    assert "".join(c for _, c in fixed) == "abc"


def test_polygon_area():
    square = np.array([[0, 0], [10, 0], [10, 10], [0, 10]])
    assert tools.polygon_area(square) == 100
    assert tools.polygon_area(square[::-1]) == 100
    triangle = np.array([[0, 0], [10, 0], [0, 10]])
    assert tools.polygon_area(triangle) == 50


def test_convex_hull():
    rng = np.random.RandomState(0)
    points = rng.uniform(0, 100, size=(50, 2))
    hull = tools.convex_hull(points)
    from scipy.spatial import ConvexHull

    expected = ConvexHull(points)
    assert len(hull) == len(expected.vertices)
    assert tools.polygon_area(hull) == pytest.approx(expected.volume, rel=1e-9)


def _brute_force_min_rect_area(points):
    """O(n^2) oracle: try every hull-edge angle."""
    hull = tools.convex_hull(points)
    best = np.inf
    for i in range(len(hull)):
        edge = hull[(i + 1) % len(hull)] - hull[i]
        theta = np.arctan2(edge[1], edge[0])
        c, s = np.cos(theta), np.sin(theta)
        rot = np.array([[c, s], [-s, c]])
        proj = hull @ rot.T
        extent = proj.max(axis=0) - proj.min(axis=0)
        best = min(best, extent[0] * extent[1])
    return best


def test_min_area_rect_random():
    rng = np.random.RandomState(42)
    for _ in range(20):
        points = rng.uniform(0, 200, size=(rng.randint(4, 40), 2))
        rect = tools.min_area_rect(points)
        assert rect.shape == (4, 2)
        # Rectangle area equals the brute-force optimum.
        area = tools.polygon_area(rect)
        assert area == pytest.approx(_brute_force_min_rect_area(points), rel=1e-6)
        # All points inside the rectangle (within tolerance): project onto
        # the rectangle's edge directions and check extents.
        u = rect[1] - rect[0]
        v = rect[3] - rect[0]
        for axis in (u, v):
            norm = np.linalg.norm(axis)
            if norm == 0:
                continue
            proj_rect = rect @ axis / norm
            proj_pts = points @ axis / norm
            assert proj_pts.min() >= proj_rect.min() - 1e-3
            assert proj_pts.max() <= proj_rect.max() + 1e-3


def test_min_area_rect_axis_aligned():
    box = np.array([[1, 2], [11, 2], [11, 7], [1, 7]], dtype="float64")
    rect = tools.min_area_rect(box)
    assert tools.polygon_area(rect) == pytest.approx(50.0)
    assert sorted(map(tuple, np.round(rect).astype(int).tolist())) == sorted(
        map(tuple, box.astype(int).tolist())
    )


def test_get_rotated_box_ordering():
    # A rotated rectangle; get_rotated_box must return tl-tr-br-bl.
    theta = 0.3
    c, s = np.cos(theta), np.sin(theta)
    rot = np.array([[c, -s], [s, c]])
    base = np.array([[0, 0], [40, 0], [40, 10], [0, 10]], dtype="float64")
    shifted = (base - base.mean(axis=0)) @ rot.T + [50, 50]
    pts, rotation = tools.get_rotated_box(shifted[np.random.RandomState(0).permutation(4)])
    # tl should have the smallest x of the two leftmost points with smaller y
    assert pts.shape == (4, 2)
    w = np.linalg.norm(pts[0] - pts[1])
    h = np.linalg.norm(pts[1] - pts[2])
    assert w == pytest.approx(40, abs=1e-3)
    assert h == pytest.approx(10, abs=1e-3)


def test_get_perspective_transform_roundtrip():
    src = np.array([[0, 0], [100, 0], [100, 50], [0, 50]], dtype="float32")
    dst = np.array([[10, 5], [90, 10], [95, 60], [5, 55]], dtype="float32")
    M = tools.get_perspective_transform(src, dst)
    homog = np.concatenate([src, np.ones((4, 1))], axis=1)
    mapped = (M @ homog.T).T
    mapped = mapped[:, :2] / mapped[:, 2:]
    np.testing.assert_allclose(mapped, dst, atol=1e-6)


def test_warp_perspective_identity():
    rng = np.random.RandomState(0)
    image = rng.randint(0, 255, size=(20, 30, 3), dtype="uint8")
    M = np.eye(3)
    out = tools.warp_perspective(image, M, dsize=(30, 20))
    np.testing.assert_array_equal(out, image)


def test_warp_box_axis_aligned_crop():
    rng = np.random.RandomState(1)
    image = rng.randint(0, 255, size=(60, 80, 3), dtype="uint8")
    box = np.array([[10, 20], [50, 20], [50, 40], [10, 40]], dtype="float32")
    crop = tools.warpBox(image, box, target_height=20, target_width=40)
    assert crop.shape == (20, 40, 3)
    np.testing.assert_array_equal(crop, image[20:40, 10:50])


def test_pad_and_fit():
    image = np.zeros((10, 20, 3), dtype="uint8")
    padded = tools.pad(image, width=30, height=15, cval=7)
    assert padded.shape == (15, 30, 3)
    assert (padded[:10, :20] == 0).all()
    assert (padded[10:, :] == 7).all()
    fitted, scale = tools.fit(image, width=40, height=40, return_scale=True)
    assert fitted.shape == (40, 40, 3)
    assert scale == 2


def test_resize_image():
    image = np.zeros((100, 200, 3), dtype="uint8")
    resized, scale = tools.resize_image(image, max_scale=2, max_size=4096)
    assert scale == 2
    assert resized.shape == (200, 400, 3)
    resized, scale = tools.resize_image(image, max_scale=100, max_size=400)
    assert scale == 2
    assert resized.shape == (200, 400, 3)


def test_combine_line():
    line = [
        (np.array([[0, 0], [10, 0], [10, 10], [0, 10]], dtype="float32"), "h"),
        (np.array([[10, 0], [20, 0], [20, 10], [10, 10]], dtype="float32"), "i"),
    ]
    box, text = tools.combine_line(line)
    assert text == "hi"
    assert tools.polygon_area(box) == pytest.approx(200, rel=1e-5)


def test_adjust_boxes():
    boxes = [np.array([[0, 0], [10, 0], [10, 10], [0, 10]], dtype="float32")]
    scaled = tools.adjust_boxes(boxes, scale=0.5)
    np.testing.assert_allclose(scaled[0], boxes[0] * 0.5)
    preds = [("word", boxes[0])]
    scaled_preds = tools.adjust_boxes(preds, scale=2, boxes_format="predictions")
    np.testing.assert_allclose(scaled_preds[0][1], boxes[0] * 2)


def test_draw_boxes():
    image = np.zeros((50, 50, 3), dtype="uint8")
    boxes = [np.array([[5, 5], [45, 5], [45, 45], [5, 45]], dtype="float32")]
    canvas = tools.drawBoxes(image, boxes, color=(255, 0, 0), thickness=2)
    assert canvas.sum() > 0
    assert (canvas[:, :, 1:] == 0).all()


# ---------------------------------------------------------------------------
# Archive extraction hardening (safe_extract_zip / download_and_extract)
# ---------------------------------------------------------------------------


def _write_zip(path, members):
    import zipfile

    with zipfile.ZipFile(path, "w") as zfile:
        for name, payload in members:
            zfile.writestr(name, payload)


def test_safe_extract_zip_roundtrip(tmp_path):
    zip_path = tmp_path / "good.zip"
    _write_zip(zip_path, [("a.txt", "alpha"), ("sub/b.txt", "beta")])
    dest = tmp_path / "out"
    tools.safe_extract_zip(str(zip_path), str(dest))
    assert (dest / "a.txt").read_text() == "alpha"
    assert (dest / "sub" / "b.txt").read_text() == "beta"


@pytest.mark.parametrize("member", ["../evil.txt", "sub/../../evil.txt"])
def test_safe_extract_zip_rejects_traversal(tmp_path, member):
    zip_path = tmp_path / "evil.zip"
    _write_zip(zip_path, [("ok.txt", "fine"), (member, "pwned")])
    dest = tmp_path / "out"
    with pytest.raises(ValueError, match="escapes"):
        tools.safe_extract_zip(str(zip_path), str(dest))
    assert not (tmp_path / "evil.txt").exists()


def test_safe_extract_zip_rejects_absolute(tmp_path):
    zip_path = tmp_path / "abs.zip"
    _write_zip(zip_path, [("/tmp/abs_evil.txt", "pwned")])
    with pytest.raises(ValueError, match="escapes"):
        tools.safe_extract_zip(str(zip_path), str(tmp_path / "out"))


def test_download_and_extract_redownloads_corrupt_cache(tmp_path):
    """A cached archive that no longer opens as a zip must be replaced by a
    fresh download (one retry), not wedge the loader forever."""
    source = tmp_path / "source.zip"
    _write_zip(source, [("a.txt", "alpha")])
    cache_dir = tmp_path / "cache"
    cache_dir.mkdir()
    # Corrupt cached copy: exists, so download_and_verify (no sha) trusts it.
    (cache_dir / "data.zip").write_bytes(b"this is not a zip")
    dest = tmp_path / "out"
    with pytest.warns(UserWarning, match="corrupt"):
        tools.download_and_extract(
            url=source.as_uri(),
            destination=str(dest),
            cache_dir=str(cache_dir),
            filename="data.zip",
            verbose=False,
        )
    assert (dest / "a.txt").read_text() == "alpha"


def test_download_and_extract_propagates_double_corruption(tmp_path):
    """If the re-downloaded archive is corrupt too, fail loudly."""
    import zipfile as _zipfile

    source = tmp_path / "source.zip"
    source.write_bytes(b"still not a zip")
    cache_dir = tmp_path / "cache"
    cache_dir.mkdir()
    (cache_dir / "data.zip").write_bytes(b"not a zip either")
    with pytest.warns(UserWarning, match="corrupt"):
        with pytest.raises(_zipfile.BadZipFile):
            tools.download_and_extract(
                url=source.as_uri(),
                destination=str(tmp_path / "out"),
                cache_dir=str(cache_dir),
                filename="data.zip",
                verbose=False,
            )
