"""Host-side image & geometry utilities.

Same public surface as the reference ``keras_ocr.tools``
(/root/reference/keras_ocr/tools.py:19-601) but with zero native-CV
dependencies: OpenCV resize/warp/minAreaRect and shapely's
minimum_rotated_rectangle are replaced by NumPy/PIL/scipy implementations
(convex hull + rotating calipers, closed-form 4-point homographies,
``scipy.ndimage.map_coordinates`` bilinear warps). These are the *host*
paths used by data loading and tests; the inference hot path uses the
on-device equivalents in :mod:`keras_ocr_tpu.ops`.
"""

from __future__ import annotations

import hashlib
import io
import os
import re
import typing
import urllib.parse
import urllib.request
import warnings
import zipfile

import numpy as np
import PIL.Image
import PIL.ImageDraw
from scipy import ndimage as _ndimage


# ---------------------------------------------------------------------------
# Geometry primitives (replacing cv2.getPerspectiveTransform / minAreaRect /
# boxPoints / contourArea and shapely minimum_rotated_rectangle)
# ---------------------------------------------------------------------------


def polygon_area(points) -> float:
    """Absolute polygon area via the shoelace formula (cv2.contourArea analog)."""
    pts = np.asarray(points, dtype="float64")
    if len(pts) < 3:
        return 0.0
    x, y = pts[:, 0], pts[:, 1]
    return float(abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1))) / 2)


def convex_hull(points) -> np.ndarray:
    """Convex hull (counter-clockwise in xy math coords) via Andrew's monotone chain."""
    pts = np.unique(np.asarray(points, dtype="float64"), axis=0)
    if len(pts) <= 2:
        return pts
    order = np.lexsort((pts[:, 1], pts[:, 0]))
    pts = pts[order]

    def cross(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    lower: typing.List[np.ndarray] = []
    for p in pts:
        while len(lower) >= 2 and cross(lower[-2], lower[-1], p) <= 0:
            lower.pop()
        lower.append(p)
    upper: typing.List[np.ndarray] = []
    for p in pts[::-1]:
        while len(upper) >= 2 and cross(upper[-2], upper[-1], p) <= 0:
            upper.pop()
        upper.append(p)
    return np.array(lower[:-1] + upper[:-1])


def min_area_rect(points) -> np.ndarray:
    """Minimum-area rotated rectangle of a point set.

    Returns the 4 corners in a consistent cyclic (clockwise in image/y-down
    coordinates) order. Replaces ``cv2.minAreaRect``+``cv2.boxPoints``
    (used at /root/reference/keras_ocr/detection.py:273 and tools.py:142-143)
    via convex hull + rotating calipers: the optimal rectangle shares an
    edge direction with some hull edge.
    """
    pts = np.asarray(points, dtype="float64").reshape(-1, 2)
    hull = convex_hull(pts)
    if len(hull) == 1:
        return np.tile(hull[0], (4, 1)).astype("float32")
    if len(hull) == 2:
        # Degenerate: zero-thickness rectangle along the segment.
        a, b = hull
        return np.array([a, b, b, a], dtype="float32")
    edges = np.roll(hull, -1, axis=0) - hull
    angles = np.arctan2(edges[:, 1], edges[:, 0])
    best = None
    for theta in np.unique(np.mod(angles, np.pi / 2)):
        c, s = np.cos(theta), np.sin(theta)
        rot = np.array([[c, s], [-s, c]])
        proj = hull @ rot.T
        mins, maxs = proj.min(axis=0), proj.max(axis=0)
        area = np.prod(maxs - mins)
        if best is None or area < best[0]:
            best = (area, theta, mins, maxs)
    _, theta, mins, maxs = best
    c, s = np.cos(theta), np.sin(theta)
    rot = np.array([[c, s], [-s, c]])
    (x0, y0), (x1, y1) = mins, maxs
    corners_rot = np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]])
    # In image coordinates (y down) this ordering is clockwise on screen.
    return (corners_rot @ rot).astype("float32")


def get_perspective_transform(src, dst) -> np.ndarray:
    """3x3 homography mapping 4 src points onto 4 dst points.

    Closed-form ``cv2.getPerspectiveTransform`` replacement
    (used at /root/reference/keras_ocr/tools.py:96, detection.py:177-190).
    """
    src = np.asarray(src, dtype="float64")
    dst = np.asarray(dst, dtype="float64")
    A = np.zeros((8, 8))
    b = np.zeros(8)
    for i in range(4):
        x, y = src[i]
        u, v = dst[i]
        A[2 * i] = [x, y, 1, 0, 0, 0, -u * x, -u * y]
        A[2 * i + 1] = [0, 0, 0, x, y, 1, -v * x, -v * y]
        b[2 * i] = u
        b[2 * i + 1] = v
    h = np.linalg.solve(A, b)
    return np.append(h, 1.0).reshape(3, 3)


def warp_perspective(image, M, dsize, cval=0.0):
    """Apply homography ``M`` (src->dst) to ``image``, output size (w, h).

    ``cv2.warpPerspective`` analog: for each destination pixel (x, y), sample
    the source bilinearly at ``M^-1 @ (x, y, 1)``, constant border.
    """
    width, height = dsize
    Minv = np.linalg.inv(M)
    xs, ys = np.meshgrid(np.arange(width, dtype="float64"), np.arange(height, dtype="float64"))
    denom = Minv[2, 0] * xs + Minv[2, 1] * ys + Minv[2, 2]
    src_x = (Minv[0, 0] * xs + Minv[0, 1] * ys + Minv[0, 2]) / denom
    src_y = (Minv[1, 0] * xs + Minv[1, 1] * ys + Minv[1, 2]) / denom
    coords = np.stack([src_y.ravel(), src_x.ravel()])
    image = np.asarray(image)
    input_dtype = image.dtype
    if image.ndim == 2:
        out = _ndimage.map_coordinates(
            image.astype("float64"), coords, order=1, mode="constant", cval=cval
        ).reshape(height, width)
    else:
        out = np.stack(
            [
                _ndimage.map_coordinates(
                    image[..., c].astype("float64"),
                    coords,
                    order=1,
                    mode="constant",
                    cval=cval,
                ).reshape(height, width)
                for c in range(image.shape[-1])
            ],
            axis=-1,
        )
    if np.issubdtype(input_dtype, np.integer):
        out = np.clip(np.rint(out), np.iinfo(input_dtype).min, np.iinfo(input_dtype).max)
    return out.astype(input_dtype)


def _linear_taps(dst: int, src: int):
    """Two-tap sample indices/weights per output coordinate.

    cv2.resize INTER_LINEAR convention: output pixel i samples the source
    at (i + 0.5) * src/dst - 0.5 with 2-tap interpolation and replicated
    borders — no antialiasing prefilter, matching the reference's
    cv2.resize calls (reference tools.py:394,443,446) even on downscale.
    """
    x = (np.arange(dst, dtype="float64") + 0.5) * (src / dst) - 0.5
    x0 = np.floor(x).astype("int64")
    frac = x - x0
    lo = np.clip(x0, 0, src - 1)
    hi = np.clip(x0 + 1, 0, src - 1)
    return lo, hi, frac


def _resize(image, width: int, height: int):
    """Separable bilinear resize with cv2.resize INTER_LINEAR semantics."""
    image = np.asarray(image)
    width, height = int(width), int(height)
    if image.shape[0] == height and image.shape[1] == width:
        return image
    input_dtype = image.dtype
    arr = image.astype("float64")
    lo, hi, frac = _linear_taps(height, arr.shape[0])
    f = frac.reshape((-1,) + (1,) * (arr.ndim - 1))
    arr = arr[lo] * (1.0 - f) + arr[hi] * f
    lo, hi, frac = _linear_taps(width, arr.shape[1])
    f = frac.reshape((1, -1) + (1,) * (arr.ndim - 2))
    arr = arr[:, lo] * (1.0 - f) + arr[:, hi] * f
    if np.issubdtype(input_dtype, np.integer):
        info = np.iinfo(input_dtype)
        arr = np.clip(np.rint(arr), info.min, info.max)
    return arr.astype(input_dtype)


# ---------------------------------------------------------------------------
# Image IO
# ---------------------------------------------------------------------------


_URL_RE = re.compile(r"^https?://", re.IGNORECASE)


def read(filepath_or_buffer: typing.Union[str, io.BytesIO, np.ndarray]):
    """Read a file, URL, buffer, or ndarray into an RGB uint8 image.

    Mirrors /root/reference/keras_ocr/tools.py:19-38 with PIL instead of
    cv2.imread/imdecode.
    """
    if isinstance(filepath_or_buffer, np.ndarray):
        return filepath_or_buffer
    if hasattr(filepath_or_buffer, "read"):
        image = PIL.Image.open(filepath_or_buffer)
    elif isinstance(filepath_or_buffer, str):
        if _URL_RE.match(filepath_or_buffer):
            with urllib.request.urlopen(filepath_or_buffer) as response:
                return read(io.BytesIO(response.read()))
        assert os.path.isfile(filepath_or_buffer), (
            "Could not find image at path: " + filepath_or_buffer
        )
        image = PIL.Image.open(filepath_or_buffer)
    else:
        raise ValueError(f"Unsupported input type: {type(filepath_or_buffer)}")
    if image.mode != "RGB":
        image = image.convert("RGB")
    return np.array(image)


# ---------------------------------------------------------------------------
# Box utilities
# ---------------------------------------------------------------------------


def get_rotated_width_height(box):
    """Width/height of a rotated rectangle given tl-tr-br-bl corners.

    (/root/reference/keras_ocr/tools.py:41-57, scipy.spatial.cdist replaced
    with plain norms.)
    """
    box = np.asarray(box, dtype="float64")
    w = (np.linalg.norm(box[0] - box[1]) + np.linalg.norm(box[2] - box[3])) / 2
    h = (np.linalg.norm(box[0] - box[3]) + np.linalg.norm(box[1] - box[2])) / 2
    return int(w), int(h)


def get_rotated_box(points) -> typing.Tuple[np.ndarray, float]:
    """Min-area rotated box corners in tl-tr-br-bl order plus rotation angle.

    Behavior-parity port of /root/reference/keras_ocr/tools.py:533-581
    (shapely minimum_rotated_rectangle replaced by :func:`min_area_rect`,
    imutils-style ordering preserved).
    """
    points = np.asarray(points, dtype="float64")
    if len(np.unique(points, axis=0)) >= 3:
        pts = min_area_rect(points)
    else:
        pts = points
    x_sorted = pts[np.argsort(pts[:, 0]), :]
    left_most = x_sorted[:2, :]
    right_most = x_sorted[2:, :]
    left_most = left_most[np.argsort(left_most[:, 1]), :]
    tl, bl = left_most
    distances = np.linalg.norm(right_most - tl, axis=1)
    br, tr = right_most[np.argsort(distances)[::-1], :]
    pts = np.array([tl, tr, br, bl], dtype="float32")
    with np.errstate(divide="ignore", invalid="ignore"):
        rotation = np.arctan((tl[0] - bl[0]) / (tl[1] - bl[1]))
    if np.isnan(rotation):
        rotation = 0.0
    return pts, float(rotation)


def warpBox(
    image,
    box,
    target_height=None,
    target_width=None,
    margin=0,
    cval=None,
    return_transform=False,
    skip_rotate=False,
):
    """Perspective-crop a quadrilateral region into an axis-aligned rectangle.

    Behavior parity with /root/reference/keras_ocr/tools.py:61-117 (the
    host path; the batched on-device version is
    :func:`keras_ocr_tpu.ops.warp.warp_boxes`).
    """
    if cval is None:
        cval = (0, 0, 0) if len(image.shape) == 3 else 0
    box = np.asarray(box, dtype="float32")
    if not skip_rotate:
        box, _ = get_rotated_box(box)
    w, h = get_rotated_width_height(box)
    assert (target_width is None and target_height is None) or (
        target_width is not None and target_height is not None
    ), "Either both or neither of target width and height must be provided."
    if target_width is None and target_height is None:
        target_width = w
        target_height = h
    scale = min(target_width / w, target_height / h)
    M = get_perspective_transform(
        src=box,
        dst=np.array(
            [
                [margin, margin],
                [scale * w - margin, margin],
                [scale * w - margin, scale * h - margin],
                [margin, scale * h - margin],
            ],
            dtype="float32",
        ),
    )
    crop = warp_perspective(image, M, dsize=(int(scale * w), int(scale * h)))
    target_shape = (
        (target_height, target_width, 3) if len(image.shape) == 3 else (target_height, target_width)
    )
    full = (np.zeros(target_shape) + cval).astype("uint8")
    full[: crop.shape[0], : crop.shape[1]] = crop
    if return_transform:
        return full, M
    return full


def flatten(list_of_lists):
    return [item for sublist in list_of_lists for item in sublist]


def combine_line(line):
    """Combine (box, character) entries of one line into a (box, text) word.

    (/root/reference/keras_ocr/tools.py:124-147.)
    """
    text = "".join([character if character is not None else "" for _, character in line])
    box = np.concatenate(
        [coords[:2] for coords, _ in line]
        + [np.array([coords[3], coords[2]]) for coords, _ in reversed(line)]
    ).astype("float32")
    first_point = box[0]
    box = min_area_rect(box)
    box = np.array(np.roll(box, -np.linalg.norm(box - first_point, axis=1).argmin(), 0))
    return box, text


def adjust_boxes(boxes, scale=1, boxes_format: str = "boxes"):
    """Scale boxes provided in any of the three reference formats.

    (/root/reference/keras_ocr/tools.py:232-260.)
    """
    if scale == 1:
        return boxes
    if boxes_format == "boxes":
        return np.array(boxes) * scale
    if boxes_format == "lines":
        return [
            [(np.array(box) * scale, character) for box, character in line] for line in boxes
        ]
    if boxes_format == "predictions":
        return [(word, np.array(box) * scale) for word, box in boxes]
    raise NotImplementedError(f"Unsupported boxes format: {boxes_format}")


def augment(
    boxes,
    augmenter,
    image=None,
    boxes_format="boxes",
    image_shape=None,
    area_threshold=0.5,
    min_area=None,
):
    """Jointly augment an image and its boxes, dropping mostly-cropped boxes.

    Behavior parity with /root/reference/keras_ocr/tools.py:263-353, taking a
    :class:`keras_ocr_tpu.data.augmentation.Augmenter` instead of imgaug.
    """
    if image is None and image_shape is None:
        raise ValueError('One of "image" or "image_shape" must be provided.')
    augmenter = augmenter.to_deterministic()

    if image is not None:
        image_augmented = augmenter(image=image)
        image_shape = image.shape[:2]
        new_shape = image_augmented.shape[:2]
    else:
        image_augmented = None
        # Track where the bottom-right corner lands to learn the new extent.
        corner = augmenter.augment_keypoints(
            np.array([[image_shape[1], image_shape[0]]], dtype="float32"),
            image_shape,
        )[0]
        new_shape = (corner[1], corner[0])

    def transform(box):
        """Move one quad through the augmenter; returns (keep, clipped).

        A box survives when, after clipping to the augmented canvas, it
        retains at least ``area_threshold`` of its (augmented) area and —
        when ``min_area`` is set — exceeds that absolute floor. Areas use
        the reference's int32-rounded shoelace convention.
        """
        moved = augmenter.augment_keypoints(
            np.asarray(box, dtype="float32"), image_shape
        )
        full_area = polygon_area(moved.astype("int32"))
        if full_area == 0:
            return False, moved
        clipped = np.stack(
            [
                moved[:, 0].clip(0, new_shape[1]),
                moved[:, 1].clip(0, new_shape[0]),
            ],
            axis=1,
        )
        visible_area = polygon_area(clipped.astype("int32"))
        keep = visible_area / full_area >= area_threshold and (
            min_area is None or visible_area > min_area
        )
        return keep, clipped

    if boxes_format == "boxes":
        survivors = [box for keep, box in map(transform, boxes) if keep]
    elif boxes_format == "lines":
        survivors = []
        for line in boxes:
            kept = [
                (box, character)
                for (keep, box), character in (
                    (transform(box), character) for box, character in line
                )
                if keep
            ]
            # A line whose every character fell outside disappears entirely.
            if kept:
                survivors.append(kept)
    elif boxes_format == "predictions":
        survivors = []
        for word, box in boxes:
            keep, clipped = transform(box)
            if keep:
                survivors.append((word, clipped))
    else:
        raise NotImplementedError(f"Unsupported boxes format: {boxes_format}")
    return image_augmented, survivors


def pad(image, width: int, height: int, cval: int = 255):
    """Bottom/right-pad an image up to (height, width) with ``cval``.

    Behavior contract: /root/reference/keras_ocr/tools.py:356-375 (content
    anchored at the top-left corner, fill value ``cval``).
    """
    src_h, src_w = image.shape[:2]
    if src_h > height or src_w > width:
        raise ValueError(
            f"Cannot pad a ({src_h}, {src_w}) image to smaller "
            f"({height}, {width})."
        )
    canvas = np.full((height, width) + image.shape[2:], cval, dtype=image.dtype)
    canvas[:src_h, :src_w] = image
    return canvas


def resize_image(image, max_scale, max_size):
    """Resize subject to a maximum scale and maximum size; returns (image, scale).

    Behavior contract: /root/reference/keras_ocr/tools.py:378-398 — the
    applied scale is ``max_scale`` unless that would push the longest side
    past ``max_size``, in which case the image is scaled to ``max_size``.
    """
    scale = min(max_scale, max_size / max(image.shape))
    return (
        _resize(
            image, width=int(image.shape[1] * scale), height=int(image.shape[0] * scale)
        ),
        scale,
    )


def fit(image, width: int, height: int, cval: int = 255, mode="letterbox", return_scale=False):
    """Fit an image to (height, width) by letterboxing or cropping.

    Behavior contract: /root/reference/keras_ocr/tools.py:402-452 —
    letterbox scales by the tighter axis and fills the rest with ``cval``
    (output is always 3-channel uint8); crop scales by the looser axis and
    trims the overflow. An already-fitting image passes through untouched.
    """
    src_h, src_w = image.shape[:2]
    if (src_h, src_w) == (height, width):
        return (image, 1) if return_scale else image
    if mode not in ("letterbox", "crop"):
        raise NotImplementedError(f"Unsupported mode: {mode}")

    width_scale = width / src_w
    height_scale = height / src_h
    width_bound = (
        width_scale <= height_scale
        if mode == "letterbox"
        else width_scale >= height_scale
    )
    if width_bound:
        # Width is the driving axis: it lands exactly on ``width`` and the
        # height follows (truncated to int, as the reference does).
        scale = width_scale
        resized = _resize(image, width=width, height=int(width_scale * src_h))
    else:
        scale = height_scale
        resized = _resize(image, width=int(height_scale * src_w), height=height)

    if mode == "crop":
        fitted = resized[:height, :width]
    else:
        fitted = np.full((height, width, 3), cval, dtype="uint8")
        visible = resized[:height, :width]
        fitted[: visible.shape[0], : visible.shape[1]] = visible
    return (fitted, scale) if return_scale else fitted


def read_and_fit(
    filepath_or_array: typing.Union[str, np.ndarray],
    width: int,
    height: int,
    cval: int = 255,
    mode="letterbox",
):
    """Read an image and fit it to the specified size.

    (/root/reference/keras_ocr/tools.py:455-481.)
    """
    image = read(filepath_or_array) if isinstance(filepath_or_array, str) else filepath_or_array
    image = fit(image=image, width=width, height=height, cval=cval, mode=mode)
    return image


def fix_line(line):
    """Order a line of (box, char) tuples left-to-right or top-to-bottom.

    Returns the fixed line plus "horizontal"/"vertical".
    Behavior contract: /root/reference/keras_ocr/tools.py:584-600 — its
    sum-of-sorted-center-gaps criterion telescopes to the center-spread
    extent per axis, which is what is computed here directly.
    """
    oriented = [(get_rotated_box(box)[0], character) for box, character in line]
    centers = np.array([box.mean(axis=0) for box, _ in oriented])
    x_extent, y_extent = centers.max(axis=0) - centers.min(axis=0)
    if y_extent > x_extent:
        axis, orientation = 1, "vertical"
    else:
        axis, orientation = 0, "horizontal"
    return [oriented[i] for i in centers[:, axis].argsort()], orientation


# ---------------------------------------------------------------------------
# Drawing
# ---------------------------------------------------------------------------


def drawBoxes(image, boxes, color=(255, 0, 0), thickness=5, boxes_format="boxes"):
    """Draw boxes onto an image (PIL polygon outlines instead of cv2.polylines).

    (/root/reference/keras_ocr/tools.py:189-229.)
    """
    if len(boxes) == 0:
        return image
    if boxes_format == "lines":
        boxes = [box for line in boxes for box, _ in line]
    if boxes_format == "predictions":
        boxes = [box for _, box in boxes]
    canvas = PIL.Image.fromarray(np.ascontiguousarray(image))
    draw = PIL.ImageDraw.Draw(canvas)
    for box in boxes:
        pts = [tuple(map(float, point)) for point in np.asarray(box).reshape(-1, 2)]
        draw.line(pts + [pts[0]], fill=tuple(color), width=thickness, joint="curve")
    return np.array(canvas)


def drawAnnotations(image, predictions, ax=None):
    """Render predictions as a boxed image with labels in the margins.

    Same presentation idea as /root/reference/keras_ocr/tools.py:150-186:
    words whose boxes start in the left half of the image are labeled down
    the left margin (top to bottom in reading order), the rest down the
    right margin, each label arrowed to its box's first corner.
    """
    import matplotlib.pyplot as plt

    if ax is None:
        _, ax = plt.subplots()
    ax.imshow(drawBoxes(image=image, boxes=predictions, boxes_format="predictions"))
    ax.set_xticks([])
    ax.set_yticks([])

    img_height, img_width = image.shape[:2]
    in_reading_order = sorted(predictions, key=lambda p: p[1][:, 1].min())
    columns = {
        "left": [p for p in in_reading_order if p[1][:, 0].min() < img_width / 2],
        "right": [p for p in in_reading_order if p[1][:, 0].min() >= img_width / 2],
    }

    def place_label(side, slot, total, text, box):
        # Anchor the arrow at the box's first corner, in axes fractions
        # (matplotlib's y axis points up, the image's points down).
        anchor_x = box[0][0] / img_width
        anchor_y = 1 - box[0][1] / img_height
        ax.annotate(
            text=text,
            xy=(anchor_x, anchor_y),
            xytext=(-0.05 if side == "left" else 1.05, 1 - slot / total),
            xycoords="axes fraction",
            arrowprops={"arrowstyle": "->", "color": "r"},
            color="r",
            fontsize=14,
            horizontalalignment="right" if side == "left" else "left",
        )

    for side, group in columns.items():
        for slot, (text, box) in enumerate(group):
            place_label(side, slot, len(group), text, box)
    return ax


# ---------------------------------------------------------------------------
# Asset download / caching
# ---------------------------------------------------------------------------


def sha256sum(filename):
    """Compute the sha256 hash for a file. (/root/reference/keras_ocr/tools.py:484-492.)"""
    return _filehash(filename, hashlib.sha256())


def md5sum(filename):
    """md5 for files whose upstream publishes only md5 (keras-applications
    EfficientNet checkpoints, tf_keras WEIGHTS_HASHES)."""
    return _filehash(filename, hashlib.md5())


def _filehash(filename, h):
    b = bytearray(128 * 1024)
    mv = memoryview(b)
    with open(filename, "rb", buffering=0) as f:
        for n in iter(lambda: f.readinto(mv), 0):
            h.update(mv[:n])
    return h.hexdigest()


def get_default_cache_dir():
    """Weight/asset cache directory; shares the reference's default so any
    previously downloaded keras-ocr weights are reused.
    (/root/reference/keras_ocr/tools.py:495-498.)"""
    return os.environ.get(
        "KERAS_OCR_TPU_CACHE_DIR",
        os.environ.get(
            "KERAS_OCR_CACHE_DIR", os.path.expanduser(os.path.join("~", ".keras-ocr"))
        ),
    )


def download_and_verify(
    url, sha256=None, cache_dir=None, verbose=True, filename=None, timeout=60
):
    """Download a file into the cache and verify its sha256.

    (/root/reference/keras_ocr/tools.py:501-530.) Unlike the reference,
    the transfer streams to a temporary file that is renamed into place
    only on success — an interrupted download can't masquerade as a
    cached file — and each socket read is bounded by ``timeout`` seconds
    so a stalled connection fails instead of hanging a batch job.
    """
    if cache_dir is None:
        cache_dir = get_default_cache_dir()
    if filename is None:
        filename = os.path.basename(urllib.parse.urlparse(url).path)
    filepath = os.path.join(cache_dir, filename)
    os.makedirs(os.path.split(filepath)[0], exist_ok=True)
    if verbose:
        print("Looking for " + filepath)
    if not os.path.isfile(filepath) or (sha256 and sha256sum(filepath) != sha256):
        if verbose:
            print("Downloading " + filepath)
        partial = filepath + ".partial"
        try:
            with urllib.request.urlopen(url, timeout=timeout) as response:
                with open(partial, "wb") as f:
                    while True:
                        chunk = response.read(1 << 20)
                        if not chunk:
                            break
                        f.write(chunk)
            os.replace(partial, filepath)
        finally:
            if os.path.isfile(partial):
                os.remove(partial)
    if sha256 is not None and sha256 != sha256sum(filepath):
        raise ValueError(f"sha256 mismatch for {filepath} (from {url})")
    return filepath


def safe_extract_zip(zip_path, destination):
    """Extract a zip archive, refusing members that escape ``destination``.

    Every loader extract site funnels through this guard so a hostile or
    corrupted archive (absolute paths, ``..`` traversal — "zip-slip")
    cannot write outside its dataset directory. Truncated archives
    surface as :class:`zipfile.BadZipFile` instead of partially
    extracting. The reference extracts archives unguarded
    (/root/reference/keras_ocr/datasets.py:150-305).
    """
    destination = os.path.realpath(destination)
    with zipfile.ZipFile(zip_path) as zfile:
        for member in zfile.namelist():
            target = os.path.realpath(os.path.join(destination, member))
            if target != destination and not target.startswith(
                destination + os.sep
            ):
                raise ValueError(
                    f"refusing to extract {member!r} from {zip_path}: "
                    f"escapes {destination}"
                )
        zfile.extractall(destination)


def download_and_extract(
    url,
    destination,
    sha256=None,
    cache_dir=None,
    filename=None,
    verbose=True,
):
    """:func:`download_and_verify` + :func:`safe_extract_zip`, retrying once
    when the cached archive is corrupt.

    A cached file that no longer opens as a zip (interrupted write from a
    pre-sha256 run, disk corruption) is deleted and re-downloaded once
    instead of permanently wedging the dataset loader; a second failure
    propagates.
    """
    for attempt in range(2):
        zip_path = download_and_verify(
            url=url,
            sha256=sha256,
            cache_dir=cache_dir,
            filename=filename,
            verbose=verbose,
        )
        try:
            safe_extract_zip(zip_path, destination)
            return zip_path
        except zipfile.BadZipFile:
            if attempt:
                raise
            warnings.warn(f"cached archive {zip_path} is corrupt; re-downloading")
            os.remove(zip_path)
