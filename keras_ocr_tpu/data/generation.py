"""Synthetic scene-text rendering for training data.

Re-implements the reference ``keras_ocr.data_generation``
(/root/reference/keras_ocr/data_generation.py) with PIL + NumPy/scipy
instead of OpenCV and without the abandoned ``essential_generators``
dependency (a built-in corpus-backed sentence generator is used as the
fallback). The public surface is the same: rotation matrices, uniform
contour finding, font filtering, text/image generators, and the full
scene compositor yielding (image, lines) pairs where lines are lists of
(character box, char) tuples.

"Contours" are represented as (N, 2) polygons traced from boolean masks
(scipy.ndimage connected components + hole filling replace
cv2.findContours; matplotlib.path replaces cv2.pointPolygonTest).
"""

from __future__ import annotations

import glob
import itertools
import math
import os
import random
import string
import typing
import zipfile

import numpy as np
import PIL.Image
import PIL.ImageDraw
import PIL.ImageFont
from scipy import ndimage as _ndimage

from .. import tools

LIGATURES = {"\U0000FB01": "fi", "\U0000FB02": "fl"}
LIGATURE_STRING = "".join(LIGATURES.keys())


def get_rotation_matrix(width, height, thetaX=0, thetaY=0, thetaZ=0):
    """3x3 projective matrix rotating about the canvas center.

    (data_generation.py:26-64 — standard XYZ rotation conjugated by
    center translation.)
    """
    translate1 = np.array([[1, 0, width / 2], [0, 1, height / 2], [0, 0, 1]])
    rot_x = np.array(
        [
            [1, 0, 0],
            [0, np.cos(thetaX), -np.sin(thetaX)],
            [0, np.sin(thetaX), np.cos(thetaX)],
        ]
    )
    rot_y = np.array(
        [
            [np.cos(thetaY), 0, np.sin(thetaY)],
            [0, 1, 0],
            [-np.sin(thetaY), 0, np.cos(thetaY)],
        ]
    )
    rot_z = np.array(
        [
            [np.cos(thetaZ), -np.sin(thetaZ), 0],
            [np.sin(thetaZ), np.cos(thetaZ), 0],
            [0, 0, 1],
        ]
    )
    translate2 = np.array([[1, 0, -width / 2], [0, 1, -height / 2], [0, 0, 1]])
    return translate1 @ rot_x @ rot_y @ rot_z @ translate2


def _transform_points(points: np.ndarray, M: np.ndarray) -> np.ndarray:
    """Apply a 3x3 projective matrix to (N, 2) points (cv2.perspectiveTransform)."""
    homog = np.concatenate([points, np.ones((len(points), 1))], axis=1)
    mapped = (M @ homog.T).T
    return (mapped[:, :2] / mapped[:, 2:]).astype("float32")


def _trace_boundary(mask: np.ndarray) -> np.ndarray:
    """Extract an outer boundary polygon from a boolean mask.

    Replaces cv2.findContours for the uniform-contour path: returns the
    pixel coordinates (x, y) of the region's boundary in order (via
    marching around the mask's edge pixels using a contour walk on the
    up-sampled edge set; ordering is by angle around the centroid, which
    is sufficient for the point-in-polygon tests these contours feed).
    """
    ys, xs = np.nonzero(mask & ~_ndimage.binary_erosion(mask))
    if len(xs) == 0:
        return np.zeros((0, 2), dtype="float32")
    points = np.stack([xs, ys], axis=1).astype("float32")
    center = points.mean(axis=0)
    angles = np.arctan2(points[:, 1] - center[1], points[:, 0] - center[0])
    return points[np.argsort(angles)]


class _PolygonTester:
    """Vectorized point-in-polygon with >=0 boundary semantics."""

    def __init__(self, polygon: np.ndarray):
        from matplotlib.path import Path

        self.polygon = np.asarray(polygon, dtype="float64")
        self.path = Path(self.polygon) if len(self.polygon) >= 3 else None

    def contains(self, points: np.ndarray) -> np.ndarray:
        if self.path is None:
            return np.zeros(len(points), dtype=bool)
        points = np.asarray(points, dtype="float64")
        # radius>0 treats boundary points as inside (pointPolygonTest >= 0).
        return self.path.contains_points(points, radius=1e-9) | self.path.contains_points(
            points, radius=-1e-9
        )


def point_in_contour(contour: np.ndarray, point) -> bool:
    """cv2.pointPolygonTest(measureDist=False) >= 0 analog."""
    return bool(_PolygonTester(contour).contains(np.array([point]))[0])


def get_maximum_uniform_contour(image, fontsize, margin=0):
    """Largest light-or-dark uniform area available for text placement.

    (data_generation.py:67-112: gray, box blur by fontsize//2, threshold
    at 127.5, biggest dark/light region with holes filled; None if the
    best area is under (4*fontsize)^2.)
    """
    if margin > 0:
        image = image[margin:-margin, margin:-margin]
    gray = np.asarray(image).astype("float32") @ np.array([0.299, 0.587, 0.114])
    size = max(fontsize // 2, 1)
    blurred = _ndimage.uniform_filter(gray, size=size)
    threshold = blurred > 255 / 2

    def largest(mask):
        labels, count = _ndimage.label(mask, structure=np.ones((3, 3)))
        if count == 0:
            return 0, None
        areas = _ndimage.sum_labels(np.ones_like(labels), labels, np.arange(1, count + 1))
        best = int(np.argmax(areas)) + 1
        return float(areas[best - 1]), _ndimage.binary_fill_holes(labels == best)

    dark_area, dark_mask = largest(~threshold)
    light_area, light_mask = largest(threshold)
    if max(dark_area, light_area) < (4 * fontsize) ** 2:
        return None, None
    if dark_area >= light_area:
        contour, is_dark = _trace_boundary(dark_mask), True
    else:
        contour, is_dark = _trace_boundary(light_mask), False
    if contour is not None and len(contour):
        contour = contour + margin
    return contour, is_dark


def font_supports_alphabet(filepath, alphabet):
    """Check a font's cmap covers the alphabet and renders cleanly.

    (data_generation.py:115-137.)
    """
    import fontTools.ttLib

    if alphabet == "":
        return True
    font = fontTools.ttLib.TTFont(filepath)
    if not all(
        any(ord(c) in table.cmap.keys() for table in font["cmap"].tables)
        for c in alphabet
    ):
        return False
    try:
        font = PIL.ImageFont.truetype(filepath)
        for character in alphabet:
            font.getbbox(character)
    except Exception:  # noqa: BLE001 - any render failure disqualifies
        return False
    return True


# Built-in fallback corpus for the sentence generator (essential_generators
# is not a dependency here).
_CORPUS_WORDS = (
    "the quick brown fox jumps over lazy dog pack my box with five dozen "
    "liquor jugs how vexingly daft zebras jump bright vixens watch for "
    "light rain sphinx of black quartz judge my vow crazy frederick bought "
    "many very exquisite opal jewels jackdaws love big spheres a mad boxer "
    "shot a quick gloved jab to the jaw of his dizzy opponent grumpy "
    "wizards make toxic brew for the evil queen and jack amazingly few "
    "discotheques provide jukeboxes heavy boxes perform waltzes and jigs "
    "street market value order system report number event dock station "
    "coffee window garden signal ticket people silver yellow purple modern "
    "ancient machine quantum circuit"
).split()


def get_text_generator(alphabet=None, lowercase=False, max_string_length=None, rng=None):
    """Yield sentences filtered to an alphabet.

    Same contract as data_generation.py:140-156; uses
    ``essential_generators`` when importable, else a built-in
    corpus-backed sentence generator.
    """
    try:
        import essential_generators

        gen = essential_generators.DocumentGenerator()
        sentence_fn = gen.sentence
    except ImportError:
        rng = rng or random.Random(0)

        def sentence_fn():
            n = rng.randint(3, 12)
            words = [rng.choice(_CORPUS_WORDS) for _ in range(n)]
            if rng.random() < 0.3:
                words.insert(rng.randrange(len(words)), str(rng.randint(0, 9999)))
            sentence = " ".join(words)
            return sentence.capitalize() + rng.choice([".", "", "!", "?"])

    while True:
        sentence = sentence_fn()
        if lowercase:
            sentence = sentence.lower()
        sentence = "".join([s for s in sentence if (alphabet is None or s in alphabet)])
        if max_string_length is not None:
            sentence = sentence[:max_string_length]
        yield sentence


def _strip_line(line):
    """Trim leading/trailing space characters from a line. (:159-176.)"""
    first_character_index = next(
        (index for index, (box, character) in enumerate(line) if not character.isspace()),
        None,
    )
    if first_character_index is None:
        return []
    last_character_index = len(line) - next(
        index for index, (box, character) in enumerate(reversed(line)) if not character.isspace()
    )
    return line[first_character_index:last_character_index]


def _strip_lines(lines):
    lines = [line for line in lines if len(line) > 0]
    lines = [_strip_line(line) for line in lines]
    return [line for line in lines if len(line) > 0]


def get_backgrounds(cache_dir=None):
    """Download the curated 1035-image background set. (:187-209.)"""
    if cache_dir is None:
        cache_dir = tools.get_default_cache_dir()
    backgrounds_dir = os.path.join(cache_dir, "backgrounds")
    backgrounds_zip_path = tools.download_and_verify(
        url="https://github.com/faustomorales/keras-ocr/releases/download/v0.8.4/backgrounds.zip",
        sha256="f263ed0d55de303185cc0f93e9fcb0b13104d68ed71af7aaaa8e8c91389db471",
        filename="backgrounds.zip",
        cache_dir=cache_dir,
    )
    if len(glob.glob(os.path.join(backgrounds_dir, "*"))) != 1035:
        with zipfile.ZipFile(backgrounds_zip_path) as zfile:
            zfile.extractall(backgrounds_dir)
    return glob.glob(os.path.join(backgrounds_dir, "*.jpg"))


def get_fonts(
    cache_dir=None,
    alphabet=string.ascii_letters + string.digits,
    exclude_smallcaps=False,
):
    """Download the curated 2746-font set, filtered to the alphabet. (:212-270.)"""
    if cache_dir is None:
        cache_dir = tools.get_default_cache_dir()
    fonts_zip_path = tools.download_and_verify(
        url="https://github.com/faustomorales/keras-ocr/releases/download/v0.8.4/fonts.zip",
        sha256="d4d90c27a9bc4bf8fff1d2c0a00cfb174c7d5d10f60ed29d5f149ef04d45b700",
        filename="fonts.zip",
        cache_dir=cache_dir,
    )
    fonts_dir = os.path.join(cache_dir, "fonts")
    if len(glob.glob(os.path.join(fonts_dir, "**/*.ttf"))) != 2746:
        print("Unzipping fonts ZIP file.")
        with zipfile.ZipFile(fonts_zip_path) as zfile:
            zfile.extractall(fonts_dir)
    font_filepaths = glob.glob(os.path.join(fonts_dir, "**/*.ttf"))
    if exclude_smallcaps:
        with open(
            tools.download_and_verify(
                url="https://github.com/faustomorales/keras-ocr/releases/download/v0.8.4/fonts_smallcaps.txt",
                sha256="6531c700523c687f02852087530d1ab3c7cc0b59891bbecc77726fbb0aabe68e",
                filename="fonts_smallcaps.txt",
                cache_dir=cache_dir,
            ),
            "r",
            encoding="utf8",
        ) as f:
            smallcaps_fonts = [
                origpath.replace("/", os.path.sep) for origpath in f.read().split("\n")
            ]
            font_filepaths = [
                filepath
                for filepath in font_filepaths
                if os.path.join(*filepath.split(os.sep)[-2:]) not in smallcaps_fonts
            ]
    if alphabet != "":
        font_filepaths = [
            filepath
            for filepath in font_filepaths
            if font_supports_alphabet(filepath=filepath, alphabet=alphabet)
        ]
    return font_filepaths


def convert_lines_to_paragraph(lines):
    """Lines of (box, char) -> multi-line string. (:273-276.)"""
    return "\n".join(["".join([c[-1] for c in line]) for line in lines])


def convert_image_generator_to_recognizer_input(
    image_generator, max_string_length, target_width, target_height, margin=0
):
    """Scene generator -> (cropped line image, sentence) pairs. (:279-314.)"""
    while True:
        image, lines = next(image_generator)
        if len(lines) == 0:
            continue
        for line in lines:
            line = _strip_line(line[:max_string_length])
            if not line:
                continue
            box, sentence = tools.combine_line(line)
            while "  " in sentence:
                sentence = sentence.replace("  ", " ")
            crop = tools.warpBox(
                image=image,
                box=box,
                target_width=target_width,
                target_height=target_height,
                margin=margin,
                skip_rotate=True,
            )
            yield crop, sentence


def _char_metrics(font: PIL.ImageFont.FreeTypeFont, character: str):
    """((width, height), (offset_x, offset_y)) like PIL's font.font.getsize."""
    try:
        return font.font.getsize(character)
    except AttributeError:
        left, top, right, bottom = font.getbbox(character)
        return (right - left, bottom - top), (left, top)


def draw_text_image(
    text,
    fontsize,
    height,
    width,
    fonts,
    use_ligatures=False,
    thetaX=0,
    thetaY=0,
    thetaZ=0,
    color=(0, 0, 0),
    permitted_contour=None,
    draw_contour=False,
):
    """Render text into a transparent canvas, tracking character boxes.

    Behavior parity with data_generation.py:317-494: glyphs are laid out
    left-to-right inside the (pre-transformed) permitted contour,
    advancing by fontsize on collisions and wrapping to new lines; the
    canvas is then perspective-warped by the 3-D rotation matrix and the
    tracked character boxes are transformed along with it. Ligature (fi/fl)
    splitting is supported.

    Returns (RGBA image, lines) where lines are lists of (box(4,2), char).
    """
    if not use_ligatures:
        fonts = {
            subalphabet: PIL.ImageFont.truetype(font_path, size=fontsize)
            if font_path is not None
            else PIL.ImageFont.load_default()
            for subalphabet, font_path in fonts.items()
        }
    else:
        updated = {}
        for subalphabet, font_path in fonts.items():
            font = (
                PIL.ImageFont.truetype(font_path, size=fontsize)
                if font_path is not None
                else PIL.ImageFont.load_default()
            )
            try:
                for ligature in LIGATURES:
                    _char_metrics(font, ligature)
                subalphabet += LIGATURE_STRING
            except (UnicodeEncodeError, OSError):
                pass
            updated[subalphabet] = font
        fonts = updated
        for insert, search in LIGATURES.items():
            if any(insert in subalphabet for subalphabet in fonts):
                text = text.replace(search, insert)
    character_font_pairs = [
        (
            character,
            next(font for subalphabet, font in fonts.items() if character in subalphabet),
        )
        for character in text
        if any(character in subalphabet for subalphabet in fonts)
    ]
    M = get_rotation_matrix(
        width=width, height=height, thetaZ=thetaZ, thetaX=thetaX, thetaY=thetaY
    )
    if permitted_contour is None:
        permitted_contour = np.array(
            [[0, 0], [width, 0], [width, height], [0, height]]
        ).astype("float32")
    if not character_font_pairs:
        return (
            np.zeros((height, width, 4), dtype="uint8"),
            [],
        )
    character_sizes = np.array(
        [_char_metrics(font, character) for character, font in character_font_pairs]
    )
    min_character_size = character_sizes.sum(axis=1).min()
    transformed_contour = compute_transformed_contour(
        width=width,
        height=height,
        fontsize=max(int(min_character_size), 1),
        M=M,
        contour=permitted_contour,
    )
    if transformed_contour is None or len(transformed_contour) < 3:
        return np.zeros((height, width, 4), dtype="uint8"), []
    tester = _PolygonTester(transformed_contour)
    start_x = transformed_contour[:, 0].min()
    start_y = transformed_contour[:, 1].min()
    end_x = transformed_contour[:, 0].max()
    end_y = transformed_contour[:, 1].max()
    image = PIL.Image.new(mode="RGBA", size=(width, height), color=(255, 255, 255, 0))
    draw = PIL.ImageDraw.Draw(image)
    lines_raw: typing.List[typing.List[typing.Tuple[np.ndarray, str]]] = [[]]
    x = start_x
    y = start_y
    max_y = start_y
    out_of_space = False
    for character_index, (character, font) in enumerate(character_font_pairs):
        if out_of_space:
            break
        (character_width, character_height), (offset_x, offset_y) = character_sizes[
            character_index
        ]
        if character in LIGATURES:
            subcharacters = LIGATURES[character]
            dx = character_width / len(subcharacters)
        else:
            subcharacters = character
            dx = character_width
        x2, y2 = (x + character_width + offset_x, y + character_height + offset_y)
        while not tester.contains(
            np.array([[x, y], [x2, y], [x2, y2], [x, y2]], dtype="float64")
        ).all():
            if x2 > end_x:
                dy = max(1, max_y - y)
                if y + dy > end_y:
                    out_of_space = True
                    break
                y += dy
                x = start_x
            else:
                x += fontsize
            if len(lines_raw[-1]) > 0:
                lines_raw.append([])
            x2, y2 = (x + character_width + offset_x, y + character_height + offset_y)
        if out_of_space:
            break
        max_y = max(y + character_height + offset_y, max_y)
        draw.text(xy=(x, y), text=character, fill=tuple(color) + (255,), font=font)
        for subcharacter in subcharacters:
            lines_raw[-1].append(
                (
                    np.array(
                        [
                            [x + offset_x, y + offset_y],
                            [x + dx + offset_x, y + offset_y],
                            [x + dx + offset_x, y2],
                            [x + offset_x, y2],
                        ]
                    ).astype("float32"),
                    subcharacter,
                )
            )
            x += dx
    image = tools.warp_perspective(np.array(image), M, dsize=(width, height))
    if draw_contour:
        image = _draw_polygon(image, permitted_contour, color=(255, 0, 0, 255), thickness=max(int(width / 100), 1))
    lines_stripped = _strip_lines(lines_raw)
    lines_transformed = [
        [(_transform_points(coords, M), character) for coords, character in line]
        for line in lines_stripped
    ]
    return image, lines_transformed


def _draw_polygon(image, polygon, color, thickness):
    canvas = PIL.Image.fromarray(np.ascontiguousarray(image))
    draw = PIL.ImageDraw.Draw(canvas)
    pts = [tuple(map(float, p)) for p in np.asarray(polygon).reshape(-1, 2)]
    draw.line(pts + [pts[0]], fill=tuple(color), width=thickness)
    return np.array(canvas)


def compute_transformed_contour(width, height, fontsize, M, contour, minarea=0.5):
    """Pre-transform drawing contour: which character slots stay visible.

    (data_generation.py:497-574: spacing grid of fontsize/2 slots,
    transformed by M, kept if inside the contour and not overly
    shrunk, dilated and merged into the connected region containing the
    first surviving slot.)
    """
    spacing = math.ceil(fontsize / 2)
    xslots = int(np.floor(width / spacing))
    yslots = int(np.floor(height / spacing))
    if xslots < 1 or yslots < 1:
        return None
    ys, xs = np.mgrid[:yslots, :xslots]
    basis = np.concatenate([xs[..., np.newaxis], ys[..., np.newaxis]], axis=-1).reshape(
        (-1, 2)
    )
    basis = basis * spacing
    slots_pretransform = np.concatenate(
        [
            (basis + offset)[:, np.newaxis, :]
            for offset in [[0, 0], [spacing, 0], [spacing, spacing], [0, spacing]]
        ],
        axis=1,
    ).astype("float64")
    slots = _transform_points(slots_pretransform.reshape(-1, 2), M)
    tester = _PolygonTester(contour)
    inside = tester.contains(slots).reshape(-1, 4).all(axis=1)
    slots = slots.reshape(-1, 4, 2)
    areas = (
        np.abs(
            (slots[:, 0, 0] * slots[:, 1, 1] - slots[:, 0, 1] * slots[:, 1, 0])
            + (slots[:, 1, 0] * slots[:, 2, 1] - slots[:, 1, 1] * slots[:, 2, 0])
            + (slots[:, 2, 0] * slots[:, 3, 1] - slots[:, 2, 1] * slots[:, 3, 0])
            + (slots[:, 3, 0] * slots[:, 0, 1] - slots[:, 3, 1] * slots[:, 0, 0])
        )
        / 2
    )
    keep = (areas > minarea * spacing * spacing) & inside
    slots_filtered = slots_pretransform[keep]
    if len(slots_filtered) == 0:
        return None
    # Rasterize the surviving (axis-aligned, pre-transform) slots, dilate
    # by the spacing, and keep the region containing the first slot.
    mask = np.zeros((height, width), dtype=bool)
    for quad in slots_filtered:
        x0, y0 = quad[0]
        x1b = min(int(x0) + spacing + 1, width)
        y1b = min(int(y0) + spacing + 1, height)
        mask[int(y0) : y1b, int(x0) : x1b] = True
    mask = _ndimage.binary_dilation(mask, structure=np.ones((spacing, spacing)))
    labels, _ = _ndimage.label(mask, structure=np.ones((3, 3)))
    x, y = slots_filtered[0][0]
    seed_label = labels[min(int(y), height - 1), min(int(x), width - 1)]
    if seed_label == 0:
        return None
    region = _ndimage.binary_fill_holes(labels == seed_label)
    return _trace_boundary(region)


def get_image_generator(
    height,
    width,
    font_groups,
    text_generator,
    font_size: typing.Union[int, typing.Tuple[int, int]] = 18,
    backgrounds: typing.Optional[typing.List] = None,
    background_crop_mode="crop",
    rotationX: typing.Union[int, typing.Tuple[int, int]] = 0,
    rotationY: typing.Union[int, typing.Tuple[int, int]] = 0,
    rotationZ: typing.Union[int, typing.Tuple[int, int]] = 0,
    margin=0,
    use_ligatures=False,
    augmenter=None,
    draw_contour=False,
    draw_contour_text=False,
):
    """Full scene compositor: backgrounds + rendered text + boxes.

    (data_generation.py:577-726.)
    """
    if backgrounds is None:
        backgrounds = [np.zeros((height, width, 3), dtype="uint8")]
    alphabet = "".join(font_groups.keys())
    assert len(set(alphabet)) == len(
        alphabet
    ), "Each character can appear in the subalphabet for only one font group."
    for text, background_index, current_font_groups in zip(
        text_generator,
        itertools.cycle(range(len(backgrounds))),
        zip(
            *[
                itertools.cycle(
                    [
                        (subalphabet, font_filepath)
                        for font_filepath in font_group_filepaths
                    ]
                )
                for subalphabet, font_group_filepaths in font_groups.items()
            ]
        ),
    ):
        if background_index == 0:
            random.shuffle(backgrounds)
        current_font_groups = dict(current_font_groups)
        current_font_size = (
            np.random.randint(low=font_size[0], high=font_size[1])
            if isinstance(font_size, tuple)
            else font_size
        )
        current_rotation_x, current_rotation_y, current_rotation_z = [
            (
                np.random.uniform(low=rotation[0], high=rotation[1])
                if isinstance(rotation, tuple)
                else rotation
            )
            * np.pi
            / 180
            for rotation in [rotationX, rotationY, rotationZ]
        ]
        current_background_filepath_or_array = backgrounds[background_index]
        current_background = (
            tools.read(current_background_filepath_or_array)
            if isinstance(current_background_filepath_or_array, str)
            else current_background_filepath_or_array
        )
        if augmenter is not None:
            current_background = augmenter(images=[current_background])[0]
        if (
            current_background.shape[0] != height
            or current_background.shape[1] != width
        ):
            current_background = tools.fit(
                current_background,
                width=width,
                height=height,
                mode=background_crop_mode,
            )
        permitted_contour, is_dark = get_maximum_uniform_contour(
            image=current_background, fontsize=current_font_size, margin=margin
        )
        if permitted_contour is None:
            continue
        random_color_values = np.random.randint(low=0, high=50, size=3)
        text_color = (
            tuple(np.array([255, 255, 255]) - random_color_values)
            if is_dark
            else tuple(random_color_values)
        )
        text_image, lines = draw_text_image(
            text=text,
            width=width,
            height=height,
            fontsize=current_font_size,
            fonts=current_font_groups,
            thetaX=current_rotation_x,
            thetaY=current_rotation_y,
            thetaZ=current_rotation_z,
            use_ligatures=use_ligatures,
            permitted_contour=permitted_contour,
            color=text_color,
            draw_contour=draw_contour_text,
        )
        alpha = text_image[..., -1:].astype("float32") / 255
        image = (alpha * text_image[..., :3] + (1 - alpha) * current_background).astype(
            "uint8"
        )
        if draw_contour:
            image = _draw_polygon(
                image,
                permitted_contour,
                color=(255, 0, 0),
                thickness=max(int(width / 100), 1),
            )
        yield image, lines
