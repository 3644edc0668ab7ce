"""Text detection: CRAFT model facade, post-processing, and Detector API.

Public surface mirrors the reference ``keras_ocr.detection``
(/root/reference/keras_ocr/detection.py): ``compute_input``,
``get_gaussian_heatmap``, ``getBoxes``, ``Detector`` — but the model is a
Flax CRAFT (:mod:`keras_ocr_tpu.models.craft`) and the hot inference path
runs heatmap post-processing on-device
(:mod:`keras_ocr_tpu.ops.postprocess`). ``getBoxes`` here is the faithful
host (NumPy/scipy) implementation of the reference algorithm — used as the
oracle for the device kernels and available as a fallback.
"""

from __future__ import annotations

import typing
import warnings

import numpy as np
import jax
import jax.numpy as jnp
from scipy import ndimage as _ndimage

from . import tools
from .models.craft import CRAFT, fold_bn_variables
from .ops import image as image_ops
from .ops import postprocess as postprocess_ops

# API parity with the reference module attribute (detection.py:647-658).
from .data.detection_targets import compute_maps  # noqa: F401,E402
from .weights import DETECTOR_PRETRAINED as PRETRAINED_WEIGHTS  # noqa: E402

# Hard ceiling for the device component-cap escalation: the post-process
# staircase tables are O(H x cap), so this bounds memory on degenerate
# (noise-saturated) heatmaps while covering any real scene.
MAX_COMPONENTS_CEILING = 1024

# Hard ceiling for the labeling-sweep escalation: sweeps are unrolled into
# the compiled program, so this bounds compile time; real heatmaps converge
# in 1-2 sweeps and the device kernel PROVES convergence per call, so a
# still-unconverged result at this ceiling (a >64-direction-change
# serpentine) falls back to the exact host oracle instead.
MAX_SWEEPS_CEILING = 64
DEFAULT_NUM_SWEEPS = 8


def compute_input(image):
    """Host NumPy ImageNet normalization (detection.py:34-42)."""
    image = np.asarray(image).astype("float32")
    mean = np.array([0.485, 0.456, 0.406])
    variance = np.array([0.229, 0.224, 0.225])
    return (image - mean * 255) / (variance * 255)


def invert_input(X):
    """Inverse of :func:`compute_input` (detection.py:45-52)."""
    mean = np.array([0.485, 0.456, 0.406])
    variance = np.array([0.229, 0.224, 0.225])
    return (np.asarray(X) * variance * 255 + mean * 255).clip(0, 255).astype("uint8")


def get_gaussian_heatmap(size=512, distanceRatio=3.34):
    """Isotropic 2-D gaussian template for detector GT (detection.py:55-62)."""
    v = np.abs(np.linspace(-size / 2, size / 2, num=size))
    x, y = np.meshgrid(v, v)
    g = np.sqrt(x**2 + y**2)
    g *= distanceRatio / (size / 2)
    g = np.exp(-(1 / 2) * (g**2))
    g *= 255
    return g.clip(0, 255).astype("uint8")


_FOUR_CONNECTED = np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]])


def _dilate_cv2_style(mask: np.ndarray, niter: int) -> np.ndarray:
    """Set dilation by a (1+niter)^2 square with cv2's default anchor.

    cv2.dilate computes dst(x) = max src(x + o) for offsets
    o in [-anchor, k-1-anchor] with anchor = k//2, i.e. the set grows by
    ``k//2`` toward +x/+y and ``k-1-k//2`` toward -x/-y.
    """
    k = 1 + niter
    a = k // 2
    b = k - 1 - a
    out = np.zeros_like(mask)
    height, width = mask.shape
    for dy in range(-b, a + 1):
        # A source pixel p lights destination p + (dy, dx).
        yd0, yd1 = max(dy, 0), height + min(dy, 0)
        ys0, ys1 = max(-dy, 0), height + min(-dy, 0)
        for dx in range(-b, a + 1):
            xd0, xd1 = max(dx, 0), width + min(dx, 0)
            xs0, xs1 = max(-dx, 0), width + min(-dx, 0)
            out[yd0:yd1, xd0:xd1] |= mask[ys0:ys1, xs0:xs1]
    return out


def _first_contour_pixels(mask: np.ndarray) -> np.ndarray:
    """Pixels backing ``cv2.findContours(mask, RETR_TREE, ...)[0]``.

    The reference fits its rectangle to only the FIRST returned contour
    (detection.py:267-273). Empirically (cv2 5.0, the RETR_TREE call the
    reference makes): parents precede their children in the returned list
    — a hole border or a blob nested inside another blob's hole never
    takes index 0 — and among TOP-LEVEL outer borders the ordering is
    reverse raster discovery, i.e. ``contours[0]`` is the top-level blob
    whose topmost-leftmost pixel comes LAST in raster order. For
    min-rect / bbox purposes a border is equivalent to its blob's pixel
    set (same convex hull and extrema), so this returns the selected
    blob's pixels; single-blob masks (the overwhelmingly common case)
    are returned unchanged.
    """
    labels, n_blobs = _ndimage.label(mask, structure=np.ones((3, 3), bool))
    if n_blobs <= 1:
        return mask
    width = mask.shape[1]
    blobs = [labels == blob_id for blob_id in range(1, n_blobs + 1)]
    filled = [_ndimage.binary_fill_holes(blob) for blob in blobs]

    best_index, best_pixels = -1, mask
    for blob_id, blob in enumerate(blobs):
        ys, xs = np.nonzero(blob)
        top = ys.min()
        seed_x = xs[ys == top].min()
        # Nested inside another blob's filled region -> not top-level.
        if any(
            other[top, seed_x]
            for other_id, other in enumerate(filled)
            if other_id != blob_id
        ):
            continue
        index = top * width + seed_x
        if index > best_index:
            best_index, best_pixels = index, blob
    return best_pixels


def getBoxes(
    y_pred,
    detection_threshold=0.7,
    text_threshold=0.4,
    link_threshold=0.4,
    size_threshold=10,
):
    """Host-side heatmaps -> rotated word boxes, per image.

    Faithful NumPy/scipy implementation of the reference OpenCV loop
    (/root/reference/keras_ocr/detection.py:207-287): threshold, 4-connected
    components, area + peak-confidence filters, overlap-removed segmap,
    per-component square dilation, min-area-rect with the near-square
    "diamond" fallback, clockwise ordering, x2 rescale.
    """
    box_groups = []
    for heatmaps in y_pred:
        textmap = np.asarray(heatmaps[..., 0])
        linkmap = np.asarray(heatmaps[..., 1])
        img_h, img_w = textmap.shape
        text_score = textmap > text_threshold
        link_score = linkmap > link_threshold
        combined = text_score | link_score
        from . import native

        if native.available():
            labels, n_components = native.label_components(combined)
        else:
            labels, n_components = _ndimage.label(combined, structure=_FOUR_CONNECTED)
        boxes = []
        for component_id in range(1, n_components + 1):
            mask = labels == component_id
            size = int(mask.sum())
            if size < size_threshold:
                continue
            if textmap[mask].max() < detection_threshold:
                continue
            segmap = mask & ~(link_score & text_score)
            ys, xs = np.nonzero(mask)
            x, y = xs.min(), ys.min()
            w, h = xs.max() - x + 1, ys.max() - y + 1
            niter = int(np.sqrt(size * min(w, h) / (w * h)) * 2)
            # Dilate, restricted to the reference's ROI window.
            from . import native

            if native.available():
                dilated = native.dilate_square(segmap, niter)
            else:
                dilated = _dilate_cv2_style(segmap, niter)
            roi = np.zeros_like(segmap)
            sx, sy = max(x - niter, 0), max(y - niter, 0)
            ex, ey = min(x + w + niter + 1, img_w), min(y + h + niter + 1, img_h)
            roi[sy:ey, sx:ex] = True
            dilated &= roi
            pys, pxs = np.nonzero(_first_contour_pixels(dilated))
            if len(pxs) == 0:
                continue
            points = np.stack([pxs, pys], axis=1).astype("float32")
            box = tools.min_area_rect(points)
            bw = np.linalg.norm(box[0] - box[1])
            bh = np.linalg.norm(box[1] - box[2])
            box_ratio = max(bw, bh) / (min(bw, bh) + 1e-5)
            if abs(1 - box_ratio) <= 0.1:
                l, r = pxs.min(), pxs.max()
                t, b = pys.min(), pys.max()
                box = np.array([[l, t], [r, t], [r, b], [l, b]], dtype="float32")
            else:
                box = np.array(np.roll(box, 4 - box.sum(axis=1).argmin(), 0))
            boxes.append(2 * box)
        box_groups.append(
            np.array(boxes, dtype="float32") if boxes else np.zeros((0, 4, 2), "float32")
        )
    return box_groups


def boxes_from_mask(boxes: np.ndarray, mask: np.ndarray) -> typing.List[np.ndarray]:
    """Convert fixed-shape device output (B, C, 4, 2) + mask to ragged lists."""
    out = []
    for image_boxes, image_mask in zip(np.asarray(boxes), np.asarray(mask)):
        out.append(image_boxes[image_mask].astype("float32"))
    return out


class Detector:
    """CRAFT text detector.

    API parity with /root/reference/keras_ocr/detection.py:661-785, with a
    jitted Flax forward + on-device post-processing. ``weights=None`` leaves
    the model randomly initialized. When the pretrained file cannot be
    obtained (offline environment, no cache), the constructor RAISES unless
    ``allow_random_fallback=True`` — silent random weights would be a
    quality trap, so degrading to random init is an explicit opt-in that
    warns when it happens.
    """

    def __init__(
        self,
        weights: typing.Optional[str] = "clovaai_general",
        load_from_torch: bool = False,
        optimizer: str = "adam",
        backbone_name: str = "vgg",
        compute_dtype=jnp.float32,
        max_components: int = 256,
        allow_random_fallback: bool = False,
        fold_bn: bool = False,
        width: float = 1.0,
    ):
        from . import config as config_lib
        from . import weights as weights_lib

        config_lib.enable_compile_cache()
        self.backbone_name = backbone_name
        self.optimizer_name = optimizer
        self.max_components = max_components
        self.fold_bn = fold_bn
        self.width = width
        if width != 1.0:
            assert weights is None, "width != 1.0 has no pretrained weights"
        self.model = CRAFT(
            backbone_name=backbone_name,
            fold_bn=fold_bn,
            width=width,
            dtype=compute_dtype,
        )
        self.variables = None
        if weights is not None:
            pretrained_key = (weights, load_from_torch)
            assert backbone_name == "vgg", "Pretrained weights available only for VGG."
            assert (
                pretrained_key in weights_lib.DETECTOR_PRETRAINED
            ), "Selected weights configuration not found."
            config = weights_lib.DETECTOR_PRETRAINED[pretrained_key]
            try:
                weights_path = weights_lib.download_pretrained(config)
            except RuntimeError:
                if not allow_random_fallback:
                    raise
                warnings.warn(
                    f"Pretrained weights {weights!r} unavailable (offline, "
                    "no cache); falling back to RANDOM initialization "
                    "(allow_random_fallback=True). Detection quality will "
                    "be garbage until the model is trained.",
                    stacklevel=2,
                )
            else:
                self.variables = weights_lib.load_craft_weights(weights_path)
                if fold_bn:
                    # Inference-only: absorb every BatchNorm into its conv
                    # (pure param transform, parity ~1e-6 fp32 — see
                    # models/craft.py:fold_bn_variables).
                    self.variables = fold_bn_variables(self.variables)
        if self.variables is None:
            from .models import init_variables

            self.variables = init_variables(self.model, (1, 64, 64, 3))
            if "efficientnet" in backbone_name.lower():
                # The reference always builds non-VGG detectors on
                # ImageNet-pretrained backbone features
                # (/root/reference/keras_ocr/detection.py:338-341); graft
                # the converted checkpoint under ``basenet`` and leave the
                # decoder/head randomly initialized. Offline (no cache, no
                # network) degrades to random init with a warning.
                try:
                    from .weights.efficientnet import (
                        graft_backbone_variables,
                        load_efficientnet_imagenet,
                    )

                    self.variables = graft_backbone_variables(
                        self.variables, load_efficientnet_imagenet(backbone_name)
                    )
                except Exception as exc:  # noqa: BLE001 - offline fallback
                    warnings.warn(
                        f"ImageNet initialization for {backbone_name} "
                        f"unavailable ({type(exc).__name__}: {exc}); the "
                        "backbone starts from random weights.",
                        stacklevel=2,
                    )
        self._forward = jax.jit(
            lambda variables, x: self.model.apply(variables, x, train=False)
        )

    def heatmaps(self, images_array: np.ndarray) -> np.ndarray:
        """Raw (B, H/2, W/2, 2) heatmaps for a normalized image batch."""
        return np.asarray(self._forward(self.variables, jnp.asarray(images_array)))

    def detect(
        self,
        images: typing.List[typing.Union[np.ndarray, str]],
        detection_threshold=0.7,
        text_threshold=0.4,
        link_threshold=0.4,
        size_threshold=10,
        use_device_postprocess: bool = True,
        **kwargs,
    ) -> typing.List[np.ndarray]:
        """Detect word boxes in images; returns a list of (N, 4, 2) arrays.

        (/root/reference/keras_ocr/detection.py:745-785.)
        """
        images_array = np.array([compute_input(tools.read(image)) for image in images])
        heatmaps = self._forward(self.variables, jnp.asarray(images_array))
        if use_device_postprocess:
            # The device kernel labels at most `cap` components and sweeps
            # `sweeps` times; it reports the TOTAL components found and a
            # PROOF of labeling convergence, so a busy scene escalates the
            # cap and a pathological (serpentine) scene escalates the sweep
            # count (one extra cached compile each) instead of silently
            # dropping or splitting components the reference would keep.
            cap = self.max_components
            sweeps = DEFAULT_NUM_SWEEPS
            while True:
                boxes, mask, diag = postprocess_ops.get_boxes(
                    heatmaps,
                    detection_threshold=detection_threshold,
                    text_threshold=text_threshold,
                    link_threshold=link_threshold,
                    size_threshold=size_threshold,
                    max_components=cap,
                    num_sweeps=sweeps,
                )
                found = (
                    int(np.asarray(diag["n_components"]).max())
                    if len(images)
                    else 0
                )
                converged = np.asarray(diag["converged"])
                all_converged = bool(converged.all()) if len(images) else True
                if not all_converged and sweeps < MAX_SWEEPS_CEILING:
                    sweeps = min(sweeps * 2, MAX_SWEEPS_CEILING)
                    continue
                if found > cap and cap < MAX_COMPONENTS_CEILING:
                    cap = min(cap * 2, MAX_COMPONENTS_CEILING)
                    continue
                if found > cap:
                    warnings.warn(
                        f"{found} thresholded components exceed the "
                        f"{MAX_COMPONENTS_CEILING} device cap; extra "
                        "components were dropped. Use "
                        "use_device_postprocess=False for this image.",
                        stacklevel=2,
                    )
                break

            # Multi-blob components (the contours[0] case,
            # detection.py:267-273): patch with the exact windowed tier-2
            # fit, escalating its (window, iterations, cap) ladder.
            needs_host = ~converged if len(images) else np.zeros(0, bool)
            if len(images) and int(np.asarray(diag["n_multiblob"]).max()) > 0:
                from .ops import refine as refine_ops

                refine_ok = None
                for wh, ww, md, it, rc in refine_ops.LADDER:
                    boxes, refine_ok, _ = refine_ops.refine_boxes(
                        heatmaps,
                        boxes,
                        detection_threshold=detection_threshold,
                        text_threshold=text_threshold,
                        link_threshold=link_threshold,
                        size_threshold=size_threshold,
                        max_components=cap,
                        num_sweeps=sweeps,
                        refine_cap=rc,
                        window_h=wh,
                        window_w=ww,
                        max_dilate=md,
                        num_iters=it,
                    )
                    refine_ok = np.asarray(refine_ok)
                    if refine_ok.all():
                        break
                needs_host = needs_host | ~refine_ok

            if needs_host.any():
                # Provably unresolved on device even at the ladder top: the
                # exact host oracle replaces the affected images' results.
                warnings.warn(
                    "device post-processing could not prove exactness for "
                    f"{int(needs_host.sum())} image(s) (labeling "
                    "convergence or contours[0] refinement); falling back "
                    "to host post-processing for them.",
                    stacklevel=2,
                )
                device_groups = boxes_from_mask(boxes, mask)
                host_groups = getBoxes(
                    np.asarray(heatmaps),
                    detection_threshold=detection_threshold,
                    text_threshold=text_threshold,
                    link_threshold=link_threshold,
                    size_threshold=size_threshold,
                )
                return [
                    host if bad else device
                    for device, host, bad in zip(
                        device_groups, host_groups, needs_host
                    )
                ]
            return boxes_from_mask(boxes, mask)
        return getBoxes(
            np.asarray(heatmaps),
            detection_threshold=detection_threshold,
            text_threshold=text_threshold,
            link_threshold=link_threshold,
            size_threshold=size_threshold,
        )

    def compile(self, optimizer=None, learning_rate: float = 1e-3, mesh=None):
        """Create (and return) the MSE trainer for this detector.

        API-parity convenience for the reference's
        ``model.compile(loss='mse', optimizer='adam')`` (detection.py:696).
        Use ``self.trainer.fit(...)`` afterwards.
        """
        import optax

        from .train.detector import DetectorTrainer

        if optimizer is None:
            optimizer = optax.adam(learning_rate)
        self.trainer = DetectorTrainer(self, optimizer=optimizer, mesh=mesh)
        return self.trainer

    def get_batch_generator(
        self,
        image_generator,
        batch_size=8,
        heatmap_size=512,
        heatmap_distance_ratio=1.5,
    ):
        """Training batch generator: (X, y[, sample_weights]).

        (/root/reference/keras_ocr/detection.py:698-743.)
        """
        from .data.detection_targets import compute_maps

        heatmap = get_gaussian_heatmap(
            size=heatmap_size, distanceRatio=heatmap_distance_ratio
        )
        while True:
            batch = [next(image_generator) for _ in range(batch_size)]
            images = np.array([entry[0] for entry in batch])
            line_groups = [entry[1] for entry in batch]
            X = compute_input(images)
            y = np.array(
                [
                    compute_maps(
                        heatmap=heatmap,
                        image_height=images.shape[1],
                        image_width=images.shape[2],
                        lines=lines,
                    )
                    for lines in line_groups
                ]
            )
            if len(batch[0]) == 3:
                sample_weights = np.array([sample[2] for sample in batch])
                yield X, y, sample_weights
            else:
                yield X, y


# ---------------------------------------------------------------------------
# Reference-name aliases: the Keras graph builders of the reference map onto
# this framework's Flax modules / functional ops. Kept so a keras-ocr user
# finds every symbol they had (detection.py:65-103,290-424,428-468,472-644).
# ---------------------------------------------------------------------------
from .data.detection_targets import map_to_rgb  # noqa: F401,E402
from .models.craft import ConvBN as make_vgg_block  # noqa: F401,E402  (detection.py:87-103)
from .models.craft import UpConv as upconv  # noqa: F401,E402  (detection.py:65-84)
from .models.craft import VGG16BN as build_vgg_backbone  # noqa: F401,E402  (detection.py:312-335)


def build_efficientnet_backbone(model_name: str = "efficientnetb0", dtype=jnp.float32):
    """EfficientNet backbone module for CRAFT (detection.py:338-350)."""
    from .models.efficientnet import EfficientNetBackbone

    return EfficientNetBackbone(model_name=model_name, dtype=dtype)


def upsample_like(source, target):
    """Bilinear resize-to-target with half-pixel centers — the reference's
    ``UpsampleLike`` custom layer (detection.py:290-309) as a function."""
    return image_ops.upsample_like(source, target)


UpsampleLike = upsample_like


def build_model(backbone_name: str = "vgg", weights_path: str = None, compute_dtype=jnp.float32):
    """Build the CRAFT detector graph; returns (module, variables).

    The TPU-native analog of the reference's ``build_keras_model``
    (detection.py:353-424): same architecture, Flax module + variable tree
    instead of a Keras model. Loads ``.h5`` / ``.pth`` weight files.
    """
    from . import weights as weights_lib

    model = CRAFT(backbone_name=backbone_name, dtype=compute_dtype)
    if weights_path is not None:
        variables = weights_lib.load_craft_weights(weights_path)
    else:
        from .models import init_variables

        variables = init_variables(model, (1, 64, 64, 3))
    return model, variables


build_keras_model = build_model


def load_torch_weights(weights_path: str):
    """Convert a reference ``.pth`` checkpoint to a Flax variable tree.

    (detection.py:428-468's name-mapped loader; here the name mapping
    lives in :func:`keras_ocr_tpu.weights.craft_variables_from_torch_state_dict`.)
    """
    from . import weights as weights_lib

    return weights_lib.load_torch_checkpoint(weights_path)


def build_torch_model(weights_path: str = None):
    """The torch CRAFT twin used for parity checking (detection.py:472-644)."""
    from .weights.torch_twin import build_torch_model as _build

    return _build(weights_path)
