"""End-to-end OCR pipeline: detection -> crop -> recognition, fused on device.

API parity with the reference ``keras_ocr.pipeline.Pipeline``
(/root/reference/keras_ocr/pipeline.py:7-75): ``Pipeline(detector,
recognizer, scale=2, max_size=2048)`` and ``recognize(images) ->
[[(word, box)], ...]``. The execution model is redesigned TPU-first: the
reference round-trips to host OpenCV between the two model ``predict``
calls (getBoxes + per-word warpBox, SURVEY.md §3.1); here ImageNet
normalization, CRAFT, heatmap post-processing, word compaction,
perspective cropping, CRNN, and CTC decoding run as ONE jitted XLA
program — images cross the host<->device boundary once per batch, and
strings/boxes cross back once.

Variable image sizes are handled by pad-to-bucket (multiples of
``size_bucket``) so jit recompilation count stays bounded; words per image
are capped at a static ``max_words`` (compacted from ``max_components``
candidate components in raster order).
"""

from __future__ import annotations

import functools
import threading
import typing
import warnings

import numpy as np
import jax
import jax.numpy as jnp

from .. import tools
from .. import detection as detection_mod
from ..detection import Detector
from ..recognition import Recognizer
from ..ops import ctc as ctc_ops
from ..ops import postprocess as postprocess_ops
from ..ops.image import compute_input, rgb_to_grayscale
from ..ops.warp import warp_boxes_batch


def _new_run_stats():
    return {
        "escalations": 0,
        "truncated_images": 0,
        "component_escalations": 0,
        "sweep_escalations": 0,
        "refine_escalations": 0,
        "warp_escalations": 0,
    }


class Pipeline:
    """A wrapper for a combination of detector and recognizer.

    Args:
        detector: The detector to use (default: pretrained CRAFT).
        recognizer: The recognizer to use (default: pretrained CRNN).
        scale: The scale factor to apply to input images.
        max_size: The maximum single-side dimension of images.
        max_words: Static per-image cap on recognized words (device path).
        size_bucket: Pad image sides up to multiples of this to bound
            recompilation.
        pad_to: Optional static (height, width) every batch is padded to
            (pre-scale). One shape = ONE compile — use for mixed-size
            workloads (e.g. the COCO-Text eval sweep) where per-bucket
            compilation would dominate.
        mesh: Optional jax.sharding.Mesh; shards the image batch over the
            mesh's ``data`` axis (params replicated) for multi-chip
            batched inference.
        word_buckets: Increasing word-capacity ladder ending at
            ``max_words`` (default ``(16, max_words)``). ``recognize``
            runs the smallest bucket and escalates only when an image
            fills every word slot, so the CRNN (cost linear in the static
            crop count) sizes itself to the scene. Pass ``(max_words,)``
            to disable.
    """

    def __init__(
        self,
        detector: typing.Optional[Detector] = None,
        recognizer: typing.Optional[Recognizer] = None,
        scale: int = 2,
        max_size: int = 2048,
        max_words: int = 64,
        size_bucket: int = 32,
        pad_to: typing.Optional[typing.Tuple[int, int]] = None,
        mesh=None,
        word_buckets: typing.Optional[typing.Sequence[int]] = None,
    ):
        if detector is None:
            detector = Detector()
        if recognizer is None:
            recognizer = Recognizer()
        self.scale = scale
        self.detector = detector
        self.recognizer = recognizer
        self.max_size = max_size
        self.max_words = max_words
        if word_buckets is None:
            word_buckets = (
                (16, max_words) if max_words > 16 else (max_words,)
            )
        if word_buckets[-1] != max_words or list(word_buckets) != sorted(
            set(word_buckets)
        ):
            raise ValueError(
                "word_buckets must be strictly increasing and end at "
                f"max_words={max_words}; got {tuple(word_buckets)}"
            )
        self.word_buckets = tuple(int(b) for b in word_buckets)
        # Sticky caps are PERF MEMOS, never correctness state: every
        # launched program's overflow is judged against the caps it was
        # launched with (threaded through _fetch_escalating), so a stale
        # read here costs at most one extra escalation rerun. The lock
        # below only makes concurrent learning monotonic.
        self._component_cap = detector.max_components
        self._num_sweeps = detection_mod.DEFAULT_NUM_SWEEPS
        self._bucket_start = 0
        self._sticky_lock = threading.Lock()
        # Per-call observability: bucket escalations + images whose word
        # slots all filled at the top bucket (possible truncation).
        # Published as one consistent snapshot at the END of each
        # recognize/recognize_many call (counters accumulate in a local
        # dict during the call, so concurrent calls never tear each
        # other's stats).
        self.last_run_stats = _new_run_stats()
        self.size_bucket = size_bucket
        self.pad_to = pad_to
        # Static sub-batch size for the CRAFT forward inside the fused
        # program (see _device_pipeline); bounds the full-resolution
        # block1 activation memory so large serving batches fit HBM.
        self._detector_chunk = 16
        # Optional data-parallel inference: shard the image batch over the
        # mesh's ``data`` axis, params replicated — the SURVEY §2c
        # inference scale-out design. XLA partitions the fused program
        # from the input shardings alone.
        self.mesh = mesh
        self._spatial = False
        if mesh is None:
            # Pin weights on device once: host-resident variable trees
            # (e.g. numpy arrays restored from a checkpoint or
            # jax.device_get after training) would otherwise re-upload
            # the full weight tree on EVERY call (~100 MB, ~600 ms).
            self.detector.variables = jax.tree.map(
                jnp.asarray, self.detector.variables
            )
            self.recognizer.variables = jax.tree.map(
                jnp.asarray, self.recognizer.variables
            )
        if mesh is not None:
            from ..parallel import mesh as mesh_lib

            self._batch_sharding = mesh_lib.batch_sharding(mesh)
            # With a non-trivial ``model`` axis, additionally shard image
            # HEIGHT across it for the detector forward (SURVEY §2c spatial
            # sharding — XLA SPMD inserts the conv halo exchanges).
            self._spatial = mesh.shape.get("model", 1) > 1
            self._spatial_sharding = mesh_lib.spatial_sharding(mesh)
            replicated = mesh_lib.replicated(mesh)
            self.detector.variables = jax.device_put(
                self.detector.variables, replicated
            )
            self.recognizer.variables = jax.device_put(
                self.recognizer.variables, replicated
            )
        # Thresholds are STATIC: baked into the compiled program instead
        # of shipped as four device scalars per call — each tiny scalar
        # upload pays a full RPC round trip on a tunneled TPU (~measured
        # 5-17 ms per recognize). Users change thresholds rarely; each
        # distinct setting compiles once and lands in the persistent cache.
        self._fused = jax.jit(
            self._device_pipeline,
            static_argnames=(
                "detection_threshold",
                "text_threshold",
                "link_threshold",
                "size_threshold",
                "max_components",
                "max_words",
                "resize_to",
                "num_sweeps",
                "refine_level",
                "warp_level",
            ),
        )

    def _device_pipeline(
        self,
        det_variables,
        rec_variables,
        images,  # (B, H, W, 3) float32 or uint8 in [0, 255]
        detection_threshold,
        text_threshold,
        link_threshold,
        size_threshold,
        max_components,
        max_words,
        resize_to=None,  # static (H', W'): upscale on device (x`scale`)
        num_sweeps=detection_mod.DEFAULT_NUM_SWEEPS,
        refine_level=0,  # static: 1-based index into ops.refine.LADDER
        warp_level=0,  # static: index into ops.warp.WINDOW_LADDER
    ):
        from ..ops.image import resize_bilinear
        from ..ops.warp import WINDOW_LADDER, window_overflow

        images = images.astype(jnp.float32)
        if resize_to is not None:
            # The reference upsamples on host before inference
            # (pipeline.py:44-47); doing it on device lets the host send
            # small uint8 originals — 16x less host->device traffic.
            images = resize_bilinear(images, resize_to[0], resize_to[1])
        x = compute_input(images)
        if self._spatial:
            # Run CRAFT with height sharded over the model axis; the
            # heatmaps (4x smaller than the input) come back batch-sharded
            # for the (row-global) post-processing reductions.
            x = jax.lax.with_sharding_constraint(x, self._spatial_sharding)

        def craft(x_chunk):
            return self.detector.model.apply(det_variables, x_chunk, train=False)

        batch_size = x.shape[0]
        # CRAFT's block1 runs two full-resolution 64-channel activations
        # (padded 2x to the 128-lane layout) — ~0.3 GB per image at the
        # 960x1280 serving shape, and both are live across the second
        # conv. Above `_detector_chunk` images, the forward runs over
        # sub-batches through lax.map so XLA reuses the block1 buffers
        # across iterations instead of allocating batch x 2 of them (the
        # round-3 batch-32 OOM after the warp stage was chunked). Each
        # chunk is still MXU-wide; meshes handle capacity by sharding, so
        # sharded programs keep the unchunked form XLA SPMD partitions.
        chunk = 0 if self.mesh is not None else self._detector_chunk
        if chunk and batch_size > chunk:
            while batch_size % chunk:  # largest divisor <= the setting
                chunk -= 1
            if chunk > 1:
                xs = x.reshape((batch_size // chunk, chunk) + x.shape[1:])
                heatmaps = jax.lax.map(craft, xs)
                heatmaps = heatmaps.reshape((batch_size,) + heatmaps.shape[2:])
            else:
                heatmaps = craft(x)
        else:
            heatmaps = craft(x)
        if self._spatial:
            heatmaps = jax.lax.with_sharding_constraint(
                heatmaps, self._batch_sharding
            )
        boxes, mask, diag = postprocess_ops.get_boxes(
            heatmaps,
            detection_threshold=detection_threshold,
            text_threshold=text_threshold,
            link_threshold=link_threshold,
            size_threshold=size_threshold,
            max_components=max_components,
            num_sweeps=num_sweeps,
        )
        ncomp = diag["n_components"]
        converged = diag["converged"]
        if refine_level > 0:
            # contours[0] tier-2 pass fused into the same program (XLA
            # CSEs the repeated component analysis); signal = proofs still
            # failing at this ladder level.
            from ..ops import refine as refine_ops

            wh, ww, md, it, rc = refine_ops.LADDER[refine_level - 1]
            boxes, refine_ok, _ = refine_ops.refine_boxes(
                heatmaps,
                boxes,
                detection_threshold=detection_threshold,
                text_threshold=text_threshold,
                link_threshold=link_threshold,
                size_threshold=size_threshold,
                max_components=max_components,
                num_sweeps=num_sweeps,
                refine_cap=rc,
                window_h=wh,
                window_w=ww,
                max_dilate=md,
                num_iters=it,
            )
            refine_signal = ~refine_ok
        else:
            refine_signal = diag["n_multiblob"] > 0
        # Compact valid boxes into the first max_words slots (stable order).
        order = jnp.argsort(~mask, axis=1, stable=True)[:, :max_words]  # (B, W)
        boxes_c = jnp.take_along_axis(boxes, order[..., None, None], axis=1)
        mask_c = jnp.take_along_axis(mask, order, axis=1)

        win_h, win_w = WINDOW_LADDER[warp_level]
        # Computed at EVERY rung (a cheap AABB check), including the top:
        # the live ladder only escalates below the top rung, but exported
        # artifacts surface the bit as a "this crop took the antialiased
        # downscale" diagnostic (ExportedPipeline.recognize).
        warp_signal = window_overflow(boxes_c, mask_c, win_h, win_w)

        height, width, channels = self.recognizer.input_shape
        if channels == 1:
            # Grayscale before warping to match the reference's host
            # cvtColor-then-warp order (recognition.py:508-510);
            # rgb_to_grayscale already applies cv2's uint8 quantization.
            source = jnp.clip(rgb_to_grayscale(images), 0, 255)
            crops = warp_boxes_batch(
                source, boxes_c, target_height=height, target_width=width,
                window_height=win_h, window_width=win_w,
            )  # (B, W, h, w)
            crops = (crops / 255.0)[..., None]
        else:
            crops = warp_boxes_batch(
                images, boxes_c, target_height=height, target_width=width,
                window_height=win_h, window_width=win_w,
            )  # (B, W, h, w, 3)
            crops = crops / 255.0
        batch, words = crops.shape[0], crops.shape[1]
        probs = self.recognizer.model.apply(
            rec_variables, crops.reshape((batch * words,) + crops.shape[2:]), train=False
        )
        decoded = ctc_ops.ctc_greedy_decode(probs)
        decoded = decoded.reshape(batch, words, -1)
        # Pack everything into ONE output array so the host needs a single
        # fetch (each fetch pays a full RPC round trip on tunneled TPUs).
        # Values are small ints / coords, exactly representable in fp32.
        # Trailing per-image columns (broadcast over word slots) drive the
        # host escalation ladder: [-2] total thresholded components found
        # (escalate max_components on overflow); [-1] a bitmask of proof
        # flags: +1 labeling converged (else escalate num_sweeps),
        # +2 contours[0] refinement pending/failing (escalate
        # refine_level), +4 a word crop overflowed the warp source window
        # (escalate warp_level).
        flags = (
            converged.astype(jnp.float32)
            + 2.0 * refine_signal.astype(jnp.float32)
            + 4.0 * warp_signal.astype(jnp.float32)
        )
        packed = jnp.concatenate(
            [
                boxes_c.reshape(batch, words, 8),
                mask_c[..., None].astype(jnp.float32),
                decoded.astype(jnp.float32),
                jnp.broadcast_to(
                    ncomp.astype(jnp.float32)[:, None, None], (batch, words, 1)
                ),
                jnp.broadcast_to(
                    flags[:, None, None], (batch, words, 1)
                ),
            ],
            axis=-1,
        )
        return packed

    def _prepare(self, images):
        """Host prep: read/resize/pad to one uint8 batch + device upload.

        Returns (device_batch, scales, num_real, resize_to); the upload is
        asynchronous, so callers may keep preparing further batches while
        this one is in flight.
        """
        if not isinstance(images, np.ndarray):
            images = [tools.read(image) for image in images]
        bucket = self.size_bucket
        scales = [
            self.max_size / max(image.shape)
            if max(image.shape) * self.scale > self.max_size
            else self.scale
            for image in images
        ]
        uniform_scale = len(set(scales)) == 1 and float(scales[0]).is_integer()
        if uniform_scale:
            # Fast path: ship small uint8 originals, upscale on device.
            scale = int(scales[0])
            max_height = max(image.shape[0] for image in images)
            max_width = max(image.shape[1] for image in images)
            if self.pad_to is not None:
                if self.pad_to[0] < max_height or self.pad_to[1] < max_width:
                    raise ValueError(
                        f"pad_to {self.pad_to} smaller than batch extent "
                        f"({max_height}, {max_width})"
                    )
                max_height, max_width = self.pad_to
            max_height = -(-max_height // bucket) * bucket
            max_width = -(-max_width // bucket) * bucket
            batch = np.array(
                [
                    tools.pad(image, width=max_width, height=max_height)
                    for image in images
                ],
                dtype="uint8",
            )
            resize_to = (max_height * scale, max_width * scale)
        else:
            resized = [
                tools.resize_image(image, max_scale=self.scale, max_size=self.max_size)
                for image in images
            ]
            scales = [scale for _, scale in resized]
            max_height = max(image.shape[0] for image, _ in resized)
            max_width = max(image.shape[1] for image, _ in resized)
            if self.pad_to is not None:
                # Post-resize space: pad to pad_to x the nominal scale.
                target_h = self.pad_to[0] * self.scale
                target_w = self.pad_to[1] * self.scale
                if target_h < max_height or target_w < max_width:
                    raise ValueError(
                        f"pad_to {self.pad_to} (x{self.scale}) smaller than "
                        f"resized batch extent ({max_height}, {max_width})"
                    )
                max_height, max_width = target_h, target_w
            max_height = -(-max_height // bucket) * bucket
            max_width = -(-max_width // bucket) * bucket
            batch = np.array(
                [
                    tools.pad(image, width=max_width, height=max_height)
                    for image, _ in resized
                ],
                dtype="uint8",
            )
            resize_to = None

        num_real = len(batch)
        if self.mesh is not None:
            # Pad the batch to a multiple of ALL axes the batch dim is
            # sharded over (data, plus slice on hybrid multi-slice meshes —
            # batch_sharding uses P(("slice", "data")) there) and shard it;
            # every chip runs the fused program on its local shard.
            data_size = self.mesh.shape["data"] * self.mesh.shape.get("slice", 1)
            pad_rows = -num_real % data_size
            if pad_rows:
                batch = np.concatenate(
                    [batch, np.zeros((pad_rows,) + batch.shape[1:], batch.dtype)]
                )
            device_batch = jax.device_put(batch, self._batch_sharding)
        else:
            device_batch = jnp.asarray(batch)
        return device_batch, scales, num_real, resize_to

    def _raise_sticky(self, component_cap=None, num_sweeps=None, bucket_start=None):
        """Publish learned caps monotonically (thread-safe).

        Concurrent ``recognize`` calls race on these memos; without the
        lock a stale ``max()`` read-modify-write could LOSE another call's
        escalation, costing that workload one rerun per call forever.
        Correctness never depends on these: overflow is always judged
        against the caps a program was launched with.
        """
        with self._sticky_lock:
            if component_cap is not None:
                self._component_cap = max(self._component_cap, component_cap)
            if num_sweeps is not None:
                self._num_sweeps = max(self._num_sweeps, num_sweeps)
            if bucket_start is not None:
                # Density memo tracks the CURRENT workload, so latest wins
                # (it may legitimately decrease after a dense batch).
                self._bucket_start = bucket_start

    def _launch(
        self, device_batch, detection_kwargs, bucket, resize_to, components,
        sweeps=detection_mod.DEFAULT_NUM_SWEEPS, refine_level=0, warp_level=0,
    ):
        """Asynchronously dispatch the fused program at one word bucket."""
        return self._fused(
            self.detector.variables,
            self.recognizer.variables,
            device_batch,
            detection_threshold=float(
                detection_kwargs.get("detection_threshold", 0.7)
            ),
            text_threshold=float(detection_kwargs.get("text_threshold", 0.4)),
            link_threshold=float(detection_kwargs.get("link_threshold", 0.4)),
            size_threshold=float(detection_kwargs.get("size_threshold", 10)),
            max_components=components,
            max_words=bucket,
            resize_to=resize_to,
            num_sweeps=sweeps,
            refine_level=refine_level,
            warp_level=warp_level,
        )

    def _fetch_escalating(
        self,
        packed_dev,
        device_batch,
        detection_kwargs,
        resize_to,
        num_real,
        bucket,
        components,
        sweeps=detection_mod.DEFAULT_NUM_SWEEPS,
        stats=None,
    ):
        """Fetch a dispatched result; escalate the word bucket on overflow.

        Escalation (every slot of the current bucket used — possible
        truncation) reruns the SAME program with a bigger cap, so results
        are identical to having used the big bucket directly. The sticky
        start remembers the density so steady workloads pay exactly ONE
        program per call.

        ``components``/``sweeps`` are the caps ``packed_dev`` was LAUNCHED
        with — overflow must be judged against those, not the mutable
        ``self._component_cap``/``self._num_sweeps``, which another
        in-flight chunk may already have escalated past this result's
        actual caps.
        """
        if stats is None:
            stats = self.last_run_stats
        remaining = list(
            self.word_buckets[self.word_buckets.index(bucket) + 1 :]
        )
        packed = np.asarray(packed_dev)[:num_real]
        from ..detection import MAX_COMPONENTS_CEILING, MAX_SWEEPS_CEILING
        from ..ops.refine import LADDER as REFINE_LADDER
        from ..ops.warp import WINDOW_LADDER

        def flag_bits(bit):
            """Any image whose flags column (packed [-1], a bitmask) has
            ``bit`` set (bit 1 is inverted: it means converged)."""
            if not len(packed):
                return False
            flags = packed[:, 0, -1].astype(int)
            if bit == 1:
                return bool(((flags & 1) == 0).any())
            return bool((flags & bit).any())

        # Labeling convergence first (flags bit 1): an unconverged sweep
        # count may SPLIT serpentine components, which both corrupts boxes
        # and overcounts ncomp — so it must be resolved before the
        # component-overflow check reads ncomp.
        while flag_bits(1) and sweeps < MAX_SWEEPS_CEILING:
            sweeps = min(sweeps * 2, MAX_SWEEPS_CEILING)
            self._raise_sticky(num_sweeps=sweeps)
            stats["sweep_escalations"] += 1
            packed = np.asarray(
                self._launch(
                    device_batch, detection_kwargs, bucket, resize_to,
                    components, sweeps,
                )
            )[:num_real]
        if flag_bits(1):
            warnings.warn(
                f"component labeling did not converge within "
                f"{MAX_SWEEPS_CEILING} sweeps; serpentine components may "
                "be split. Use Detector.detect(use_device_postprocess="
                "False) for this image.",
                stacklevel=3,
            )
        # Component overflow: the kernel reports the TOTAL components it
        # found (column -2); if that exceeds the cap it labeled with,
        # components were dropped in raster order — rerun with a doubled
        # cap (sticky, one extra cached compile per cap) so busy scenes
        # keep reference-equivalent recall.
        while (
            len(packed)
            and int(packed[:, 0, -2].max()) > components
            and components < MAX_COMPONENTS_CEILING
        ):
            components = min(components * 2, MAX_COMPONENTS_CEILING)
            self._raise_sticky(component_cap=components)
            stats["component_escalations"] += 1
            packed = np.asarray(
                self._launch(
                    device_batch, detection_kwargs, bucket, resize_to,
                    components, sweeps,
                )
            )[:num_real]
        while bool((packed[..., 8] > 0.5).all(axis=1).any()) and remaining:
            bucket = remaining.pop(0)
            stats["escalations"] += 1
            packed = np.asarray(
                self._launch(
                    device_batch, detection_kwargs, bucket, resize_to,
                    components, sweeps,
                )
            )[:num_real]
        # contours[0] refinement (flags bit 2): a multi-blob component's
        # tier-1 whole-set rectangle may differ from the reference's
        # contours[0] fit — rerun with the fused tier-2 pass, escalating
        # its window/iteration ladder until its proofs hold.
        #
        # Unlike the component cap and sweep count, refine/warp levels are
        # deliberately NOT sticky (_raise_sticky): multi-blob components
        # and window-overflowing crops are rare per-image events (~1/25
        # images at protocol level, PERF.md), and a sticky level would
        # permanently add the tier-2 pass / larger windows to EVERY later
        # call's hot path. The cost of being wrong is one extra cached
        # relaunch on the rare affected call; the cost of stickiness would
        # be paid on every call forever.
        refine_level = 0
        warp_level = 0
        while flag_bits(2) and refine_level < len(REFINE_LADDER):
            refine_level += 1
            stats["refine_escalations"] += 1
            packed = np.asarray(
                self._launch(
                    device_batch, detection_kwargs, bucket, resize_to,
                    components, sweeps, refine_level, warp_level,
                )
            )[:num_real]
        if flag_bits(2):
            warnings.warn(
                "contours[0] refinement incomplete at the ladder top; "
                "multi-blob component boxes may be supersets. Use "
                "Detector.detect(use_device_postprocess=False) for this "
                "image.",
                stacklevel=3,
            )
        # Warp-window overflow (flags bit 4): a word crop wider/taller
        # than the warp source window would go through the antialiased
        # downscale — rerun with the next window rung so the crop stays
        # bit-exact vs the reference's warpBox (ops/warp.py WINDOW_LADDER;
        # the top rung accepts the measured mildly-lossy downscale).
        while flag_bits(4) and warp_level < len(WINDOW_LADDER) - 1:
            warp_level += 1
            stats["warp_escalations"] += 1
            packed = np.asarray(
                self._launch(
                    device_batch, detection_kwargs, bucket, resize_to,
                    components, sweeps, refine_level, warp_level,
                )
            )[:num_real]
        saturated = int((packed[..., 8] > 0.5).all(axis=1).sum()) if len(packed) else 0
        if saturated:
            # Every slot of the TOP bucket is used: scenes may hold more
            # than max_words words and are being silently truncated in the
            # reference-equivalent output (the reference has no cap).
            stats["truncated_images"] += saturated
            warnings.warn(
                f"{saturated} image(s) filled all max_words={self.max_words} "
                "word slots; results may be truncated. Raise Pipeline("
                "max_words=...) for denser scenes.",
                stacklevel=3,
            )
        word_count = (
            int((packed[..., 8] > 0.5).sum(axis=1).max()) if len(packed) else 0
        )
        self._raise_sticky(
            bucket_start=next(
                (i for i, b in enumerate(self.word_buckets) if b > word_count),
                len(self.word_buckets) - 1,
            )
        )
        return packed

    def _finalize(self, packed, scales):
        """Unpack the fetched (B, words, 8+1+T+2) array into the ragged API."""
        boxes = packed[..., :8].reshape(packed.shape[0], packed.shape[1], 4, 2)
        mask = packed[..., 8] > 0.5
        decoded = packed[..., 9:-2].astype("int32")

        results = []
        for i, scale in enumerate(scales):
            valid = mask[i]
            words = ctc_ops.ctc_decode_to_strings(
                decoded[i][valid], self.recognizer.alphabet
            )
            image_boxes = boxes[i][valid].astype("float32")
            if scale != 1:
                image_boxes = image_boxes / scale
            results.append(list(zip(words, [box for box in image_boxes])))
        return results

    def recognize(
        self,
        images,
        detection_kwargs: typing.Optional[dict] = None,
        recognition_kwargs: typing.Optional[dict] = None,
    ):
        """Run the fused pipeline; returns a list of (word, box) lists.

        (pipeline.py:28-75.) ``recognition_kwargs``, when given, are
        forwarded to :meth:`Recognizer.recognize_from_boxes` exactly as the
        reference forwards them (pipeline.py:58-65) — this takes the
        two-stage path (device detect, host crop + device recognize)
        instead of the single fused program, since the fused program bakes
        the recognizer call in.
        """
        detection_kwargs = dict(detection_kwargs or {})
        stats = _new_run_stats()
        self.last_run_stats = stats
        if recognition_kwargs:
            return self._recognize_two_stage(
                images, detection_kwargs, dict(recognition_kwargs)
            )
        device_batch, scales, num_real, resize_to = self._prepare(images)
        bucket = self.word_buckets[self._bucket_start]
        components = self._component_cap
        sweeps = self._num_sweeps
        packed_dev = self._launch(
            device_batch, detection_kwargs, bucket, resize_to, components, sweeps
        )
        packed = self._fetch_escalating(
            packed_dev,
            device_batch,
            detection_kwargs,
            resize_to,
            num_real,
            bucket,
            components,
            sweeps,
            stats=stats,
        )
        # Publish the finished snapshot: a concurrent call may have swapped
        # self.last_run_stats mid-run, so re-point it at THIS call's stats.
        self.last_run_stats = stats
        return self._finalize(packed, scales)

    def _recognize_two_stage(self, images, detection_kwargs, recognition_kwargs):
        """Reference-shaped path: detect, then recognize_from_boxes(**kwargs).

        Mirrors /root/reference/keras_ocr/pipeline.py:40-75 — resize + pad
        on host, device detect, host crops, device recognize — so
        per-call recognizer options keep working.
        """
        if not isinstance(images, np.ndarray):
            images = [tools.read(image) for image in images]
        resized = [
            tools.resize_image(image, max_scale=self.scale, max_size=self.max_size)
            for image in images
        ]
        scales = [scale for _, scale in resized]
        max_height = max(image.shape[0] for image, _ in resized)
        max_width = max(image.shape[1] for image, _ in resized)
        # Same shape-bucketing as the fused path (_prepare): honor pad_to
        # (post-resize space) and round the batch extent up to size_bucket
        # so distinct batch shapes don't each compile a fresh detector
        # program. Extra padding is blank border — the detector finds no
        # components there, so results are unchanged.
        if self.pad_to is not None:
            target_h = self.pad_to[0] * self.scale
            target_w = self.pad_to[1] * self.scale
            if target_h < max_height or target_w < max_width:
                raise ValueError(
                    f"pad_to {self.pad_to} (x{self.scale}) smaller than "
                    f"resized batch extent ({max_height}, {max_width})"
                )
            max_height, max_width = target_h, target_w
        max_height = -(-max_height // self.size_bucket) * self.size_bucket
        max_width = -(-max_width // self.size_bucket) * self.size_bucket
        batch = np.array(
            [
                tools.pad(image, width=max_width, height=max_height)
                for image, _ in resized
            ]
        )
        box_groups = self.detector.detect(images=batch, **detection_kwargs)
        prediction_groups = self.recognizer.recognize_from_boxes(
            images=batch, box_groups=box_groups, **recognition_kwargs
        )
        box_groups = [
            boxes / scale if scale != 1 else boxes
            for boxes, scale in zip(box_groups, scales)
        ]
        return [
            list(zip(predictions, [box for box in boxes]))
            for predictions, boxes in zip(prediction_groups, box_groups)
        ]

    def recognize_many(
        self,
        images,
        batch_size: int = 8,
        detection_kwargs: typing.Optional[dict] = None,
        queue_depth: int = 2,
    ):
        """Throughput-oriented recognize: pipelined batches, same results.

        Splits ``images`` into ``batch_size`` chunks and keeps up to
        ``queue_depth`` fused programs in flight: while the device chews
        on batch *i*, the host prepares, uploads, and dispatches batch
        *i+1* (JAX dispatch is asynchronous), hiding host prep and
        transfer time under device compute. Output is identical to
        ``recognize`` called per chunk.
        """
        detection_kwargs = dict(detection_kwargs or {})
        stats = _new_run_stats()
        self.last_run_stats = stats
        if not isinstance(images, (list, tuple)):
            images = list(images)
        inflight: typing.List[tuple] = []
        results: typing.List[list] = []

        def drain_one():
            (
                packed_dev,
                device_batch,
                resize_to,
                num_real,
                scales,
                bucket,
                components,
                sweeps,
            ) = inflight.pop(0)
            packed = self._fetch_escalating(
                packed_dev,
                device_batch,
                detection_kwargs,
                resize_to,
                num_real,
                bucket,
                components,
                sweeps,
                stats=stats,
            )
            results.extend(self._finalize(packed, scales))

        for start in range(0, len(images), batch_size):
            chunk = images[start : start + batch_size]
            device_batch, scales, num_real, resize_to = self._prepare(chunk)
            bucket = self.word_buckets[self._bucket_start]
            components = self._component_cap
            sweeps = self._num_sweeps
            packed_dev = self._launch(
                device_batch, detection_kwargs, bucket, resize_to, components,
                sweeps,
            )
            inflight.append(
                (
                    packed_dev,
                    device_batch,
                    resize_to,
                    num_real,
                    scales,
                    bucket,
                    components,
                    sweeps,
                )
            )
            if len(inflight) > queue_depth:
                drain_one()
        while inflight:
            drain_one()
        self.last_run_stats = stats
        return results

    def export(
        self,
        path: str,
        height: int,
        width: int,
        batch_size: int = 1,
        detection_kwargs: typing.Optional[dict] = None,
        max_words: typing.Optional[int] = None,
        platforms: typing.Optional[typing.Sequence[str]] = None,
        refine_level: int = 1,
    ) -> str:
        """Serialize the fused pipeline for serving (AOT, weights baked in).

        Writes ``<path>.stablehlo`` — a portable ``jax.export`` artifact of
        the ENTIRE device program (normalize, CRAFT, getBoxes, crops, CRNN,
        CTC) specialized to one static input shape, with the current
        weights baked in as constants — and ``<path>.json`` with the host
        metadata (alphabet, scale, shapes) needed to serve it. Reload with
        :func:`load_exported`; no model-building code, weight files, or
        Python framework state is needed at serving time (the artifact can
        also be compiled/invoked from C++ via PJRT).

        Args:
            height/width: pre-scale input image shape the artifact serves
                (images are padded to this by the serving wrapper).
            batch_size: static batch the artifact serves.
            platforms: lowering platforms (e.g. ``["tpu", "cpu"]``);
                default = current backend.
            refine_level: contours[0] tier-2 pass baked into the static
                program (1-based index into ``ops.refine.LADDER``; 0 =
                tier-1 only). The default (1, a 128x512 window) covers
                word-scale multi-blob components, so the artifact matches
                the live pipeline's refine-ladder output on them (ref
                semantics: detection.py:267-273); components its proofs
                cannot handle surface as ``refine_pending`` in
                :meth:`ExportedPipeline.recognize` diagnostics.
        """
        import json

        from jax import export as jax_export

        from ..ops.refine import LADDER as REFINE_LADDER

        detection_kwargs = dict(detection_kwargs or {})
        max_words = max_words or self.max_words
        refine_level = max(0, min(int(refine_level), len(REFINE_LADDER)))
        resize_to = (height * self.scale, width * self.scale)
        # The artifact is static (no escalation relaunches). Use a rung
        # that fits the whole post-scale envelope when one exists (every
        # crop then takes the bit-exact slice path); for typical envelopes
        # that exceed the tallest rung (256), serve the TOP rung: crops
        # larger than it take its accepted antialiased downscale — exactly
        # where the live ladder also stops — and each such image is
        # flagged ``warp_downscaled`` in the serving diagnostics.
        from ..ops.warp import WINDOW_LADDER

        warp_level = next(
            (
                level
                for level, (wh, ww) in enumerate(WINDOW_LADDER)
                if wh >= resize_to[0] + 3 and ww >= resize_to[1] + 3
            ),
            len(WINDOW_LADDER) - 1,
        )

        def serve(images):
            return self._device_pipeline(
                self.detector.variables,
                self.recognizer.variables,
                images,
                float(detection_kwargs.get("detection_threshold", 0.7)),
                float(detection_kwargs.get("text_threshold", 0.4)),
                float(detection_kwargs.get("link_threshold", 0.4)),
                float(detection_kwargs.get("size_threshold", 10)),
                max_components=self.detector.max_components,
                max_words=max_words,
                resize_to=resize_to,
                refine_level=refine_level,
                warp_level=warp_level,
            )

        spec = jax.ShapeDtypeStruct((batch_size, height, width, 3), jnp.uint8)
        exported = jax_export.export(
            jax.jit(serve),
            platforms=list(platforms) if platforms else None,
        )(spec)
        with open(path + ".stablehlo", "wb") as f:
            f.write(exported.serialize())
        meta = {
            "alphabet": self.recognizer.alphabet,
            "scale": self.scale,
            "height": height,
            "width": width,
            "batch_size": batch_size,
            "max_words": max_words,
            "ctc_time": int(
                self.recognizer.build_params["width"]
                // self.recognizer.build_params["pool_size"] ** 2
                - self.recognizer.build_params["rnn_steps_to_discard"]
            ),
            "refine_level": refine_level,
            "warp_level": warp_level,
        }
        with open(path + ".json", "w") as f:
            json.dump(meta, f)
        return path + ".stablehlo"


class ExportedPipeline:
    """Serving wrapper for a :meth:`Pipeline.export` artifact.

    Holds only the deserialized device program and host metadata — no
    Flax modules, weight trees, or builders — and exposes the same
    ``recognize(images) -> [[(word, box)]]`` contract for its static
    (batch, height, width) envelope.
    """

    def __init__(self, exported, meta: dict):
        self._exported = exported
        self.meta = meta
        self.alphabet = meta["alphabet"]

    def recognize(self, images, return_diagnostics: bool = False):
        """Serve one batch; optionally surface per-image health flags.

        With ``return_diagnostics=True`` returns ``(results, diags)``
        where each diag dict reports where the static artifact may
        diverge from the live pipeline's escalation ladder
        (pipeline/__init__.py _fetch_escalating):

        * ``n_components``: thresholded components the kernel found;
          components beyond the baked ``max_components`` cap were
          dropped in raster order.
        * ``converged``: component labeling converged within the baked
          sweep count.
        * ``refine_pending``: a multi-blob component's contours[0]
          refinement is beyond the baked ``refine_level`` — its box may
          be a superset of the reference's (detection.py:267-273).
        * ``warp_downscaled``: a word crop exceeded the warp source
          window and took the antialiased downscale instead of the
          bit-exact slice path (ops/warp.py).
        * ``truncated``: every word slot filled — the scene may hold
          more than ``max_words`` words.

        Artifacts exported before the diagnostic columns existed return
        ``None`` for the flag-derived fields.
        """
        from ..ops import ctc as ctc_ops

        height, width = self.meta["height"], self.meta["width"]
        batch_size = self.meta["batch_size"]
        if len(images) > batch_size:
            raise ValueError(
                f"artifact serves batches of {batch_size}, got {len(images)}"
            )
        batch = np.zeros((batch_size, height, width, 3), dtype="uint8")
        for i, image in enumerate(images):
            image = tools.read(image)
            if image.shape[0] > height or image.shape[1] > width:
                raise ValueError(
                    f"image {image.shape} exceeds the exported envelope "
                    f"({height}, {width})"
                )
            batch[i] = tools.pad(image, width=width, height=height)
        packed = np.asarray(self._exported.call(batch))[: len(images)]
        boxes = packed[..., :8].reshape(packed.shape[0], packed.shape[1], 4, 2)
        mask = packed[..., 8] > 0.5
        # Slice by the artifact's own CTC length: artifacts exported before
        # the trailing ncomp/converged columns have width 9+T, newer ones
        # 9+T+1 or 9+T+2 — a fixed negative slice would silently drop
        # trailing timesteps on the former.
        ctc_time = self.meta["ctc_time"]
        decoded = packed[..., 9 : 9 + ctc_time].astype("int32")
        has_diag_columns = packed.shape[-1] >= 9 + ctc_time + 2
        results, diags = [], []
        for i in range(len(images)):
            valid = mask[i]
            words = ctc_ops.ctc_decode_to_strings(decoded[i][valid], self.alphabet)
            image_boxes = boxes[i][valid].astype("float32") / self.meta["scale"]
            results.append(list(zip(words, [box for box in image_boxes])))
            if return_diagnostics:
                diag = {
                    "truncated": bool(valid.all()) and valid.size > 0,
                    "n_components": None,
                    "converged": None,
                    "refine_pending": None,
                    "warp_downscaled": None,
                }
                if has_diag_columns:
                    flags = int(packed[i, 0, 9 + ctc_time + 1])
                    diag.update(
                        n_components=int(packed[i, 0, 9 + ctc_time]),
                        converged=bool(flags & 1),
                        refine_pending=bool(flags & 2),
                        warp_downscaled=bool(flags & 4),
                    )
                diags.append(diag)
        if return_diagnostics:
            return results, diags
        return results


def load_exported(path: str) -> ExportedPipeline:
    """Load a :meth:`Pipeline.export` artifact (``<path>.stablehlo`` +
    ``<path>.json``) into a serving-ready :class:`ExportedPipeline`."""
    import json

    from jax import export as jax_export

    with open(path + ".stablehlo", "rb") as f:
        exported = jax_export.deserialize(f.read())
    with open(path + ".json") as f:
        meta = json.load(f)
    return ExportedPipeline(exported, meta)
