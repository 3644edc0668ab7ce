"""End-to-end pipeline tests.

Mirrors the reference's golden test structure
(/root/reference/tests/test_pipeline.py:6-21): a blank image must yield no
predictions; the real test image must yield "eventdock" — the latter is
gated on pretrained weights being cached (no network in CI), like the
reference gates its torch/keras parity test. With random weights we still
exercise the full fused device path end to end (shapes, format, masking).
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy; `make test-all` / nightly CI


import keras_ocr_tpu
from keras_ocr_tpu import tools
from keras_ocr_tpu.detection import Detector
from keras_ocr_tpu.recognition import Recognizer

from keras_ocr_tpu import weights as weights_lib

WEIGHTS_CACHED = all(
    any(
        os.path.isfile(os.path.join(directory, name))
        for directory in (
            tools.get_default_cache_dir(),
            weights_lib.vendored_weights_dir(),
        )
    )
    for name in ["craft_mlt_25k.h5", "crnn_kurapan.h5"]
)

# In-repo copy of the reference's golden fixture (attribution alongside);
# falls back to the reference checkout when the fixture is absent.
TEST_IMAGE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "fixtures", "test_image.jpg"
)
if not os.path.isfile(TEST_IMAGE):
    TEST_IMAGE = "/root/reference/tests/test_image.jpg"


@pytest.fixture(scope="module")
def random_pipeline():
    detector = Detector(weights=None, max_components=32)
    recognizer = Recognizer(weights=None, alphabet=keras_ocr_tpu.recognition.DEFAULT_ALPHABET)
    return keras_ocr_tpu.Pipeline(
        detector=detector, recognizer=recognizer, scale=2, max_size=640, max_words=16
    )


def test_pipeline_blank_image(random_pipeline):
    # A constant image produces no components above threshold regardless of
    # weights... not guaranteed with random weights, so instead check the
    # output FORMAT contract on a small blank image.
    image = np.zeros((64, 64, 3), dtype="uint8") + 255
    predictions = random_pipeline.recognize(images=[image])[0]
    assert isinstance(predictions, list)
    for word, box in predictions:
        assert isinstance(word, str)
        assert box.shape == (4, 2)


def test_pipeline_multi_image_format(random_pipeline):
    rng = np.random.RandomState(0)
    images = [
        rng.randint(0, 255, size=(60, 80, 3), dtype="uint8"),
        rng.randint(0, 255, size=(80, 60, 3), dtype="uint8"),
    ]
    groups = random_pipeline.recognize(images=images)
    assert len(groups) == 2
    for predictions in groups:
        for word, box in predictions:
            assert isinstance(word, str)
            assert box.dtype == np.float32
            assert box.shape == (4, 2)


def test_pipeline_scale_adjustment(random_pipeline):
    # Boxes must come back in original-image coordinates (divided by the
    # upscale factor applied before inference).
    image = np.zeros((64, 64, 3), dtype="uint8")
    image[20:40, 10:50] = 255
    groups = random_pipeline.recognize(images=[image])
    for _, box in groups[0]:
        assert box[:, 0].max() <= 64 + 1e-3
        assert box[:, 1].max() <= 64 + 1e-3


@pytest.mark.skipif(not WEIGHTS_CACHED, reason="Pretrained weights not cached.")
def test_pipeline_golden_eventdock():
    """The reference golden test: exactly one box reading 'eventdock'."""
    pipeline = keras_ocr_tpu.Pipeline()
    image = tools.read(TEST_IMAGE)
    predictions = pipeline.recognize(images=[image])[0]
    assert len(predictions) == 1
    assert predictions[0][0] == "eventdock"


def test_pipeline_color_recognizer():
    """color=True build params: crops stay RGB through the fused path."""
    import string

    build_params = dict(keras_ocr_tpu.recognition.DEFAULT_BUILD_PARAMS)
    build_params["color"] = True
    recognizer = Recognizer(
        weights=None,
        alphabet=string.digits + string.ascii_lowercase,
        build_params=build_params,
    )
    detector = Detector(weights=None, max_components=16)
    pipeline = keras_ocr_tpu.Pipeline(
        detector=detector, recognizer=recognizer, scale=2, max_words=8
    )
    image = np.zeros((64, 96, 3), dtype="uint8")
    image[20:40, 10:80] = [200, 30, 30]
    predictions = pipeline.recognize(
        images=[image],
        detection_kwargs={
            "detection_threshold": -10.0,
            "text_threshold": -10.0,
            "link_threshold": 10.0,
            "size_threshold": 1,
        },
    )[0]
    assert len(predictions) >= 1
    for word, box in predictions:
        assert isinstance(word, str)
        assert box.shape == (4, 2)


def test_pipeline_mesh_sharded_batch():
    """SURVEY §2c inference scale-out: batch sharded over the data axis

    matches the unsharded pipeline exactly (including a batch that does
    not divide the mesh, via padding)."""
    import string

    import jax

    from keras_ocr_tpu.parallel import mesh as mesh_lib

    detector = Detector(weights=None, max_components=16)
    recognizer = Recognizer(
        weights=None, alphabet=string.digits + string.ascii_lowercase
    )
    kwargs = dict(detector=detector, recognizer=recognizer, scale=2, max_words=8)
    plain = keras_ocr_tpu.Pipeline(**kwargs)
    sharded = keras_ocr_tpu.Pipeline(
        mesh=mesh_lib.create_mesh(shape=(len(jax.devices()), 1)), **kwargs
    )
    rng = np.random.RandomState(0)
    images = []
    for _ in range(3):  # 3 does not divide 8 -> exercises padding
        image = np.zeros((64, 96, 3), dtype="uint8")
        x, y = rng.randint(0, 40), rng.randint(0, 30)
        image[y : y + 20, x : x + 50] = 255
        images.append(image)
    detection_kwargs = {
        "detection_threshold": -10.0,
        "text_threshold": -10.0,
        "link_threshold": 10.0,
        "size_threshold": 1,
    }
    a = plain.recognize(images=images, detection_kwargs=detection_kwargs)
    b = sharded.recognize(images=images, detection_kwargs=detection_kwargs)
    assert len(a) == len(b) == 3
    for pa, pb in zip(a, b):
        assert [w for w, _ in pa] == [w for w, _ in pb]
        for (_, ba), (_, bb) in zip(pa, pb):
            np.testing.assert_allclose(ba, bb, atol=1e-4)


def test_pipeline_spatial_sharded_batch():
    """SURVEY §2c spatial sharding: (data=4, model=2) mesh with image
    height sharded over ``model`` for the detector forward matches the
    unsharded pipeline exactly (XLA SPMD inserts the conv halo exchange)."""
    import string

    import jax

    from keras_ocr_tpu.parallel import mesh as mesh_lib

    if len(jax.devices()) < 8:
        import pytest

        pytest.skip("needs the 8-device CPU mesh")

    detector = Detector(weights=None, max_components=16)
    recognizer = Recognizer(
        weights=None, alphabet=string.digits + string.ascii_lowercase
    )
    kwargs = dict(detector=detector, recognizer=recognizer, scale=2, max_words=8)
    plain = keras_ocr_tpu.Pipeline(**kwargs)
    sharded = keras_ocr_tpu.Pipeline(
        mesh=mesh_lib.create_mesh(shape=(4, 2)), **kwargs
    )
    assert sharded._spatial
    rng = np.random.RandomState(1)
    images = []
    for _ in range(2):
        image = np.zeros((64, 96, 3), dtype="uint8")
        x, y = rng.randint(0, 40), rng.randint(0, 30)
        image[y : y + 20, x : x + 50] = 255
        images.append(image)
    detection_kwargs = {
        "detection_threshold": -10.0,
        "text_threshold": -10.0,
        "link_threshold": 10.0,
        "size_threshold": 1,
    }
    a = plain.recognize(images=images, detection_kwargs=detection_kwargs)
    b = sharded.recognize(images=images, detection_kwargs=detection_kwargs)
    for pa, pb in zip(a, b):
        assert [w for w, _ in pa] == [w for w, _ in pb]
        for (_, ba), (_, bb) in zip(pa, pb):
            np.testing.assert_allclose(ba, bb, atol=1e-4)


def test_pipeline_pad_to_static_shape():
    """pad_to pads every batch to one static device shape (one compile)."""
    import string

    detector = Detector(weights=None, max_components=16)
    recognizer = Recognizer(
        weights=None, alphabet=string.digits + string.ascii_lowercase
    )
    pipeline = keras_ocr_tpu.Pipeline(
        detector=detector,
        recognizer=recognizer,
        scale=2,
        max_words=8,
        pad_to=(96, 128),
    )
    seen_shapes = []
    fused = pipeline._fused

    def spy(det_vars, rec_vars, images, *args, **kwargs):
        seen_shapes.append(tuple(images.shape))
        return fused(det_vars, rec_vars, images, *args, **kwargs)

    pipeline._fused = spy
    for shape in [(64, 96, 3), (32, 48, 3), (96, 128, 3)]:
        out = pipeline.recognize(images=[np.zeros(shape, dtype="uint8")])
        assert isinstance(out, list) and len(out) == 1
    assert len(set(seen_shapes)) == 1, seen_shapes
    assert seen_shapes[0] == (1, 96, 128, 3)

    with pytest.raises(ValueError):
        pipeline.recognize(images=[np.zeros((200, 200, 3), dtype="uint8")])


def test_pipeline_word_bucket_escalation():
    """Word-capacity ladder: when every slot of the small bucket is used
    (possible truncation) recognize re-runs with the next bucket; sparse
    scenes stay in the small bucket. The device program is stubbed: the
    ladder is host-side logic keyed on the packed validity mask."""
    import string

    detector = Detector(weights=None, max_components=32)
    recognizer = Recognizer(
        weights=None, alphabet=string.digits + string.ascii_lowercase
    )
    pipeline = keras_ocr_tpu.Pipeline(
        detector=detector,
        recognizer=recognizer,
        scale=2,
        max_words=16,
        word_buckets=(4, 16),
    )
    assert pipeline.word_buckets == (4, 16)

    n_words = 6
    seen = []

    def fake_fused(det_vars, rec_vars, images, *, max_words, **kw):
        seen.append(max_words)
        batch = images.shape[0]
        packed = np.zeros((batch, max_words, 9 + 48 + 2), dtype="float32")
        k = min(n_words, max_words)
        packed[:, :k, 8] = 1.0  # validity mask
        packed[:, :, :8] = 1.0  # degenerate but nonzero boxes
        packed[:, :, 9:-2] = -1.0  # empty decoded strings
        packed[:, :, -2] = n_words  # TOTAL components found (ncomp column)
        packed[:, :, -1] = 1.0  # flags: converged, no refine/warp signals
        return packed

    pipeline._fused = fake_fused
    image = np.zeros((64, 96, 3), dtype="uint8")
    out = pipeline.recognize(images=[image])
    assert seen == [4, 16]
    assert len(out[0]) == n_words

    # Sticky start: after a dense scene the next call begins at the big
    # bucket directly (no double-run for steady dense workloads).
    seen.clear()
    out = pipeline.recognize(images=[image])
    assert seen == [16]
    assert len(out[0]) == n_words

    # A sparse result drops the sticky start back down.
    seen.clear()
    n_words = 2
    out = pipeline.recognize(images=[image])
    assert seen == [16]
    assert len(out[0]) == 2
    seen.clear()
    out = pipeline.recognize(images=[image])
    assert seen == [4]
    assert len(out[0]) == 2


def test_recognize_many_matches_recognize():
    """Pipelined recognize_many returns exactly what per-chunk recognize
    returns (same order), across chunk boundaries and queue depths."""
    import string

    detector = Detector(weights=None, max_components=16)
    recognizer = Recognizer(
        weights=None, alphabet=string.digits + string.ascii_lowercase
    )
    pipeline = keras_ocr_tpu.Pipeline(
        detector=detector, recognizer=recognizer, scale=2, max_words=8,
        pad_to=(64, 96),
    )
    rng = np.random.RandomState(3)
    images = []
    for _ in range(5):
        image = np.zeros((64, 96, 3), dtype="uint8")
        x, y = rng.randint(0, 40), rng.randint(0, 30)
        image[y : y + 20, x : x + 50] = 255
        images.append(image)
    detection_kwargs = {
        "detection_threshold": -10.0,
        "text_threshold": -10.0,
        "link_threshold": 10.0,
        "size_threshold": 1,
    }
    a = pipeline.recognize_many(
        images, batch_size=2, detection_kwargs=detection_kwargs, queue_depth=2
    )
    b = []
    for img in images:
        b.extend(pipeline.recognize(images=[img], detection_kwargs=detection_kwargs))
    assert len(a) == len(b) == 5
    for pa, pb in zip(a, b):
        assert [w for w, _ in pa] == [w for w, _ in pb]
        for (_, ba), (_, bb) in zip(pa, pb):
            np.testing.assert_allclose(ba, bb, atol=1e-4)


def test_pipeline_non_uniform_scale_path():
    """Mixed sizes where one image exceeds max_size take the host-resize
    (fractional scale) path; boxes still come back in original coords."""
    import string

    detector = Detector(weights=None, max_components=16)
    recognizer = Recognizer(
        weights=None, alphabet=string.digits + string.ascii_lowercase
    )
    pipeline = keras_ocr_tpu.Pipeline(
        detector=detector, recognizer=recognizer, scale=2, max_size=128,
        max_words=8,
    )
    small = np.zeros((40, 60, 3), dtype="uint8")
    small[10:30, 10:50] = 255
    big = np.zeros((100, 160, 3), dtype="uint8")  # 160*2 > 128 -> scale 0.8
    big[30:70, 20:140] = 255
    detection_kwargs = {
        "detection_threshold": -10.0,
        "text_threshold": -10.0,
        "link_threshold": 10.0,
        "size_threshold": 1,
    }
    groups = pipeline.recognize(
        images=[small, big], detection_kwargs=detection_kwargs
    )
    assert len(groups) == 2
    assert len(groups[0]) >= 1 and len(groups[1]) >= 1
    box_small = groups[0][0][1]
    box_big = groups[1][0][1]
    # With all-foreground thresholds both boxes cover the common padded
    # canvas on device; descaling back to each ORIGINAL image space must
    # therefore differ by exactly the per-image scale ratio 2 / 0.8.
    np.testing.assert_allclose(
        box_big[:, 0].max() / box_small[:, 0].max(), 2.0 / 0.8, rtol=0.05
    )
    for word, box in [groups[0][0], groups[1][0]]:
        assert isinstance(word, str) and box.shape == (4, 2)


def test_export_roundtrip(tmp_path):
    """Pipeline.export writes a self-contained serving artifact whose
    results match the live pipeline exactly (weights baked in)."""
    import os
    import string

    from keras_ocr_tpu.pipeline import load_exported

    detector = Detector(weights=None, max_components=16)
    recognizer = Recognizer(
        weights=None, alphabet=string.digits + string.ascii_lowercase
    )
    pipeline = keras_ocr_tpu.Pipeline(
        detector=detector, recognizer=recognizer, scale=2, max_words=8,
        pad_to=(64, 96),
    )
    detection_kwargs = {
        "detection_threshold": -10.0,
        "text_threshold": -10.0,
        "link_threshold": 10.0,
        "size_threshold": 1,
    }
    artifact = pipeline.export(
        os.path.join(str(tmp_path), "ocr"), height=64, width=96,
        batch_size=2, detection_kwargs=detection_kwargs,
    )
    assert os.path.getsize(artifact) > 1_000_000  # weights are baked in

    served = load_exported(os.path.join(str(tmp_path), "ocr"))
    rng = np.random.RandomState(7)
    images = []
    for _ in range(2):
        image = np.zeros((64, 96, 3), dtype="uint8")
        x, y = rng.randint(0, 40), rng.randint(0, 30)
        image[y : y + 20, x : x + 50] = 255
        images.append(image)
    a = served.recognize(images)
    b = pipeline.recognize(images=images, detection_kwargs=detection_kwargs)
    assert len(a) == len(b) == 2
    for pa, pb in zip(a, b):
        assert [w for w, _ in pa] == [w for w, _ in pb]
        for (_, ba), (_, bb) in zip(pa, pb):
            np.testing.assert_allclose(ba, bb, atol=1e-4)


def test_recognition_kwargs_two_stage_path(random_pipeline):
    """recognition_kwargs must be honored (reference pipeline.py:58-65):
    passing a supported kwarg takes the two-stage path; an unsupported one
    raises instead of being silently ignored."""
    rng = np.random.RandomState(3)
    image = rng.randint(0, 255, size=(64, 80, 3), dtype="uint8")
    groups = random_pipeline.recognize(
        images=[image], recognition_kwargs={"batch_size": 4, "verbose": 0}
    )
    assert len(groups) == 1
    for word, box in groups[0]:
        assert isinstance(word, str) and box.shape == (4, 2)
    with pytest.raises(TypeError):
        random_pipeline.recognize(
            images=[image], recognition_kwargs={"nonsense_option": 1}
        )


def test_two_stage_path_shares_shape_bucketing(random_pipeline):
    """The two-stage (recognition_kwargs) path must use the same pad_to /
    size_bucket shape policy as the fused path, so distinct batch extents
    don't each compile a fresh detector program."""
    rng = np.random.RandomState(5)
    random_pipeline.pad_to = (64, 96)
    seen_shapes = []
    original_detect = random_pipeline.detector.detect

    def spy_detect(images, **kwargs):
        seen_shapes.append(np.asarray(images).shape)
        return original_detect(images=images, **kwargs)

    random_pipeline.detector.detect = spy_detect
    try:
        for h, w in [(40, 50), (50, 70), (63, 95)]:
            image = rng.randint(0, 255, size=(h, w, 3), dtype="uint8")
            random_pipeline.recognize(
                images=[image], recognition_kwargs={"batch_size": 4}
            )
        # pad_to is pre-resize space; scale=2 doubles it -> ONE static shape.
        assert seen_shapes == [(1, 128, 192, 3)] * 3

        # Below-extent pad_to must fail loudly, exactly like the fused path.
        random_pipeline.pad_to = (8, 8)
        with pytest.raises(ValueError):
            random_pipeline.recognize(
                images=[rng.randint(0, 255, size=(64, 80, 3), dtype="uint8")],
                recognition_kwargs={"batch_size": 4},
            )

        # Without pad_to, extents round up to the size_bucket grid.
        random_pipeline.pad_to = None
        seen_shapes.clear()
        random_pipeline.recognize(
            images=[rng.randint(0, 255, size=(40, 50, 3), dtype="uint8")],
            recognition_kwargs={"batch_size": 4},
        )
        bucket = random_pipeline.size_bucket
        (shape,) = seen_shapes
        assert shape[1] % bucket == 0 and shape[2] % bucket == 0
    finally:
        random_pipeline.detector.detect = original_detect
        random_pipeline.pad_to = None


def test_recognize_from_boxes_batch_size_chunking(random_pipeline):
    """Chunked device forwards must produce identical strings."""
    rng = np.random.RandomState(4)
    image = rng.randint(0, 255, size=(64, 80, 3), dtype="uint8")
    boxes = np.array(
        [
            [[2, 2], [40, 2], [40, 20], [2, 20]],
            [[10, 30], [70, 30], [70, 50], [10, 50]],
            [[5, 40], [60, 40], [60, 60], [5, 60]],
        ],
        dtype="float32",
    )
    recognizer = random_pipeline.recognizer
    full = recognizer.recognize_from_boxes([image], [boxes])
    chunked = recognizer.recognize_from_boxes([image], [boxes], batch_size=2)
    assert full == chunked


def test_pipeline_invalid_word_buckets_raise():
    with pytest.raises(ValueError):
        keras_ocr_tpu.Pipeline(
            detector=Detector(weights=None, max_components=8),
            recognizer=Recognizer(
                weights=None, alphabet=keras_ocr_tpu.recognition.DEFAULT_ALPHABET
            ),
            max_words=16,
            word_buckets=(16, 8),
        )


def test_pipeline_truncation_stats(random_pipeline):
    """last_run_stats must report escalations/truncation; a sparse scene
    reports zero of both."""
    image = np.zeros((64, 64, 3), dtype="uint8") + 255
    random_pipeline.recognize(images=[image])
    stats = random_pipeline.last_run_stats
    assert set(stats) == {
        "escalations",
        "truncated_images",
        "component_escalations",
        "sweep_escalations",
        "refine_escalations",
        "warp_escalations",
    }
    assert all(value >= 0 for value in stats.values())


def test_hybrid_mesh_batch_padding():
    """ADVICE r1: on a (slice=2, data=2, model=2) hybrid mesh the batch must
    pad to slice*data (=4), not just data (=2)."""
    import jax

    from keras_ocr_tpu.parallel import mesh as mesh_lib

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    mesh = mesh_lib.create_hybrid_mesh(dcn_data=2, ici_shape=(2, 2))
    pipeline = keras_ocr_tpu.Pipeline(
        detector=Detector(weights=None, max_components=16),
        recognizer=Recognizer(
            weights=None, alphabet=keras_ocr_tpu.recognition.DEFAULT_ALPHABET
        ),
        scale=2,
        max_size=256,
        max_words=16,
        mesh=mesh,
    )
    rng = np.random.RandomState(0)
    # 2 images: indivisible by slice*data=4 without padding.
    images = [
        rng.randint(0, 255, size=(48, 48, 3), dtype="uint8") for _ in range(2)
    ]
    groups = pipeline.recognize(images=images)
    assert len(groups) == 2


def test_pipeline_component_cap_escalation():
    """A scene with more thresholded components than the detector's cap
    must escalate (component_escalations > 0) and return every word the
    host oracle would, instead of silently dropping raster-late ones."""
    import string

    import jax.numpy as jnp

    from tests.test_postprocess import _synthetic_heatmap

    rng = np.random.RandomState(9)
    hm = _synthetic_heatmap(rng, height=128, width=192, n_words=6)
    host_count = len(keras_ocr_tpu.detection.getBoxes(hm[None])[0])
    assert host_count >= 4

    detector = Detector(weights=None, max_components=2)

    class _StubModel:
        @staticmethod
        def apply(variables, x, train=False):
            heat = jnp.asarray(hm)
            return jnp.broadcast_to(heat, (x.shape[0],) + heat.shape)

    detector.model = _StubModel()
    recognizer = Recognizer(
        weights=None, alphabet=string.digits + string.ascii_lowercase
    )
    pipeline = keras_ocr_tpu.Pipeline(
        detector=detector,
        recognizer=recognizer,
        scale=2,
        max_words=16,
        pad_to=(128, 192),
    )
    predictions = pipeline.recognize(
        images=[np.zeros((128, 192, 3), dtype="uint8")]
    )[0]
    assert pipeline.last_run_stats["component_escalations"] >= 1
    assert pipeline._component_cap >= host_count
    assert len(predictions) == host_count


def test_recognize_many_component_cap_race():
    """Each pipelined chunk must be judged against the component cap it was
    LAUNCHED with: chunk A escalating the shared sticky cap while chunk B is
    in flight must not let B's capped result pass without a rerun."""
    import string

    detector = Detector(weights=None, max_components=2)
    recognizer = Recognizer(
        weights=None, alphabet=string.digits + string.ascii_lowercase
    )
    pipeline = keras_ocr_tpu.Pipeline(
        detector=detector,
        recognizer=recognizer,
        scale=2,
        max_words=16,
        word_buckets=(16,),
    )
    n_components = 5
    launches = []

    def fake_fused(
        det_vars, rec_vars, images, *, max_components, max_words, **kw
    ):
        launches.append(max_components)
        batch = images.shape[0]
        packed = np.zeros((batch, max_words, 9 + 48 + 2), dtype="float32")
        k = min(n_components, max_components, max_words)
        packed[:, :k, 8] = 1.0  # validity mask: capped at the launch cap
        packed[:, :, :8] = 1.0  # degenerate but nonzero boxes
        packed[:, :, 9:-2] = -1.0  # empty decoded strings
        packed[:, :, -2] = n_components  # TOTAL components found
        packed[:, :, -1] = 1.0  # flags: converged, no refine/warp signals
        return packed

    pipeline._fused = fake_fused
    image = np.zeros((64, 96, 3), dtype="uint8")
    # 2 chunks, queue_depth=2: BOTH launch at the initial cap (2) before
    # either drains. Draining chunk A escalates the sticky cap to 8; chunk
    # B's result was still computed at cap 2 and must rerun too.
    results = pipeline.recognize_many([image] * 4, batch_size=2, queue_depth=2)
    assert launches[:2] == [2, 2]
    assert all(len(words) == n_components for words in results)
    assert pipeline.last_run_stats["component_escalations"] == 4
    assert pipeline._component_cap == 8


def test_concurrent_recognize_sticky_caps_and_stats():
    """Concurrent recognize calls on ONE Pipeline: every thread's results
    must be correct, the sticky component cap must end at the monotonic max
    (no lost escalation), and each published stats snapshot must be
    internally consistent (not torn between threads)."""
    import string
    import threading as _threading

    detector = Detector(weights=None, max_components=2)
    recognizer = Recognizer(
        weights=None, alphabet=string.digits + string.ascii_lowercase
    )
    pipeline = keras_ocr_tpu.Pipeline(
        detector=detector,
        recognizer=recognizer,
        scale=2,
        max_words=16,
        word_buckets=(16,),
    )
    n_components = 5
    barrier = _threading.Barrier(4)

    def fake_fused(
        det_vars, rec_vars, images, *, max_components, max_words, **kw
    ):
        batch = images.shape[0]
        packed = np.zeros((batch, max_words, 9 + 48 + 2), dtype="float32")
        k = min(n_components, max_components, max_words)
        packed[:, :k, 8] = 1.0
        packed[:, :, :8] = 1.0
        packed[:, :, 9:-2] = -1.0
        packed[:, :, -2] = n_components
        packed[:, :, -1] = 1.0
        return packed

    pipeline._fused = fake_fused
    image = np.zeros((64, 96, 3), dtype="uint8")
    outcomes = [None] * 4

    def worker(i):
        barrier.wait()  # maximize overlap: all threads launch together
        results = pipeline.recognize(images=[image])
        outcomes[i] = (results, dict(pipeline.last_run_stats))

    threads = [_threading.Thread(target=worker, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    for results, stats in outcomes:
        assert len(results[0]) == n_components  # no capped result leaked out
        # Snapshot keys are complete and non-negative (not torn mid-update).
        assert set(stats) == set(pipeline.last_run_stats)
        assert all(v >= 0 for v in stats.values())
    # The sticky cap is the monotonic max over every thread's escalation;
    # under the pre-lock design a stale read-modify-write could lose it.
    assert pipeline._component_cap == 8


def test_exported_pipeline_slices_by_artifact_ctc_time():
    """ExportedPipeline must slice decoded frames by the artifact's own
    ctc_time: serving a pre-ncomp-column artifact (packed width 9+T) with a
    fixed [9:-1] slice would silently drop each word's final CTC frame."""
    from keras_ocr_tpu.pipeline import ExportedPipeline

    ctc_time = 4
    alphabet = "ab"
    meta = {
        "alphabet": alphabet,
        "scale": 1,
        "height": 8,
        "width": 8,
        "batch_size": 1,
        "max_words": 2,
        "ctc_time": ctc_time,
    }

    def make_packed(extra_cols):
        packed = np.zeros((1, 2, 9 + ctc_time + extra_cols), dtype="float32")
        packed[0, 0, 8] = 1.0  # one valid word
        packed[0, 0, :8] = [0, 0, 4, 0, 4, 4, 0, 4]
        # Greedy-decoded frames: 'a', blank, 'b', 'a' — the trailing 'a'
        # lives in the LAST frame, exactly what a short slice loses.
        packed[0, 0, 9 : 9 + ctc_time] = [0, 2, 1, 0]
        if extra_cols:
            packed[0, 0, -1] = 1.0  # ncomp column (new layout)
        return packed

    class FakeExported:
        def __init__(self, packed):
            self._packed = packed

        def call(self, batch):
            return self._packed

    image = np.zeros((8, 8, 3), dtype="uint8")
    for extra_cols in (0, 1):  # old layout, new layout
        served = ExportedPipeline(FakeExported(make_packed(extra_cols)), meta)
        [(word, box)] = served.recognize([image])[0:1][0]
        assert word == "aba", (extra_cols, word)
        assert box.shape == (4, 2)


def test_export_matches_live_on_multiblob_scene(tmp_path):
    """VERDICT r3 item 6: the exported artifact's default refine baking
    must reproduce the LIVE pipeline's refine-ladder output on a
    multi-blob component (ref contours[0] semantics, detection.py:267-273)
    — and surface clean diagnostics for it."""
    import os
    import string
    import sys

    import jax.numpy as jnp

    from keras_ocr_tpu.pipeline import load_exported

    sys.path.insert(0, os.path.dirname(__file__))
    from test_refine import _multiblob_heatmap

    hm = _multiblob_heatmap(np.random.RandomState(5), n_words=2)

    class _FakeCraft:
        """Shape-compatible CRAFT stand-in emitting a fixed heatmap."""

        def __init__(self, heatmap):
            self.heatmap = jnp.asarray(heatmap)

        def apply(self, variables, x, train=False):
            del variables, train
            return jnp.broadcast_to(
                self.heatmap[None], (x.shape[0],) + self.heatmap.shape
            )

    detector = Detector(weights=None, max_components=16)
    detector.model = _FakeCraft(hm)
    recognizer = Recognizer(
        weights=None, alphabet=string.digits + string.ascii_lowercase
    )
    image_height, image_width = hm.shape[0] * 2, hm.shape[1] * 2
    pipeline = keras_ocr_tpu.Pipeline(
        detector=detector, recognizer=recognizer, scale=1, max_words=8,
        pad_to=(image_height, image_width),
    )
    image = np.zeros((image_height, image_width, 3), dtype="uint8")

    live = pipeline.recognize(images=[image])[0]
    assert pipeline.last_run_stats["refine_escalations"] >= 1
    assert len(live) >= 2

    artifact_path = os.path.join(str(tmp_path), "ocr_multiblob")
    pipeline.export(artifact_path, height=image_height, width=image_width)
    served = load_exported(artifact_path)
    exported, diags = served.recognize([image], return_diagnostics=True)
    exported = exported[0]

    assert [w for w, _ in exported] == [w for w, _ in live]
    for (_, box_a), (_, box_b) in zip(exported, live):
        np.testing.assert_allclose(box_a, box_b, atol=1e-4)
    assert diags[0]["refine_pending"] is False
    assert diags[0]["warp_downscaled"] is False
    assert diags[0]["converged"] is True
    assert diags[0]["truncated"] is False
    assert diags[0]["n_components"] >= 2
