"""EfficientNet .h5 -> Flax converter parity vs a live TF model.

The reference initializes non-VGG detector backbones from ImageNet
EfficientNet checkpoints (/root/reference/keras_ocr/detection.py:338-341).
The ImageNet FILES need network, but the converter itself is proven
offline: build the real tf_keras EfficientNetB0 (random weights), save a
genuinely-Keras-written .h5, convert it, and compare the four CRAFT tap
activations (block{2,3,4,5}a_expand_activation) numerically — the same
live-parity strategy as tests/test_reference_live.py.
"""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")
import tf_keras  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from keras_ocr_tpu.models.efficientnet import EfficientNetBackbone  # noqa: E402
from keras_ocr_tpu.weights.efficientnet import (  # noqa: E402
    EFFICIENTNET_IMAGENET,
    efficientnet_variables_from_h5,
)


@pytest.fixture(scope="module")
def keras_b0(tmp_path_factory):
    tf_keras.backend.clear_session()
    model = tf_keras.applications.EfficientNetB0(
        weights=None, include_top=False, input_shape=(64, 64, 3)
    )
    path = str(tmp_path_factory.mktemp("effnet") / "b0.h5")
    model.save_weights(path)
    return model, path


def test_converted_tree_matches_init_shapes(keras_b0):
    _, path = keras_b0
    converted = efficientnet_variables_from_h5(path, "efficientnetb0")
    init = EfficientNetBackbone().init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))
    )
    flat_conv = jax.tree_util.tree_leaves_with_path(converted)
    flat_init = jax.tree_util.tree_leaves_with_path(init)
    paths_conv = {jax.tree_util.keystr(p): leaf.shape for p, leaf in flat_conv}
    paths_init = {jax.tree_util.keystr(p): leaf.shape for p, leaf in flat_init}
    assert paths_conv == paths_init


def test_tap_activations_match_live_keras(keras_b0):
    """The four CRAFT taps agree with the real keras graph to ~1e-4."""
    model, path = keras_b0
    taps_model = tf_keras.Model(
        model.input,
        [
            model.get_layer(f"block{stage}a_expand_activation").output
            for stage in (2, 3, 4, 5)
        ],
    )
    rng = np.random.RandomState(0)
    # With weights=None the keras graph's Normalization layer is identity
    # and only Rescaling(1/255) precedes the stem, so feed x*255 to keras
    # and x to the Flax backbone (whose Detector applies compute_input —
    # the exact composition the IMAGENET graph folds in; see
    # weights/efficientnet.py docstring).
    x = rng.uniform(-1.0, 1.0, size=(2, 64, 64, 3)).astype("float32")
    expected = [np.asarray(t) for t in taps_model(tf.constant(x * 255.0))]

    variables = efficientnet_variables_from_h5(path, "efficientnetb0")
    backbone = EfficientNetBackbone()
    ours = backbone.apply(variables, jnp.asarray(x), train=False)
    for i, (e, o) in enumerate(zip(expected, ours)):
        np.testing.assert_allclose(
            np.asarray(o), e, atol=2e-4, rtol=1e-3,
            err_msg=f"tap {i} (stage {i + 2})",
        )


def test_imagenet_registry_covers_all_variants():
    assert set(EFFICIENTNET_IMAGENET) == {
        f"efficientnetb{i}" for i in range(8)
    }
    for config in EFFICIENTNET_IMAGENET.values():
        assert set(config) == {"filename", "url", "md5"}
        assert len(config["md5"]) == 32
