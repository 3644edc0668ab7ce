"""Weight converter tests against synthetic Keras-format .h5 files.

The published weights can't be downloaded offline, so we construct .h5
files with the exact Keras layout (model_weights/<layer> groups with
``weight_names`` attrs) from our own random Flax variables, then check the
converters reproduce them bit-exactly — validating the code path the real
craft_mlt_25k.h5 / crnn_kurapan.h5 files will take.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

h5py = pytest.importorskip("h5py")

from keras_ocr_tpu import weights as weights_lib
from keras_ocr_tpu.models.craft import CRAFT
from keras_ocr_tpu.models.crnn import CRNN


def _write_layer(model_weights, layer_name, arrays_with_names):
    group = model_weights.create_group(layer_name) if layer_name not in model_weights else model_weights[layer_name]
    names = []
    for name, arr in arrays_with_names:
        full = f"{layer_name}/{name}"
        group.create_dataset(full, data=arr)
        names.append(full.encode())
    group.attrs["weight_names"] = names


def test_craft_h5_round_trip(tmp_path):
    model = CRAFT()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    rng = np.random.RandomState(0)
    variables = jax.tree.map(
        lambda a: jnp.asarray(rng.uniform(0.5, 1.5, a.shape).astype("float32")), variables
    )
    path = str(tmp_path / "craft.h5")
    with h5py.File(path, "w") as f:
        mw = f.create_group("model_weights")
        for ref_name, (tree_path, kind) in weights_lib.craft_name_map().items():
            pnode = variables["params"]
            for key in tree_path:
                pnode = pnode[key]
            if kind == "conv":
                _write_layer(
                    mw, ref_name,
                    [("kernel:0", np.asarray(pnode["kernel"])), ("bias:0", np.asarray(pnode["bias"]))],
                )
            else:
                snode = variables["batch_stats"]
                for key in tree_path:
                    snode = snode[key]
                _write_layer(
                    mw, ref_name,
                    [
                        ("gamma:0", np.asarray(pnode["scale"])),
                        ("beta:0", np.asarray(pnode["bias"])),
                        ("moving_mean:0", np.asarray(snode["mean"])),
                        ("moving_variance:0", np.asarray(snode["var"])),
                    ],
                )
    recovered = weights_lib.craft_variables_from_h5(path)
    weights_lib.validate_against(recovered, variables)
    for a, b in zip(jax.tree.leaves(recovered), jax.tree.leaves(variables)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_crnn_h5_round_trip(tmp_path):
    model = CRNN(alphabet_size=36)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 31, 200, 1)), train=False)
    rng = np.random.RandomState(1)
    variables = jax.tree.map(
        lambda a: jnp.asarray(rng.uniform(0.5, 1.5, a.shape).astype("float32")), variables
    )
    params = variables["params"]
    stats = variables["batch_stats"]
    path = str(tmp_path / "crnn.h5")
    with h5py.File(path, "w") as f:
        mw = f.create_group("model_weights")
        for name in weights_lib.CRNN_CONV_LAYERS + weights_lib.CRNN_DENSE_LAYERS:
            _write_layer(
                mw, name,
                [("kernel:0", np.asarray(params[name]["kernel"])), ("bias:0", np.asarray(params[name]["bias"]))],
            )
        for name in weights_lib.CRNN_BN_LAYERS:
            _write_layer(
                mw, name,
                [
                    ("gamma:0", np.asarray(params[name]["scale"])),
                    ("beta:0", np.asarray(params[name]["bias"])),
                    ("moving_mean:0", np.asarray(stats[name]["mean"])),
                    ("moving_variance:0", np.asarray(stats[name]["var"])),
                ],
            )
        for name in weights_lib.CRNN_LSTM_LAYERS:
            _write_layer(
                mw, name,
                [
                    ("kernel:0", np.asarray(params[name]["kernel"])),
                    ("recurrent_kernel:0", np.asarray(params[name]["recurrent_kernel"])),
                    ("bias:0", np.asarray(params[name]["bias"])),
                ],
            )
        # Nested localization model with auto-generated names, like Keras
        # writes it (recognition.py:268-281's unnamed inner Model).
        stn = params["stn"]
        _write_layer(
            mw, "model_1",
            [
                ("conv2d/kernel:0", np.asarray(stn["conv1"]["kernel"])),
                ("conv2d/bias:0", np.asarray(stn["conv1"]["bias"])),
                ("conv2d_1/kernel:0", np.asarray(stn["conv2"]["kernel"])),
                ("conv2d_1/bias:0", np.asarray(stn["conv2"]["bias"])),
                ("dense/kernel:0", np.asarray(stn["dense1"]["kernel"])),
                ("dense/bias:0", np.asarray(stn["dense1"]["bias"])),
                ("dense_1/kernel:0", np.asarray(stn["dense2"]["kernel"])),
                ("dense_1/bias:0", np.asarray(stn["dense2"]["bias"])),
            ],
        )
    recovered = weights_lib.crnn_variables_from_h5(path, include_top=True)
    weights_lib.validate_against(recovered, variables)
    for a, b in zip(jax.tree.leaves(recovered), jax.tree.leaves(variables)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_crnn_h5_stn_global_counter_names(tmp_path):
    """STN sub-layers carry GLOBAL Keras auto-name counters from whatever
    session saved the file (e.g. conv2d_9, conv2d_10) — lexical sorting
    would order conv2d_10 before conv2d_9. Conversion must follow the
    weight_names build order, not names."""
    model = CRNN(alphabet_size=36)
    variables = model.init(
        jax.random.PRNGKey(2), jnp.zeros((1, 31, 200, 1)), train=False
    )
    rng = np.random.RandomState(3)
    variables = jax.tree.map(
        lambda a: jnp.asarray(rng.uniform(0.5, 1.5, a.shape).astype("float32")),
        variables,
    )
    params = variables["params"]
    stats = variables["batch_stats"]
    path = str(tmp_path / "crnn_counters.h5")
    with h5py.File(path, "w") as f:
        # save_weights layout: groups at root, no model_weights wrapper.
        for name in weights_lib.CRNN_CONV_LAYERS + weights_lib.CRNN_DENSE_LAYERS:
            _write_layer(
                f, name,
                [("kernel:0", np.asarray(params[name]["kernel"])), ("bias:0", np.asarray(params[name]["bias"]))],
            )
        for name in weights_lib.CRNN_BN_LAYERS:
            _write_layer(
                f, name,
                [
                    ("gamma:0", np.asarray(params[name]["scale"])),
                    ("beta:0", np.asarray(params[name]["bias"])),
                    ("moving_mean:0", np.asarray(stats[name]["mean"])),
                    ("moving_variance:0", np.asarray(stats[name]["var"])),
                ],
            )
        for name in weights_lib.CRNN_LSTM_LAYERS:
            _write_layer(
                f, name,
                [
                    ("kernel:0", np.asarray(params[name]["kernel"])),
                    ("recurrent_kernel:0", np.asarray(params[name]["recurrent_kernel"])),
                    ("bias:0", np.asarray(params[name]["bias"])),
                ],
            )
        stn = params["stn"]
        _write_layer(
            f, "model_3",
            [
                ("model_3/conv2d_9/kernel:0", np.asarray(stn["conv1"]["kernel"])),
                ("model_3/conv2d_9/bias:0", np.asarray(stn["conv1"]["bias"])),
                ("model_3/conv2d_10/kernel:0", np.asarray(stn["conv2"]["kernel"])),
                ("model_3/conv2d_10/bias:0", np.asarray(stn["conv2"]["bias"])),
                ("model_3/dense_9/kernel:0", np.asarray(stn["dense1"]["kernel"])),
                ("model_3/dense_9/bias:0", np.asarray(stn["dense1"]["bias"])),
                ("model_3/dense_10/kernel:0", np.asarray(stn["dense2"]["kernel"])),
                ("model_3/dense_10/bias:0", np.asarray(stn["dense2"]["bias"])),
            ],
        )
    recovered = weights_lib.crnn_variables_from_h5(path, include_top=True)
    weights_lib.validate_against(recovered, variables)
    for a, b in zip(jax.tree.leaves(recovered), jax.tree.leaves(variables)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_crnn_h5_notop(tmp_path):
    # notop file lacks fc_12; converter must skip it.
    model = CRNN(alphabet_size=5)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 31, 200, 1)), train=False)
    params = variables["params"]
    stats = variables["batch_stats"]
    path = str(tmp_path / "crnn_notop.h5")
    with h5py.File(path, "w") as f:
        mw = f.create_group("model_weights")
        for name in weights_lib.CRNN_CONV_LAYERS + ("fc_9",):
            _write_layer(
                mw, name,
                [("kernel:0", np.asarray(params[name]["kernel"])), ("bias:0", np.asarray(params[name]["bias"]))],
            )
        for name in weights_lib.CRNN_BN_LAYERS:
            _write_layer(
                mw, name,
                [
                    ("gamma:0", np.asarray(params[name]["scale"])),
                    ("beta:0", np.asarray(params[name]["bias"])),
                    ("moving_mean:0", np.asarray(stats[name]["mean"])),
                    ("moving_variance:0", np.asarray(stats[name]["var"])),
                ],
            )
        for name in weights_lib.CRNN_LSTM_LAYERS:
            _write_layer(
                mw, name,
                [
                    ("kernel:0", np.asarray(params[name]["kernel"])),
                    ("recurrent_kernel:0", np.asarray(params[name]["recurrent_kernel"])),
                    ("bias:0", np.asarray(params[name]["bias"])),
                ],
            )
        stn = params["stn"]
        _write_layer(
            mw, "functional_1",
            [
                ("conv2d/kernel:0", np.asarray(stn["conv1"]["kernel"])),
                ("conv2d/bias:0", np.asarray(stn["conv1"]["bias"])),
                ("conv2d_1/kernel:0", np.asarray(stn["conv2"]["kernel"])),
                ("conv2d_1/bias:0", np.asarray(stn["conv2"]["bias"])),
                ("dense/kernel:0", np.asarray(stn["dense1"]["kernel"])),
                ("dense/bias:0", np.asarray(stn["dense1"]["bias"])),
                ("dense_1/kernel:0", np.asarray(stn["dense2"]["kernel"])),
                ("dense_1/bias:0", np.asarray(stn["dense2"]["bias"])),
            ],
        )
    recovered = weights_lib.crnn_variables_from_h5(path, include_top=False)
    assert "fc_12" not in recovered["params"]
    assert "stn" in recovered["params"]
