"""Export Flax variables back to the reference's on-disk weight formats.

The migration story runs both ways: models fine-tuned in this framework
can be written as Keras ``.h5`` weight files that the reference's
``build_keras_model(weights_path=...)`` / ``Recognizer`` load directly
(topological ``load_weights``, the call the reference makes —
/root/reference/keras_ocr/detection.py:414-417,
/root/reference/keras_ocr/recognition.py:388-404), or as CRAFT ``.pth``
state dicts in the original NAVER naming that the reference's torch model
(detection.py:472-644) consumes.

The ``.h5`` files replicate what Keras 2's ``save_weights`` produces: a
group per layer (weightless layers included with an empty ``weight_names``
attr), ``layer_names``/``backend``/``keras_version`` root attrs, and the
reference graphs' exact topological layer order (captured from live
reference builds; auto-generated names like ``upsample_like_1`` are
labels only — Keras's topological loader matches by order, not name).
Round-trip parity against the live reference is tested in
tests/test_reference_live.py.
"""

import typing

import numpy as np

from . import (
    CRNN_BN_LAYERS,
    CRNN_CONV_LAYERS,
    CRNN_DENSE_LAYERS,
    CRNN_LSTM_LAYERS,
    CRNN_STN_LAYERS,
    craft_name_map,
)

# Topological layer order of the reference CRAFT graph
# (detection.py:353-424): VGG16-BN slices, the dilated s5 stage, four
# upconv blocks with bilinear upsampling + skip concats, and the cls head.
_CRAFT_VGG_SLICES = (
    ("slice1", range(0, 14)),
    ("slice2", range(14, 20)),
    ("slice3", range(20, 30)),
    ("slice4", range(30, 39)),
)


def _craft_layer_order() -> typing.List[str]:
    order = ["input_1"]
    for slice_name, indices in _CRAFT_VGG_SLICES:
        order.extend(f"basenet.{slice_name}.{i}" for i in indices)
    order.extend(["basenet.slice5.0", "basenet.slice5.1", "basenet.slice5.2"])
    order.append("concatenate")
    for i in range(1, 5):
        order.extend(f"upconv{i}.conv.{j}" for j in range(6))
        if i < 4:
            order.append("upsample_like" if i == 1 else f"upsample_like_{i - 1}")
            order.append(f"concatenate_{i}")
    order.extend(f"conv_cls.{i}" for i in range(9))
    return order


# Topological layer order of the reference CRNN graphs with the default
# build_params (recognition.py:187-350); the "model_2" group is the
# auto-named nested STN localization model (recognition.py:268-281).
_CRNN_BACKBONE_ORDER = [
    "input_2",
    "permute",
    "lambda",
    "conv_1",
    "conv_2",
    "conv_3",
    "bn_3",
    "maxpool_3",
    "conv_4",
    "conv_5",
    "bn_5",
    "maxpool_5",
    "conv_6",
    "conv_7",
    "bn_7",
    "model_2",
    "lambda_1",
    "reshape",
    "fc_9",
    "lstm_10",
    "lstm_10_back",
    "add",
    "lstm_11",
    "lstm_11_back",
    "concatenate_4",
]
_CRNN_TOP_ORDER = _CRNN_BACKBONE_ORDER + ["dropout", "fc_12", "lambda_2"]

# The nested STN model's inner layers in build order (two 5x5 convs, two
# denses — recognition.py:268-278), with fresh-session Keras auto-names.
_STN_INNER_NAMES = ("conv2d", "conv2d_1", "dense", "dense_1")


def _write_h5(path: str, layer_order: typing.List[str], weights: dict) -> None:
    """Write a Keras-2-style ``save_weights`` file.

    ``weights`` maps layer name -> ordered list of (weight_name, array);
    layers absent from it are written as weightless groups.
    """
    import h5py

    with h5py.File(path, "w") as f:
        f.attrs["layer_names"] = np.array(
            [name.encode("utf8") for name in layer_order]
        )
        f.attrs["backend"] = b"tensorflow"
        f.attrs["keras_version"] = b"2.15.0"
        for layer_name in layer_order:
            group = f.create_group(layer_name)
            entries = weights.get(layer_name, [])
            group.attrs["weight_names"] = np.array(
                [name.encode("utf8") for name, _ in entries]
            )
            for name, array in entries:
                group.create_dataset(
                    name, data=np.asarray(array, dtype=np.float32)
                )


def _get_path(tree: dict, path: typing.Tuple[str, ...]) -> dict:
    node = tree
    for key in path:
        node = node[key]
    return node


def craft_variables_to_h5(variables: dict, path: str) -> str:
    """Write CRAFT Flax variables as a reference-loadable Keras ``.h5``.

    The inverse of :func:`craft_variables_from_h5`:
    ``build_keras_model(weights_path=<path>)`` restores the same model.
    """
    weights: dict = {}
    for ref_name, (tree_path, kind) in craft_name_map().items():
        if kind == "conv":
            node = _get_path(variables["params"], tree_path)
            weights[ref_name] = [
                (f"{ref_name}/kernel:0", node["kernel"]),
                (f"{ref_name}/bias:0", node["bias"]),
            ]
        else:
            node = _get_path(variables["params"], tree_path)
            stats = _get_path(variables["batch_stats"], tree_path)
            weights[ref_name] = [
                (f"{ref_name}/gamma:0", node["scale"]),
                (f"{ref_name}/beta:0", node["bias"]),
                (f"{ref_name}/moving_mean:0", stats["mean"]),
                (f"{ref_name}/moving_variance:0", stats["var"]),
            ]
    _write_h5(path, _craft_layer_order(), weights)
    return path


def crnn_variables_to_h5(variables: dict, path: str, include_top: bool = True) -> str:
    """Write CRNN Flax variables as a reference-loadable Keras ``.h5``.

    The inverse of :func:`crnn_variables_from_h5` for the default
    ``build_params`` graph: the reference ``Recognizer``'s
    ``model.load_weights`` (top) or ``backbone.load_weights`` (notop)
    restores the same network (recognition.py:388-404). Variables from a
    ``stn=False`` build (no ``params["stn"]`` subtree) produce a file for
    the reference's ``build_model(..., stn=False)`` graph, which skips the
    nested localization model and the transform Lambda
    (recognition.py:243-281): Keras's topological loader matches saved
    groups to model layers by order, so the two groups are simply omitted.
    """
    params = variables["params"]
    batch_stats = variables["batch_stats"]
    weights: dict = {}
    for name in CRNN_CONV_LAYERS:
        weights[name] = [
            (f"{name}/kernel:0", params[name]["kernel"]),
            (f"{name}/bias:0", params[name]["bias"]),
        ]
    for name in CRNN_BN_LAYERS:
        weights[name] = [
            (f"{name}/gamma:0", params[name]["scale"]),
            (f"{name}/beta:0", params[name]["bias"]),
            (f"{name}/moving_mean:0", batch_stats[name]["mean"]),
            (f"{name}/moving_variance:0", batch_stats[name]["var"]),
        ]
    for name in CRNN_LSTM_LAYERS:
        weights[name] = [
            (f"{name}/lstm_cell/kernel:0", params[name]["kernel"]),
            (f"{name}/lstm_cell/recurrent_kernel:0", params[name]["recurrent_kernel"]),
            (f"{name}/lstm_cell/bias:0", params[name]["bias"]),
        ]
    dense_layers = CRNN_DENSE_LAYERS if include_top else CRNN_DENSE_LAYERS[:1]
    for name in dense_layers:
        weights[name] = [
            (f"{name}/kernel:0", params[name]["kernel"]),
            (f"{name}/bias:0", params[name]["bias"]),
        ]
    order = _CRNN_TOP_ORDER if include_top else _CRNN_BACKBONE_ORDER
    if "stn" in params:
        stn_entries = []
        for ours, inner in zip(CRNN_STN_LAYERS, _STN_INNER_NAMES):
            node = params["stn"][ours]
            stn_entries.append((f"{inner}/kernel:0", node["kernel"]))
            stn_entries.append((f"{inner}/bias:0", node["bias"]))
        weights["model_2"] = stn_entries
    else:
        order = [n for n in order if n not in ("model_2", "lambda_1")]
    _write_h5(path, order, weights)
    return path


def craft_variables_to_torch_state_dict(variables: dict) -> dict:
    """CRAFT Flax variables -> NAVER-named numpy state dict.

    The inverse of :func:`craft_variables_from_torch_state_dict`: conv
    kernels go HWIO -> OIHW; BN params/stats become weight/bias/
    running_mean/running_var (plus the ``num_batches_tracked`` bookkeeping
    entries torch modules carry).
    """
    state: dict = {}
    for ref_name, (tree_path, kind) in craft_name_map().items():
        if kind == "conv":
            node = _get_path(variables["params"], tree_path)
            state[f"{ref_name}.weight"] = np.asarray(
                node["kernel"], dtype=np.float32
            ).transpose(3, 2, 0, 1)
            state[f"{ref_name}.bias"] = np.asarray(node["bias"], dtype=np.float32)
        else:
            node = _get_path(variables["params"], tree_path)
            stats = _get_path(variables["batch_stats"], tree_path)
            state[f"{ref_name}.weight"] = np.asarray(node["scale"], dtype=np.float32)
            state[f"{ref_name}.bias"] = np.asarray(node["bias"], dtype=np.float32)
            state[f"{ref_name}.running_mean"] = np.asarray(
                stats["mean"], dtype=np.float32
            )
            state[f"{ref_name}.running_var"] = np.asarray(
                stats["var"], dtype=np.float32
            )
            state[f"{ref_name}.num_batches_tracked"] = np.asarray(0, dtype=np.int64)
    return state


def save_craft_torch_checkpoint(variables: dict, path: str) -> str:
    """Write CRAFT Flax variables as a ``.pth`` the reference torch model
    (and :func:`load_torch_checkpoint`) can load. Requires torch."""
    import torch

    state = {
        key: torch.from_numpy(np.ascontiguousarray(value).copy())
        if isinstance(value, np.ndarray) and value.ndim
        else torch.tensor(value)
        for key, value in craft_variables_to_torch_state_dict(variables).items()
    }
    torch.save(state, path)
    return path
