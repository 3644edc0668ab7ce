"""Pretrained-weight registry, download, and conversion to Flax param trees.

Mirrors the reference's weight distribution: the same GitHub-release URLs
and sha256 hashes (/root/reference/keras_ocr/detection.py:647-658,
recognition.py:27-44) cached via sha256-verified download
(tools.py:501-530), plus converters from the published formats — torch
``.pth`` state_dicts and Keras ``.h5`` files — into this framework's Flax
variable trees (the analog of detection.py:428-468's name-mapped loader).
"""

from __future__ import annotations

import typing

import numpy as np

from .. import tools
from ..models.craft import VGG_BLOCKS

DETECTOR_PRETRAINED = {
    ("clovaai_general", True): {
        "url": "https://github.com/faustomorales/keras-ocr/releases/download/v0.8.4/craft_mlt_25k.pth",
        "filename": "craft_mlt_25k.pth",
        "sha256": "4a5efbfb48b4081100544e75e1e2b57f8de3d84f213004b14b85fd4b3748db17",
    },
    ("clovaai_general", False): {
        "url": "https://github.com/faustomorales/keras-ocr/releases/download/v0.8.4/craft_mlt_25k.h5",
        "filename": "craft_mlt_25k.h5",
        "sha256": "7283ce2ff05a0617e9740c316175ff3bacdd7215dbdf1a726890d5099431f899",
    },
}

RECOGNIZER_PRETRAINED: typing.Dict[str, typing.Any] = {
    "kurapan": {
        "weights": {
            "notop": {
                "url": "https://github.com/faustomorales/keras-ocr/releases/download/v0.8.4/crnn_kurapan_notop.h5",
                "filename": "crnn_kurapan_notop.h5",
                "sha256": "027fd2cced3cbea0c4f5894bb8e9e85bac04f11daf96b8fdcf1e4ee95dcf51b9",
            },
            "top": {
                "url": "https://github.com/faustomorales/keras-ocr/releases/download/v0.8.4/crnn_kurapan.h5",
                "filename": "crnn_kurapan.h5",
                "sha256": "a7d8086ac8f5c3d6a0a828f7d6fbabcaf815415dd125c32533013f85603be46d",
            },
        },
    }
}


# Weight files are looked up OFFLINE first (vendored in-repo, then the
# shared cache) and only then over the network, trying the canonical GitHub
# release followed by mirrors. The bench environment's network is flaky
# (r1/r2 both failed DNS), so any round that ever gets a successful
# download persists the files into the vendored directory via
# :func:`vendor_weight_file` and every later round is hermetic.
WEIGHT_MIRRORS: typing.Tuple[str, ...] = (
    # Highest priority: an operator-supplied mirror base URL (joined with
    # the filename). Checked at call time so tests can monkeypatch env.
    # Then public mirrors of the keras-ocr release assets.
    "https://huggingface.co/spuun/keras-ocr-weights/resolve/main/{filename}",
    "https://storage.googleapis.com/keras-ocr/{filename}",
)


def vendored_weights_dir() -> str:
    """In-repo directory searched for weight files before any network use.

    Defaults to ``<repo-root>/weights_pretrained``; override with
    ``KERAS_OCR_TPU_VENDORED_WEIGHTS``.
    """
    import os

    default = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "weights_pretrained",
    )
    return os.environ.get("KERAS_OCR_TPU_VENDORED_WEIGHTS", default)


def vendor_weight_file(path: str) -> str:
    """Copy a verified weight file into the vendored in-repo directory.

    Called by the bench after a successful networked download so the file
    is committed with the round and later rounds never need the network.
    Returns the vendored path.
    """
    import os
    import shutil

    dest_dir = vendored_weights_dir()
    os.makedirs(dest_dir, exist_ok=True)
    dest = os.path.join(dest_dir, os.path.basename(path))
    if os.path.abspath(dest) != os.path.abspath(path) and (
        not os.path.isfile(dest) or tools.sha256sum(dest) != tools.sha256sum(path)
    ):
        shutil.copyfile(path, dest)
    return dest


def download_pretrained(config: dict) -> str:
    """Resolve a registry entry to a local verified file.

    Order: vendored in-repo copy -> shared sha256 cache -> canonical URL ->
    ``KERAS_OCR_TPU_WEIGHTS_MIRROR`` env base -> public mirrors. The first
    source whose sha256 matches wins.
    """
    import os

    filename = config["filename"]
    # Registry entries carry sha256 (preferred); entries whose upstream
    # publishes only md5 (keras-applications EfficientNet checkpoints)
    # carry "md5" instead.
    if "sha256" in config:
        expected, hash_fn = config["sha256"], tools.sha256sum
    else:
        expected, hash_fn = config["md5"], tools.md5sum
    vendored = os.path.join(vendored_weights_dir(), filename)
    if os.path.isfile(vendored) and hash_fn(vendored) == expected:
        return vendored
    urls = [config["url"]]
    mirror_base = os.environ.get("KERAS_OCR_TPU_WEIGHTS_MIRROR")
    if mirror_base:
        urls.insert(0, mirror_base.rstrip("/") + "/" + filename)
    urls.extend(m.format(filename=filename) for m in WEIGHT_MIRRORS)
    last_exc: typing.Optional[Exception] = None
    for url in urls:
        try:
            if hash_fn is tools.sha256sum:
                return tools.download_and_verify(
                    url=url, filename=filename, sha256=expected
                )
            path = tools.download_and_verify(url=url, filename=filename)
            if tools.md5sum(path) != expected:
                # download_and_verify with no sha256 trusts an existing
                # cache file, so a corrupt cache is only caught here.
                # Retry the same URL once after evicting it (a fresh
                # download usually succeeds) before moving to the next
                # mirror — mirrors download_and_extract's recovery.
                os.remove(path)
                path = tools.download_and_verify(url=url, filename=filename)
                if tools.md5sum(path) != expected:
                    os.remove(path)
                    raise ValueError(f"md5 mismatch for {path} (from {url})")
            return path
        except Exception as exc:  # noqa: BLE001 - try the next mirror
            last_exc = exc
    raise RuntimeError(
        f"Could not obtain {filename} from any of {len(urls)} sources "
        f"(vendored dir {vendored_weights_dir()!r} missing it too): {last_exc}"
    ) from last_exc


# ---------------------------------------------------------------------------
# CRAFT name mapping: reference layer name -> (path in our tree, kind)
# ---------------------------------------------------------------------------


def craft_name_map() -> typing.Dict[str, typing.Tuple[typing.Tuple[str, ...], str]]:
    """Reference CRAFT layer names -> our Flax param paths.

    The reference names mirror the torch state_dict
    (/root/reference/keras_ocr/detection.py:65-103,353-410), so this one
    table serves both the .pth and .h5 converters.
    """
    mapping: typing.Dict[str, typing.Tuple[typing.Tuple[str, ...], str]] = {}
    for slice_name, idx, _, _ in VGG_BLOCKS:
        base = ("basenet", f"{slice_name}_{idx}")
        mapping[f"basenet.{slice_name}.{idx}"] = (base + ("conv",), "conv")
        mapping[f"basenet.{slice_name}.{idx + 1}"] = (base + ("bn",), "bn")
    mapping["basenet.slice5.1"] = (("slice5_1",), "conv")
    mapping["basenet.slice5.2"] = (("slice5_2",), "conv")
    for i in range(1, 5):
        mapping[f"upconv{i}.conv.0"] = ((f"upconv{i}", "block0", "conv"), "conv")
        mapping[f"upconv{i}.conv.1"] = ((f"upconv{i}", "block0", "bn"), "bn")
        mapping[f"upconv{i}.conv.3"] = ((f"upconv{i}", "block1", "conv"), "conv")
        mapping[f"upconv{i}.conv.4"] = ((f"upconv{i}", "block1", "bn"), "bn")
    for n in (0, 2, 4, 6, 8):
        mapping[f"conv_cls.{n}"] = ((f"conv_cls_{n}",), "conv")
    return mapping


def _set_path(tree: dict, path: typing.Tuple[str, ...], leaf_name: str, value):
    node = tree
    for key in path:
        node = node.setdefault(key, {})
    node[leaf_name] = value


def craft_variables_from_torch_state_dict(state_dict) -> dict:
    """Convert a CRAFT ``.pth`` state_dict into Flax ``{'params', 'batch_stats'}``.

    Conv kernels go OIHW -> HWIO; BN (weight, bias, running_mean,
    running_var) -> (scale, bias) params + (mean, var) batch stats.
    Equivalent role to /root/reference/keras_ocr/detection.py:428-468.
    """
    cleaned = {}
    for key, value in state_dict.items():
        name = key[len("module."):] if key.startswith("module.") else key
        cleaned[name] = np.asarray(value)
    params: dict = {}
    batch_stats: dict = {}
    for ref_name, (path, kind) in craft_name_map().items():
        if kind == "conv":
            weight = cleaned[f"{ref_name}.weight"].transpose(2, 3, 1, 0)
            bias = cleaned[f"{ref_name}.bias"]
            _set_path(params, path, "kernel", weight.astype(np.float32))
            _set_path(params, path, "bias", bias.astype(np.float32))
        else:
            _set_path(params, path, "scale", cleaned[f"{ref_name}.weight"].astype(np.float32))
            _set_path(params, path, "bias", cleaned[f"{ref_name}.bias"].astype(np.float32))
            _set_path(batch_stats, path, "mean", cleaned[f"{ref_name}.running_mean"].astype(np.float32))
            _set_path(batch_stats, path, "var", cleaned[f"{ref_name}.running_var"].astype(np.float32))
    return {"params": params, "batch_stats": batch_stats}


def load_torch_checkpoint(path: str) -> dict:
    """Load a ``.pth`` file (host-side torch) and convert to Flax variables."""
    import torch

    state_dict = torch.load(path, map_location="cpu", weights_only=True)
    return craft_variables_from_torch_state_dict(
        {k: v.numpy() for k, v in state_dict.items()}
    )


# ---------------------------------------------------------------------------
# Keras .h5 reading
# ---------------------------------------------------------------------------


def _h5_layer_weights(h5file, layer_name: str) -> typing.List[np.ndarray]:
    """Collect the ordered weight arrays stored for one Keras layer."""
    import h5py

    root = h5file["model_weights"] if "model_weights" in h5file else h5file
    if layer_name not in root:
        raise KeyError(layer_name)
    group = root[layer_name]
    names = group.attrs.get("weight_names")
    arrays = []
    if names is not None:
        for name in names:
            if isinstance(name, bytes):
                name = name.decode()
            arrays.append(np.asarray(group[name]))
    else:
        def visit(_, obj):
            if isinstance(obj, h5py.Dataset):
                arrays.append(np.asarray(obj))
        group.visititems(visit)
    return arrays


def craft_variables_from_h5(path: str) -> dict:
    """Convert the published ``craft_mlt_25k.h5`` into Flax variables.

    Keras stores conv as [kernel(HWIO), bias] and BN as
    [gamma, beta, moving_mean, moving_var] — exactly our layout, so this
    is a pure re-pathing using :func:`craft_name_map`.
    """
    import h5py

    params: dict = {}
    batch_stats: dict = {}
    with h5py.File(path, "r") as f:
        for ref_name, (tree_path, kind) in craft_name_map().items():
            arrays = _h5_layer_weights(f, ref_name)
            if kind == "conv":
                kernel, bias = arrays
                _set_path(params, tree_path, "kernel", kernel.astype(np.float32))
                _set_path(params, tree_path, "bias", bias.astype(np.float32))
            else:
                gamma, beta, mean, var = arrays
                _set_path(params, tree_path, "scale", gamma.astype(np.float32))
                _set_path(params, tree_path, "bias", beta.astype(np.float32))
                _set_path(batch_stats, tree_path, "mean", mean.astype(np.float32))
                _set_path(batch_stats, tree_path, "var", var.astype(np.float32))
    return {"params": params, "batch_stats": batch_stats}


def load_craft_weights(path: str) -> dict:
    """Dispatch on file extension (.h5 Keras / .pth torch)."""
    if path.endswith(".h5"):
        return craft_variables_from_h5(path)
    if path.endswith(".pth"):
        return load_torch_checkpoint(path)
    raise NotImplementedError(f"Cannot load weights from {path}")


def validate_against(variables: dict, reference_variables: dict) -> None:
    """Assert two variable trees have identical structure and shapes."""
    import jax

    flat_a = jax.tree_util.tree_leaves_with_path(variables)
    flat_b = {
        jax.tree_util.keystr(path): leaf.shape
        for path, leaf in jax.tree_util.tree_leaves_with_path(reference_variables)
    }
    for path, leaf in flat_a:
        key = jax.tree_util.keystr(path)
        assert key in flat_b, f"Missing {key}"
        assert flat_b[key] == leaf.shape, f"Shape mismatch at {key}: {flat_b[key]} vs {leaf.shape}"
    assert len(flat_a) == len(flat_b), "Variable count mismatch"


# ---------------------------------------------------------------------------
# CRNN (.h5) conversion
# ---------------------------------------------------------------------------

CRNN_CONV_LAYERS = tuple(f"conv_{i}" for i in range(1, 8))
CRNN_BN_LAYERS = ("bn_3", "bn_5", "bn_7")
CRNN_LSTM_LAYERS = ("lstm_10", "lstm_10_back", "lstm_11", "lstm_11_back")
CRNN_DENSE_LAYERS = ("fc_9", "fc_12")
# Our STN submodule layer names in order, matched to the auto-named layers
# of the reference's nested localization model (recognition.py:268-278).
CRNN_STN_LAYERS = ("conv1", "conv2", "dense1", "dense2")


def _h5_find_stn_group(h5file):
    """Locate the nested localization-net model group in a CRNN .h5.

    The reference builds the locnet as an unnamed nested keras Model
    (recognition.py:268-278), so its group carries an auto-generated name
    ("model", "functional", ...). We find it by looking for the group whose
    weight names include both conv2d* and dense* variables.
    """
    root = h5file["model_weights"] if "model_weights" in h5file else h5file
    for name in root:
        group = root[name]
        names = group.attrs.get("weight_names")
        if names is None:
            continue
        joined = b"|".join(n if isinstance(n, bytes) else n.encode() for n in names)
        if b"conv2d" in joined and b"dense" in joined:
            return group
    return None


def crnn_variables_from_h5(path: str, include_top: bool = True) -> dict:
    """Convert a published CRNN ``.h5`` (top or notop) into Flax variables.

    Keras layouts map 1:1 onto ours: conv [kernel(HWIO), bias], BN
    [gamma, beta, mean, var], Dense [kernel(in,out), bias], LSTM
    [kernel(in,4u), recurrent_kernel(u,4u), bias(4u)] with gate order
    [i, f, c~, o] — see models/crnn.py.
    """
    import h5py

    params: dict = {}
    batch_stats: dict = {}
    with h5py.File(path, "r") as f:
        for name in CRNN_CONV_LAYERS:
            kernel, bias = _h5_layer_weights(f, name)
            params[name] = {"kernel": kernel.astype(np.float32), "bias": bias.astype(np.float32)}
        for name in CRNN_BN_LAYERS:
            gamma, beta, mean, var = _h5_layer_weights(f, name)
            params[name] = {"scale": gamma.astype(np.float32), "bias": beta.astype(np.float32)}
            batch_stats[name] = {"mean": mean.astype(np.float32), "var": var.astype(np.float32)}
        for name in CRNN_LSTM_LAYERS:
            kernel, recurrent, bias = _h5_layer_weights(f, name)
            params[name] = {
                "kernel": kernel.astype(np.float32),
                "recurrent_kernel": recurrent.astype(np.float32),
                "bias": bias.astype(np.float32),
            }
        dense_layers = CRNN_DENSE_LAYERS if include_top else CRNN_DENSE_LAYERS[:1]
        for name in dense_layers:
            kernel, bias = _h5_layer_weights(f, name)
            params[name] = {"kernel": kernel.astype(np.float32), "bias": bias.astype(np.float32)}
        stn = _h5_find_stn_group(f)
        if stn is not None:
            names = [
                n.decode() if isinstance(n, bytes) else n
                for n in stn.attrs["weight_names"]
            ]
            # The locnet sub-layers are auto-named with GLOBAL Keras
            # counters ("conv2d_7", "dense_2", ... — whatever the saving
            # session had created before), so names cannot be sorted or
            # matched. The `weight_names` attr preserves build order, and
            # the architecture is fixed (recognition.py:268-278): two 5x5
            # convs (16 then 32 filters) then Dense(64), Dense(6). Group
            # by appearance, classify by kernel rank, and verify shapes.
            groups: dict = {}
            for n in names:
                layer = n.split("/")[-2]
                groups.setdefault(layer, []).append(np.asarray(stn[n]))
            convs = [v for v in groups.values() if v[0].ndim == 4]
            denses = [v for v in groups.values() if v[0].ndim == 2]
            if len(convs) != 2 or len(denses) != 2:
                raise ValueError(
                    "Unexpected STN localization-net structure in "
                    f"{path!r}: {[(k, v[0].shape) for k, v in groups.items()]}"
                )
            expected_out = {"conv1": 16, "conv2": 32, "dense1": 64, "dense2": 6}
            stn_params = {}
            for ours, arrays in zip(CRNN_STN_LAYERS, convs + denses):
                kernel, bias = arrays
                if kernel.shape[-1] != expected_out[ours]:
                    raise ValueError(
                        f"STN layer {ours} expects {expected_out[ours]} "
                        f"output features, found kernel {kernel.shape} in {path!r}"
                    )
                stn_params[ours] = {
                    "kernel": kernel.astype(np.float32),
                    "bias": bias.astype(np.float32),
                }
            params["stn"] = stn_params
    return {"params": params, "batch_stats": batch_stats}


# Inverse converters (Flax variables -> reference .h5/.pth); defined in a
# submodule that consumes the layer tables above, re-exported here so the
# full weight-migration surface lives under ``keras_ocr_tpu.weights``.
from .export import (  # noqa: E402
    craft_variables_to_h5,
    craft_variables_to_torch_state_dict,
    crnn_variables_to_h5,
    save_craft_torch_checkpoint,
)
