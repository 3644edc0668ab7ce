"""ImageNet-pretrained initialization for the EfficientNet backbone.

The reference builds non-VGG detectors for training on top of
ImageNet-pretrained EfficientNet features
(/root/reference/keras_ocr/detection.py:338-341, via the
``efficientnet.tfkeras`` package's ``weights="imagenet"``). This module
provides the same capability for the Flax backbone
(:class:`keras_ocr_tpu.models.efficientnet.EfficientNetBackbone`): a
name-mapped converter from the standard TF EfficientNet ``.h5`` layer
naming (``stem_conv``, ``block{s}{b}_expand_conv``, ... — shared by
keras-applications and the reference's qubvel package, both ports of the
official TF implementation) plus sha-verified download of the
keras-applications ImageNet checkpoints.

Input-normalization compatibility: keras-applications EfficientNets fold
``x/255 -> (x - mean)/std`` (ImageNet constants) into in-graph layers;
that composition is exactly ``keras_ocr_tpu.detection.compute_input``
(reference detection.py:34-42), which the Detector applies for every
backbone — so feeding compute_input-normalized images to the converted
stem reproduces the pretrained models' expected input distribution.
"""

from __future__ import annotations

import numpy as np

# keras-applications ImageNet checkpoints (notop = feature extractor
# only, all the backbone taps need). Hashes are the md5 ``file_hash``
# values published in tf_keras.applications.efficientnet WEIGHTS_HASHES.
_BASE_URL = "https://storage.googleapis.com/keras-applications/"
EFFICIENTNET_IMAGENET = {
    f"efficientnetb{i}": {
        "filename": f"efficientnetb{i}_notop.h5",
        "url": _BASE_URL + f"efficientnetb{i}_notop.h5",
        "md5": md5,
    }
    for i, md5 in enumerate(
        [
            "50bc09e76180e00e4465e1a485ddc09d",
            "74c4e6b3e1f6a1eea24c589628592432",
            "111f8e2ac8aa800a7a99e3239f7bfb39",
            "af6d107764bb5b1abb91932881670226",
            "ebc24e6d6c33eaebbd558eafbeedf1ba",
            "38879255a25d3c92d5e44e04ae6cec6f",
            "9ecce42647a20130c1f39a5d4cb75743",
            "cbcfe4450ddf6f3ad90b1b398090fe4a",
        ]
    )
}


def _layer_weights(h5file, layer_name: str) -> dict:
    """{weight_name: ndarray} for one layer, tolerant of h5 nestings."""
    import h5py

    root = h5file
    if "model_weights" in root:
        root = root["model_weights"]
    if layer_name not in root:
        raise KeyError(f"layer {layer_name!r} not in checkpoint")
    out = {}

    def visit(name, obj):
        if isinstance(obj, h5py.Dataset):
            out[name.split("/")[-1].split(":")[0]] = np.asarray(obj)

    root[layer_name].visititems(visit)
    return out


def _conv(h5file, layer, params, bstats, flax_name, depthwise=False):
    w = _layer_weights(h5file, layer)
    kernel_key = "depthwise_kernel" if depthwise else "kernel"
    kernel = w[kernel_key].astype("float32")
    if depthwise:
        # keras depthwise (k, k, C, 1) -> flax grouped conv (k, k, 1, C).
        kernel = kernel.transpose(0, 1, 3, 2)
    entry = {"kernel": kernel}
    if "bias" in w:
        entry["bias"] = w["bias"].astype("float32")
    params[flax_name] = entry


def _bn(h5file, layer, params, bstats, flax_name):
    w = _layer_weights(h5file, layer)
    params[flax_name] = {
        "scale": w["gamma"].astype("float32"),
        "bias": w["beta"].astype("float32"),
    }
    bstats[flax_name] = {
        "mean": w["moving_mean"].astype("float32"),
        "var": w["moving_variance"].astype("float32"),
    }


def efficientnet_variables_from_h5(
    path: str, model_name: str = "efficientnetb0"
) -> dict:
    """TF EfficientNet ``.h5`` -> Flax backbone variable tree.

    Covers the stem and stages 1-5 (all the CRAFT decoder consumes,
    models/efficientnet.py); deeper stages and the classification head in
    the file are ignored. Raises ``KeyError`` on any missing layer, so a
    wrong-variant file fails loudly.
    """
    import h5py

    from ..models.efficientnet import (
        BASE_STAGES,
        SCALING,
        round_repeats,
    )

    width, depth = SCALING[model_name.lower()]
    params: dict = {"stem": {}}
    bstats: dict = {"stem": {}}
    with h5py.File(path, "r") as f:
        _conv(f, "stem_conv", params["stem"], None, "Conv_0")
        _bn(f, "stem_bn", params["stem"], bstats["stem"], "BatchNorm_0")
        for stage_index, (kernel, stride, expand, filters, repeats) in enumerate(
            BASE_STAGES, start=1
        ):
            for block_index in range(round_repeats(repeats, depth)):
                name = f"block{stage_index}{chr(ord('a') + block_index)}"
                bp: dict = {}
                bs: dict = {}
                if expand != 1:
                    _conv(f, f"{name}_expand_conv", bp, bs, "expand_conv")
                    _bn(f, f"{name}_expand_bn", bp, bs, "expand_bn")
                _conv(f, f"{name}_dwconv", bp, bs, "dwconv", depthwise=True)
                _bn(f, f"{name}_bn", bp, bs, "dw_bn")
                _conv(f, f"{name}_se_reduce", bp, bs, "se_reduce")
                _conv(f, f"{name}_se_expand", bp, bs, "se_expand")
                _conv(f, f"{name}_project_conv", bp, bs, "project_conv")
                _bn(f, f"{name}_project_bn", bp, bs, "project_bn")
                params[name] = bp
                bstats[name] = bs
            if stage_index == 5:
                break  # stages 6-7 unused by the CRAFT decoder
    return {"params": params, "batch_stats": bstats}


def load_efficientnet_imagenet(model_name: str = "efficientnetb0") -> dict:
    """Download (md5-verified, offline-first) + convert ImageNet weights."""
    from . import download_pretrained

    config = EFFICIENTNET_IMAGENET[model_name.lower()]
    path = download_pretrained(config)
    return efficientnet_variables_from_h5(path, model_name)


def graft_backbone_variables(
    detector_variables: dict, backbone_variables: dict
) -> dict:
    """Insert converted backbone variables into a CRAFT variable tree.

    The CRAFT module nests its backbone under ``basenet`` (see
    models/craft.py); decoder/head parameters keep their (random)
    initialization, exactly like the reference's fresh-detector build on a
    pretrained backbone (detection.py:338-341, 353-424).
    """
    out = {
        collection: dict(tree) for collection, tree in detector_variables.items()
    }
    for collection, tree in backbone_variables.items():
        merged = dict(out.get(collection, {}))
        merged["basenet"] = tree
        out[collection] = merged
    return out
