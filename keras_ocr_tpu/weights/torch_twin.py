"""Functional PyTorch twin of the CRAFT graph, for weight/parity checks.

The reference ships a full torch CRAFT reimplementation used only to
validate its Keras port against the original clovaai ``.pth`` weights
(/root/reference/keras_ocr/detection.py:472-644,
tests/test_pytorch_keras.py:21-49). This module plays the same role for
the Flax model: an independently written torch forward over a
reference-named state_dict (``basenet.slice1.0``, ``upconv1.conv.0``,
``conv_cls.8``, ...), exercising conv/BN/pool/dilated-conv/bilinear
semantics end to end. Torch is an optional dependency — import lazily.

Used by tests/test_craft.py and exposed through
``keras_ocr_tpu.detection.build_torch_model``.
"""

from __future__ import annotations

import numpy as np

from ..models.craft import VGG_BLOCKS


def variables_to_torch_state_dict(variables):
    """Flax CRAFT variable tree -> reference-named torch state_dict.

    Inverse of :func:`keras_ocr_tpu.weights.craft_variables_from_torch_state_dict`.
    """
    import torch

    from . import craft_name_map

    sd = {}
    for ref_name, (path, kind) in craft_name_map().items():
        pnode = variables["params"]
        for key in path:
            pnode = pnode[key]
        if kind == "conv":
            sd[f"{ref_name}.weight"] = torch.tensor(
                np.asarray(pnode["kernel"]).transpose(3, 2, 0, 1)
            )
            sd[f"{ref_name}.bias"] = torch.tensor(np.asarray(pnode["bias"]))
        else:
            snode = variables["batch_stats"]
            for key in path:
                snode = snode[key]
            sd[f"{ref_name}.weight"] = torch.tensor(np.asarray(pnode["scale"]))
            sd[f"{ref_name}.bias"] = torch.tensor(np.asarray(pnode["bias"]))
            sd[f"{ref_name}.running_mean"] = torch.tensor(np.asarray(snode["mean"]))
            sd[f"{ref_name}.running_var"] = torch.tensor(np.asarray(snode["var"]))
    return sd


def torch_craft_forward(sd, x):
    """Torch twin of the CRAFT graph (NCHW input), written independently.

    Args:
        sd: reference-named state_dict (tensors).
        x: (B, 3, H, W) normalized input tensor.

    Returns:
        (B, 2, H/2, W/2) heatmap tensor (channel-first).
    """
    import torch
    import torch.nn.functional as F

    def conv(h, name, dilation=1):
        w = sd[f"{name}.weight"]
        pad = dilation * (w.shape[2] - 1) // 2
        return F.conv2d(h, w, sd[f"{name}.bias"], padding=pad, dilation=dilation)

    def bn(h, name):
        return F.batch_norm(
            h,
            sd[f"{name}.running_mean"],
            sd[f"{name}.running_var"],
            sd[f"{name}.weight"],
            sd[f"{name}.bias"],
            training=False,
            eps=1e-5,
        )

    taps = {}
    h = x
    for slice_name, idx, _, pool in VGG_BLOCKS:
        last = (slice_name, idx) == ("slice4", 37)
        h = bn(conv(h, f"basenet.{slice_name}.{idx}"), f"basenet.{slice_name}.{idx + 1}")
        if not last:
            h = F.relu(h)
        if (slice_name, idx) == ("slice1", 10):
            taps["s1"] = h
        elif (slice_name, idx) == ("slice2", 17):
            taps["s2"] = h
        elif (slice_name, idx) == ("slice3", 27):
            taps["s3"] = h
        elif last:
            taps["s4"] = h
        if pool:
            h = F.max_pool2d(h, 2, 2)

    s5 = F.max_pool2d(taps["s4"], 3, stride=1, padding=1)
    s5 = conv(s5, "basenet.slice5.1", dilation=6)
    s5 = conv(s5, "basenet.slice5.2")

    def upconv(h, i):
        h = F.relu(bn(conv(h, f"upconv{i}.conv.0"), f"upconv{i}.conv.1"))
        h = F.relu(bn(conv(h, f"upconv{i}.conv.3"), f"upconv{i}.conv.4"))
        return h

    y = torch.cat([s5, taps["s4"]], dim=1)
    y = upconv(y, 1)
    for i, skip in ((2, "s3"), (3, "s2"), (4, "s1")):
        y = F.interpolate(
            y, size=taps[skip].shape[2:], mode="bilinear", align_corners=False
        )
        y = torch.cat([y, taps[skip]], dim=1)
        y = upconv(y, i)

    y = F.relu(conv(y, "conv_cls.0"))
    y = F.relu(conv(y, "conv_cls.2"))
    y = F.relu(conv(y, "conv_cls.4"))
    y = F.relu(conv(y, "conv_cls.6"))
    y = conv(y, "conv_cls.8")
    return y


class TorchCRAFT:
    """Callable twin with the reference's build-then-load usage pattern.

    (detection.py:566-626's CRAFT module, reduced to the inference path.)
    """

    def __init__(self, state_dict=None):
        self.state_dict_ = dict(state_dict or {})

    def load_state_dict(self, state_dict):
        self.state_dict_ = dict(state_dict)
        return self

    def __call__(self, x):
        return torch_craft_forward(self.state_dict_, x)


def copy_state_dict(state_dict):
    """Strip a leading ``module.`` (DataParallel) prefix from every key.

    (detection.py:628-637's copyStateDict.)
    """
    return {
        (key[len("module.") :] if key.startswith("module.") else key): value
        for key, value in state_dict.items()
    }


def build_torch_model(weights_path=None):
    """Build the torch CRAFT twin, optionally loading a ``.pth`` checkpoint.

    (detection.py:472-644; the state_dict keys are the original clovaai
    names, so a downloaded ``craft_mlt_25k.pth`` loads directly.)
    """
    model = TorchCRAFT()
    if weights_path is not None:
        import torch

        sd = torch.load(weights_path, map_location="cpu", weights_only=True)
        model.load_state_dict(copy_state_dict(sd))
    return model
