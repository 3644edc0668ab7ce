"""CRAFT text detector as a Flax module.

Re-implements the reference's Keras CRAFT graph
(/root/reference/keras_ocr/detection.py:65-103,290-424) TPU-first: NHWC
layout (native for TPU convolutions), Flax linen modules compiled by XLA
with conv+BN+ReLU fusion, bfloat16 compute policy for the MXU with fp32
parameters, and the bilinear ``UpsampleLike`` expressed as interpolation
matmuls (:func:`keras_ocr_tpu.ops.image.resize_bilinear`).

Architecture (parity notes, validated against a torch twin in
tests/test_craft.py):

* VGG16-BN backbone with skip taps exactly where the reference Keras graph
  taps them (detection.py:327-335): ``s1``/``s2``/``s3`` are the
  *post-ReLU* outputs of layers named ``basenet.slice1.12`` /
  ``basenet.slice2.19`` / ``basenet.slice3.29``, and ``s4`` is the
  *pre-ReLU* BatchNorm output named ``basenet.slice4.38``. (The original
  clovaai torch model taps pre-ReLU for s1-s3; keras-ocr's published
  ``.h5`` weights and P/R numbers correspond to the Keras graph, which is
  what we reproduce.)
* ``s5``: 3x3 stride-1 same-pad max-pool, then a 3x3 dilation-6 conv(1024)
  and a 1x1 conv(1024), both bias-only (no BN/ReLU) (detection.py:365-378).
* U-decoder: concat + ``upconv`` (1x1 conv-BN-ReLU then 3x3 conv-BN-ReLU)
  chain 512-256-128-64 with bilinear resize-to-skip between stages
  (detection.py:380-390).
* Classification head: 3x3(32)-ReLU x2, 3x3(16)-ReLU, 1x1(16)-ReLU,
  1x1(2); sigmoid only for non-VGG backbones (detection.py:392-412).

Output: (B, H/2, W/2, 2) text + link heatmaps.
"""

from __future__ import annotations

import typing

import flax.linen as nn
import jax.numpy as jnp

from ..ops.image import resize_bilinear

# (slice name, reference layer index of the conv, filters, pool after block)
# Layer numbering mirrors the reference/torch state_dict naming so weight
# conversion is a pure rename (detection.py:312-335).
VGG_BLOCKS: typing.Tuple[typing.Tuple[str, int, int, bool], ...] = (
    ("slice1", 0, 64, False),
    ("slice1", 3, 64, True),
    ("slice1", 7, 128, False),
    ("slice1", 10, 128, True),
    ("slice2", 14, 256, False),
    ("slice2", 17, 256, False),
    ("slice3", 20, 256, True),
    ("slice3", 24, 512, False),
    ("slice3", 27, 512, False),
    ("slice4", 30, 512, True),
    ("slice4", 34, 512, False),
    ("slice4", 37, 512, False),  # ends at BN (pre-ReLU) = s4 tap
)


class ConvBN(nn.Module):
    """Conv + BatchNorm (+ optional ReLU) with reference-compatible naming.

    ``fold_bn=True`` builds the inference-only variant with the BatchNorm
    folded into the convolution's kernel/bias (see
    :func:`fold_bn_variables`); training requires ``fold_bn=False``.
    """

    features: int
    kernel: int = 3
    dilation: int = 1
    relu: bool = True
    bn_eps: float = 1e-5
    bn_momentum: float = 0.9
    fold_bn: bool = False
    dtype: typing.Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            kernel_dilation=(self.dilation, self.dilation),
            padding="SAME",
            dtype=self.dtype,
            name="conv",
        )(x)
        if not self.fold_bn:
            x = nn.BatchNorm(
                use_running_average=not train,
                epsilon=self.bn_eps,
                momentum=self.bn_momentum,
                dtype=self.dtype,
                name="bn",
            )(x)
        if self.relu:
            x = nn.relu(x)
        return x


def _max_pool(x, window, stride, padding):
    return nn.max_pool(x, (window, window), strides=(stride, stride), padding=padding)


def _scaled(filters: int, width: float) -> int:
    """Width-multiplied channel count, floored to a multiple of 8.

    MXU lanes are 128 wide; multiples of 8 keep the narrowest slim
    configuration layout-friendly without forcing 128-padding on a model
    whose point is to be tiny (the committed golden artifact)."""
    if width == 1.0:
        return filters
    return max(8, int(filters * width) // 8 * 8)


class VGG16BN(nn.Module):
    """VGG16-BN backbone emitting the four CRAFT skip taps.

    Tap placement parity: /root/reference/keras_ocr/detection.py:312-335.
    ``width`` scales every channel count (1.0 = the reference graph; the
    slim setting exists for the committed offline golden artifact, see
    scripts/make_golden_artifact.py).
    """

    fold_bn: bool = False
    width: float = 1.0
    dtype: typing.Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        taps = {}
        for slice_name, idx, filters, pool in VGG_BLOCKS:
            last = (slice_name, idx) == ("slice4", 37)
            x = ConvBN(
                features=_scaled(filters, self.width),
                kernel=3,
                relu=not last,
                fold_bn=self.fold_bn,
                bn_eps=1e-5,
                # torch BatchNorm momentum=0.1 updates running stats as
                # ra = 0.9*ra + 0.1*x; Flax's ``momentum`` IS that 0.9
                # decay factor (torchvision vgg16_bn default). NOTE the
                # reference passes the literal 0.1 to Keras BatchNorm
                # (/root/reference/keras_ocr/detection.py:95-96), whose
                # momentum is ALSO the decay — i.e. the reference decays
                # its running stats 81x faster than the torch original
                # when fine-tuning. We match the original CRAFT/torch
                # semantics; known deviation from the reference's
                # (copied-number) fine-tuning behavior.
                bn_momentum=0.9,
                dtype=self.dtype,
                name=f"{slice_name}_{idx}",
            )(x, train=train)
            if (slice_name, idx) == ("slice1", 10):
                taps["s1"] = x  # post-ReLU, 128ch @ H/2 (pre-pool)
            elif (slice_name, idx) == ("slice2", 17):
                taps["s2"] = x  # post-ReLU, 256ch @ H/4
            elif (slice_name, idx) == ("slice3", 27):
                taps["s3"] = x  # post-ReLU, 512ch @ H/8
            elif last:
                taps["s4"] = x  # pre-ReLU BN output, 512ch @ H/16
            if pool:
                x = _max_pool(x, 2, 2, "VALID")
        return taps["s1"], taps["s2"], taps["s3"], taps["s4"]


class UpConv(nn.Module):
    """1x1 conv-BN-ReLU + 3x3 conv-BN-ReLU decoder block.

    (/root/reference/keras_ocr/detection.py:65-84; output has
    ``filters // 2`` channels.)
    """

    filters: int
    fold_bn: bool = False
    dtype: typing.Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBN(
            self.filters, kernel=1, bn_eps=1e-5, bn_momentum=0.9,
            fold_bn=self.fold_bn, dtype=self.dtype, name="block0",
        )(x, train=train)
        x = ConvBN(
            self.filters // 2, kernel=3, bn_eps=1e-5, bn_momentum=0.9,
            fold_bn=self.fold_bn, dtype=self.dtype, name="block1",
        )(x, train=train)
        return x


class CRAFT(nn.Module):
    """Full CRAFT detector graph; output (B, H/2, W/2, 2) heatmaps."""

    backbone_name: str = "vgg"
    fold_bn: bool = False
    width: float = 1.0
    dtype: typing.Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.fold_bn and train:
            raise ValueError("fold_bn=True is an inference-only graph")
        x = x.astype(self.dtype)
        if self.backbone_name == "vgg":
            s1, s2, s3, s4 = VGG16BN(
                fold_bn=self.fold_bn, width=self.width,
                dtype=self.dtype, name="basenet"
            )(x, train=train)
        elif "efficientnet" in self.backbone_name.lower():
            if self.fold_bn or self.width != 1.0:
                raise NotImplementedError(
                    "fold_bn/width are implemented for the VGG backbone only"
                )
            from .efficientnet import EfficientNetBackbone

            s1, s2, s3, s4 = EfficientNetBackbone(
                model_name=self.backbone_name, dtype=self.dtype, name="basenet"
            )(x, train=train)
        else:
            raise NotImplementedError(self.backbone_name)

        # s5: dilated context head (detection.py:365-378), bias-only convs.
        s5 = _max_pool(s4, 3, 1, "SAME")
        s5 = nn.Conv(
            _scaled(1024, self.width), (3, 3), kernel_dilation=(6, 6),
            padding="SAME", dtype=self.dtype, name="slice5_1",
        )(s5)
        s5 = nn.Conv(
            _scaled(1024, self.width), (1, 1), dtype=self.dtype, name="slice5_2"
        )(s5)

        def up(filters):
            return _scaled(filters, self.width)

        y = jnp.concatenate([s5, s4], axis=-1)
        y = UpConv(up(512), fold_bn=self.fold_bn, dtype=self.dtype, name="upconv1")(y, train=train)
        y = resize_bilinear(y, s3.shape[1], s3.shape[2])
        y = jnp.concatenate([y, s3], axis=-1)
        y = UpConv(up(256), fold_bn=self.fold_bn, dtype=self.dtype, name="upconv2")(y, train=train)
        y = resize_bilinear(y, s2.shape[1], s2.shape[2])
        y = jnp.concatenate([y, s2], axis=-1)
        y = UpConv(up(128), fold_bn=self.fold_bn, dtype=self.dtype, name="upconv3")(y, train=train)
        y = resize_bilinear(y, s1.shape[1], s1.shape[2])
        y = jnp.concatenate([y, s1], axis=-1)
        features = UpConv(up(64), fold_bn=self.fold_bn, dtype=self.dtype, name="upconv4")(y, train=train)

        y = nn.Conv(32, (3, 3), padding="SAME", dtype=self.dtype, name="conv_cls_0")(features)
        y = nn.relu(y)
        y = nn.Conv(32, (3, 3), padding="SAME", dtype=self.dtype, name="conv_cls_2")(y)
        y = nn.relu(y)
        y = nn.Conv(16, (3, 3), padding="SAME", dtype=self.dtype, name="conv_cls_4")(y)
        y = nn.relu(y)
        y = nn.Conv(16, (1, 1), dtype=self.dtype, name="conv_cls_6")(y)
        y = nn.relu(y)
        y = nn.Conv(2, (1, 1), dtype=self.dtype, name="conv_cls_8")(y)
        if self.backbone_name != "vgg":
            y = nn.sigmoid(y)
        return y.astype(jnp.float32)


def fold_bn_variables(variables, eps: float = 1e-5):
    """Fold every ConvBN pair's BatchNorm into the conv kernel/bias.

    A pure parameter-tree transform for inference: returns variables for
    ``CRAFT(fold_bn=True)`` given variables of the standard graph. For
    each module holding both a ``conv`` and a ``bn`` child (plus running
    stats), with ``inv = gamma / sqrt(var + eps)``:

        kernel' = kernel * inv        (broadcast over the HWIO out axis)
        bias'   = (bias - mean) * inv + beta

    so ``relu(bn(conv(x)))`` == ``relu(conv'(x))`` exactly in infinite
    precision (parity-tested fp32 in tests/test_craft.py). The fold
    removes the 21 BatchNorm affine passes (13 backbone + 8 decoder) from
    the inference graph and ~23k parameters of BN state from HBM.
    """
    import flax.core

    params = flax.core.unfreeze(variables["params"])
    stats = flax.core.unfreeze(variables.get("batch_stats", {}))

    def walk(p, s):
        out = {}
        for key, value in p.items():
            if not isinstance(value, dict):
                out[key] = value
            elif "conv" in value and "bn" in value:
                conv, bn = value["conv"], value["bn"]
                running = s[key]["bn"]
                inv = (bn["scale"] / jnp.sqrt(running["var"] + eps)).astype(
                    conv["kernel"].dtype
                )
                folded = {
                    "kernel": conv["kernel"] * inv,
                    "bias": (conv.get("bias", 0.0) - running["mean"]) * inv
                    + bn["bias"],
                }
                out[key] = dict(value, conv=folded)
                del out[key]["bn"]
            else:
                out[key] = walk(value, s.get(key, {}))
        return out

    return {"params": walk(params, stats)}
