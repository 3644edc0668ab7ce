"""EfficientNet B0-B7 backbone for the CRAFT detector.

The reference optionally swaps VGG16-BN for EfficientNet via the
``efficientnet.tfkeras`` package, tapping the four
``block{2,3,4,5}a_expand_activation`` feature maps
(/root/reference/keras_ocr/detection.py:338-350) — i.e. the output of the
1x1 expansion conv + BN + swish of the first block of stages 2-5, at
H/2, H/4, H/8 and H/16 resolution (matching the VGG taps). This is a
from-scratch Flax implementation of the same architecture (MBConv with
squeeze-excite, swish, width/depth scaling, filters rounded to multiples
of 8). BatchNorm epsilon follows the TF implementation (1e-3). ImageNet
initialization is available through
:mod:`keras_ocr_tpu.weights.efficientnet` (the reference's
``weights="imagenet"`` backbone build, detection.py:338-341); pretrained
CRAFT *inference* weights remain VGG-only like the reference
(detection.py:681).
"""

from __future__ import annotations

import math
import typing

import flax.linen as nn
import jax.numpy as jnp

# (width_multiplier, depth_multiplier) per variant.
SCALING = {
    "efficientnetb0": (1.0, 1.0),
    "efficientnetb1": (1.0, 1.1),
    "efficientnetb2": (1.1, 1.2),
    "efficientnetb3": (1.2, 1.4),
    "efficientnetb4": (1.4, 1.8),
    "efficientnetb5": (1.6, 2.2),
    "efficientnetb6": (1.8, 2.6),
    "efficientnetb7": (2.0, 3.1),
}

# (kernel, stride, expand_ratio, filters, repeats) for B0's seven stages.
BASE_STAGES = (
    (3, 1, 1, 16, 1),
    (3, 2, 6, 24, 2),
    (5, 2, 6, 40, 2),
    (3, 2, 6, 80, 3),
    (5, 1, 6, 112, 3),
    (5, 2, 6, 192, 4),
    (3, 1, 6, 320, 1),
)


def round_filters(filters: int, width: float, divisor: int = 8) -> int:
    filters *= width
    new_filters = max(divisor, int(filters + divisor / 2) // divisor * divisor)
    if new_filters < 0.9 * filters:
        new_filters += divisor
    return int(new_filters)


def round_repeats(repeats: int, depth: float) -> int:
    return int(math.ceil(depth * repeats))


class ConvBNSwish(nn.Module):
    features: int
    kernel: int
    stride: int = 1
    groups: int = 1
    dtype: typing.Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding="SAME",
            feature_group_count=self.groups,
            use_bias=False,
            dtype=self.dtype,
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, epsilon=1e-3, dtype=self.dtype
        )(x)
        return nn.swish(x)


class MBConv(nn.Module):
    """Mobile inverted bottleneck with squeeze-excitation."""

    filters_out: int
    kernel: int
    stride: int
    expand_ratio: int
    se_ratio: float = 0.25
    dtype: typing.Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, return_expand: bool = False):
        inputs = x
        channels = x.shape[-1]
        expanded = channels * self.expand_ratio
        if self.expand_ratio != 1:
            x = nn.Conv(
                expanded, (1, 1), use_bias=False, dtype=self.dtype, name="expand_conv"
            )(x)
            x = nn.BatchNorm(use_running_average=not train, epsilon=1e-3, dtype=self.dtype, name="expand_bn")(x)
            x = nn.swish(x)
        expand_activation = x
        if return_expand:
            return expand_activation
        # Depthwise
        x = nn.Conv(
            expanded,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding="SAME",
            feature_group_count=expanded,
            use_bias=False,
            dtype=self.dtype,
            name="dwconv",
        )(x)
        x = nn.BatchNorm(use_running_average=not train, epsilon=1e-3, dtype=self.dtype, name="dw_bn")(x)
        x = nn.swish(x)
        # Squeeze-excite
        se_channels = max(1, int(channels * self.se_ratio))
        se = jnp.mean(x, axis=(1, 2), keepdims=True)
        se = nn.Conv(se_channels, (1, 1), dtype=self.dtype, name="se_reduce")(se)
        se = nn.swish(se)
        se = nn.Conv(expanded, (1, 1), dtype=self.dtype, name="se_expand")(se)
        x = x * nn.sigmoid(se)
        # Project
        x = nn.Conv(
            self.filters_out, (1, 1), use_bias=False, dtype=self.dtype, name="project_conv"
        )(x)
        x = nn.BatchNorm(use_running_average=not train, epsilon=1e-3, dtype=self.dtype, name="project_bn")(x)
        if self.stride == 1 and channels == self.filters_out:
            x = x + inputs
        return x


class EfficientNetBackbone(nn.Module):
    """EfficientNet emitting the four CRAFT skip taps (expand activations
    of the first blocks of stages 2-5)."""

    model_name: str = "efficientnetb0"
    dtype: typing.Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        width, depth = SCALING[self.model_name.lower()]
        x = ConvBNSwish(
            round_filters(32, width), kernel=3, stride=2, dtype=self.dtype, name="stem"
        )(x, train=train)
        taps = []
        for stage_index, (kernel, stride, expand, filters, repeats) in enumerate(
            BASE_STAGES, start=1
        ):
            filters_out = round_filters(filters, width)
            for block_index in range(round_repeats(repeats, depth)):
                block_stride = stride if block_index == 0 else 1
                block = MBConv(
                    filters_out=filters_out,
                    kernel=kernel,
                    stride=block_stride,
                    expand_ratio=expand,
                    dtype=self.dtype,
                    name=f"block{stage_index}{chr(ord('a') + block_index)}",
                )
                if block_index == 0 and stage_index in (2, 3, 4, 5):
                    # Tap the expand activation BEFORE the strided depthwise
                    # (block{n}a_expand_activation semantics).
                    taps.append(block(x, train=train, return_expand=True))
                x = block(x, train=train)
            if stage_index == 5:
                break  # deeper stages unused by the CRAFT decoder
        s1, s2, s3, s4 = taps
        return s1, s2, s3, s4
