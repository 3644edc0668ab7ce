"""On-device image ops: normalization, bilinear resize, padding.

Replaces the host-side NumPy/TF image plumbing of the reference:
``compute_input`` ImageNet normalization
(/root/reference/keras_ocr/detection.py:34-52) and the ``UpsampleLike``
bilinear resize with ``half_pixel_centers=True``
(/root/reference/keras_ocr/detection.py:290-309). Everything here is
jittable and intended to live inside the fused pipeline graph so images
cross the host↔device boundary exactly once.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_VARIANCE = (0.229, 0.224, 0.225)


def compute_input(image: jnp.ndarray) -> jnp.ndarray:
    """ImageNet mean/variance normalization of RGB images in [0, 255].

    Parity with /root/reference/keras_ocr/detection.py:34-42.
    """
    image = image.astype(jnp.float32)
    mean = jnp.asarray(IMAGENET_MEAN, dtype=jnp.float32) * 255.0
    variance = jnp.asarray(IMAGENET_VARIANCE, dtype=jnp.float32) * 255.0
    return (image - mean) / variance


def invert_input(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`compute_input` back to uint8 RGB.

    Parity with /root/reference/keras_ocr/detection.py:45-52.
    """
    mean = jnp.asarray(IMAGENET_MEAN, dtype=jnp.float32) * 255.0
    variance = jnp.asarray(IMAGENET_VARIANCE, dtype=jnp.float32) * 255.0
    return jnp.clip(x * variance + mean, 0, 255).astype(jnp.uint8)


def resize_bilinear(x: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """Bilinear resize with half-pixel centers on an NHWC batch.

    Matches ``tf.compat.v1.image.resize_bilinear(half_pixel_centers=True)``
    used by the reference's ``UpsampleLike``
    (/root/reference/keras_ocr/detection.py:301-303) and torch
    ``interpolate(mode="bilinear", align_corners=False)``. Implemented as
    two dense (out x in) interpolation matmuls so the op runs on the MXU
    instead of gather units — for the U-decoder's 2x upsamples the
    matrices are tiny and XLA folds them into the surrounding convs.
    """
    batch, in_h, in_w, channels = x.shape
    if height == 2 * in_h and width == 2 * in_w:
        # Integer 2x upscale (the Pipeline's scale=2 hot path): fixed
        # 0.75/0.25 two-tap kernel, pure VPU elementwise — over an order
        # of magnitude faster than the general interpolation matmuls.
        return _upscale2x(x)
    # HIGHEST precision keeps fp32 parity on TPU (the default matmul
    # precision truncates to bf16); only meaningful for fp32 inputs.
    precision = (
        jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else None
    )
    out = jnp.einsum(
        "oh,bhwc->bowc",
        _interp_matrix(in_h, height, x.dtype),
        x,
        precision=precision,
    )
    out = jnp.einsum(
        "ow,bhwc->bhoc",
        _interp_matrix(in_w, width, x.dtype),
        out,
        precision=precision,
    )
    return out


def _upscale2x(x: jnp.ndarray) -> jnp.ndarray:
    """Exact 2x half-pixel-centers bilinear upsample of an NHWC batch.

    out[2i] = 0.25*in[i-1] + 0.75*in[i]; out[2i+1] = 0.75*in[i] +
    0.25*in[i+1] (edge-clamped) per axis — identical to the general matrix
    path for scale 2.
    """
    def axis_up(v, axis):
        lo = jnp.concatenate(
            [jax.lax.slice_in_dim(v, 0, 1, axis=axis),
             jax.lax.slice_in_dim(v, 0, v.shape[axis] - 1, axis=axis)],
            axis=axis,
        )
        hi = jnp.concatenate(
            [jax.lax.slice_in_dim(v, 1, v.shape[axis], axis=axis),
             jax.lax.slice_in_dim(v, v.shape[axis] - 1, v.shape[axis], axis=axis)],
            axis=axis,
        )
        even = 0.25 * lo + 0.75 * v
        odd = 0.75 * v + 0.25 * hi
        stacked = jnp.stack([even, odd], axis=axis + 1)
        new_shape = list(v.shape)
        new_shape[axis] = v.shape[axis] * 2
        return stacked.reshape(new_shape)

    return axis_up(axis_up(x, 1), 2)


def _interp_matrix(in_size: int, out_size: int, dtype) -> jnp.ndarray:
    """(out_size, in_size) half-pixel-centers bilinear interpolation weights.

    Built scatter-free (dense iota comparisons) so XLA lowers it to cheap
    fusable vector ops instead of serialized scatters.
    """
    scale = in_size / out_size
    centers = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) * scale - 0.5
    centers = jnp.clip(centers, 0.0, in_size - 1)
    lo = jnp.floor(centers).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, in_size - 1)
    frac = centers - lo
    cols = jnp.arange(in_size, dtype=jnp.int32)[None, :]
    mat = jnp.where(cols == lo[:, None], (1.0 - frac)[:, None], 0.0)
    mat = mat + jnp.where(cols == hi[:, None], frac[:, None], 0.0)
    return mat.astype(dtype)


def upsample_like(source: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Resize ``source`` (NHWC) to the spatial shape of ``target``.

    The reference's ``UpsampleLike`` layer
    (/root/reference/keras_ocr/detection.py:290-309).
    """
    return resize_bilinear(source, target.shape[1], target.shape[2])


def rgb_to_grayscale(image: jnp.ndarray) -> jnp.ndarray:
    """ITU-R 601 luma, bit-exact with ``cv2.cvtColor(RGB2GRAY)`` on
    uint8-valued inputs.

    Used for recognizer input prep (the reference converts crops on host at
    /root/reference/keras_ocr/recognition.py:429-436,508-510). OpenCV's
    fixed-point ``(9798*R + 19235*G + 3735*B + 2**14) >> 15`` is reproduced
    in fp32: the accumulator stays below 2**24 (max 255*32768 + 2**14) so
    every intermediate is an exact integer, and the final divide is by a
    power of two (exponent shift), so ``floor`` lands exactly where the
    integer shift does.
    """
    weights = jnp.asarray([9798.0, 19235.0, 3735.0], dtype=jnp.float32)
    acc = jnp.tensordot(image.astype(jnp.float32), weights, axes=[[-1], [0]])
    return jnp.floor((acc + 16384.0) * (1.0 / 32768.0))
