"""Pallas fused 3x3 conv (+bias+ReLU) for the CRAFT/CRNN early layers.

XLA:TPU's conv lowering reaches only ~14% MXU on the VGG early shapes
(large spatial, 64 channels): conv1_2 at 960x1280x64->64 costs 3.3 ms for
90.6 GFLOP. This kernel tiles the image into full-width row strips, DMAs
each strip + 1-row halo into VMEM, builds the im2col patch matrix
on-chip, and runs one (strip_pixels, 9*Cin) x (9*Cin, Cout) MXU matmul
with f32 accumulation, fusing bias and ReLU into the epilogue — one HBM
read of the input and one write of the output in total.

Constraints (asserted): stride 1, SAME zero padding, NHWC, single image
per call (vmap for batches). The wrapper pads H/W and Cin/Cout are used
as-is — best suited to Cin in {16..256}; at larger channel counts XLA's
own lowering is already near 50% MXU and this kernel is not needed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_hbm, w_ref, b_ref, out_ref, x_tile, sem, *, tile_h, width, cin, cout, relu):
    i = pl.program_id(0)
    copy = pltpu.make_async_copy(
        x_hbm.at[pl.ds(i * tile_h, tile_h + 2)], x_tile, sem
    )
    copy.start()
    copy.wait()
    columns = []
    for dy in range(3):
        for dx in range(3):
            piece = x_tile[dy : dy + tile_h, dx : dx + width, :cin]
            columns.append(piece.reshape(tile_h * width, cin))
    patches = jnp.concatenate(columns, axis=1)  # (tile_h*W, 9*Cin)
    acc = jnp.dot(patches, w_ref[:], preferred_element_type=jnp.float32)
    acc = acc + b_ref[:].astype(jnp.float32)
    if relu:
        acc = jnp.maximum(acc, 0.0)
    out_ref[:] = acc.reshape(tile_h, width, cout).astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("tile_h", "relu", "interpret", "out_dtype")
)
def conv3x3_bias_act(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray,
    tile_h: int = 8,
    relu: bool = True,
    interpret: bool = False,
    out_dtype=None,
):
    """Fused 3x3 SAME conv + bias (+ReLU) on one NHWC image.

    Args:
        x: (H, W, Cin) input.
        w: (3, 3, Cin, Cout) HWIO kernel.
        b: (Cout,) bias (fold BatchNorm scale/shift in here for inference).
        tile_h: rows per strip; H is padded up to a multiple.

    Returns:
        (H, W, Cout) in ``out_dtype`` (default: x.dtype).
    """
    height, width, cin = x.shape
    cout = w.shape[-1]
    out_dtype = out_dtype or x.dtype
    pad_h = -height % tile_h
    # SAME zero padding plus bottom padding to a strip multiple. Mosaic
    # DMA slices must cover full (8, 128)-aligned minor tiles: the strip
    # width (second-to-last dim) is padded to a multiple of 8 and the
    # channel (lane) dim to a multiple of 128 — lane padding costs no real
    # HBM traffic since storage is lane-padded regardless.
    pad_w = -(width + 2) % 8
    pad_c = -cin % 128
    xp = jnp.pad(x, ((1, 1 + pad_h), (1, 1 + pad_w), (0, pad_c)))
    padded_h = height + pad_h
    strip_w = width + 2 + pad_w
    strip_c = cin + pad_c
    wmat = w.reshape(9 * cin, cout).astype(x.dtype)
    brow = b.reshape(1, cout)

    kernel = functools.partial(
        _kernel, tile_h=tile_h, width=width, cin=cin, cout=cout, relu=relu
    )
    out = pl.pallas_call(
        kernel,
        grid=(padded_h // tile_h,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile_h, width, cout), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((padded_h, width, cout), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((tile_h + 2, strip_w, strip_c), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(xp, wmat, brow)
    return out[:height]
