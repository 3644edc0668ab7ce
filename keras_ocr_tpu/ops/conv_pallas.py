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


def _round_up(value: int, multiple: int) -> int:
    return -(-value // multiple) * multiple


def _static_roll(x, shift, axis):
    """jnp.roll with static shift, avoiding the zero-size slices jnp.roll
    emits for shift 0 (Mosaic rejects zero-size vectors)."""
    if shift == 0:
        return x
    size = x.shape[axis]
    shift = shift % size
    lo = jax.lax.slice_in_dim(x, size - shift, size, axis=axis)
    hi = jax.lax.slice_in_dim(x, 0, size - shift, axis=axis)
    return jax.lax.concatenate([lo, hi], dimension=axis)


def _chain_kernel(
    *refs,
    tile_h,
    halo,
    height,
    width,
    specs,  # tuple of (ksize, cin, cout, relu)
    pool,
    tap,
    out_dtype,
    buf_dtype,
):
    """One row-strip through the whole conv chain, entirely in VMEM.

    Coordinate system is FIXED across stages: buffer position (r, c) of
    strip ``i`` is global pixel (i*tile_h - halo + r, c - halo). Each 3x3
    conv is center-aligned (reads neighbors via lane/sublane rolls), so
    the valid window shrinks by one ring per conv — the DMA'd halo pays
    for it. Positions outside the real image are re-zeroed after every
    intermediate conv so SAME zero-padding semantics hold at image edges;
    roll wrap-around only corrupts rings that are already outside the
    remaining valid window.
    """
    num_convs = len(specs)
    x_hbm = refs[0]
    wrefs = refs[1 : 1 + 2 * num_convs]
    num_outs = 2 if tap else 1
    outs = refs[1 + 2 * num_convs : 1 + 2 * num_convs + num_outs]
    bufs = refs[1 + 2 * num_convs + num_outs : -1]
    sem = refs[-1]

    i = pl.program_id(0)
    strip_h = tile_h + 2 * halo
    copy = pltpu.make_async_copy(
        x_hbm.at[pl.ds(i * tile_h, strip_h)], bufs[0], sem
    )
    copy.start()
    copy.wait()

    strip_w = bufs[0].shape[1]
    # Inside-image mask (same for every stage; coordinates never shift).
    # Built as 3-D iota: Mosaic can't insert a minor dim on i1 vectors.
    row_idx = jax.lax.broadcasted_iota(jnp.int32, (strip_h, strip_w, 1), 0)
    col_idx = jax.lax.broadcasted_iota(jnp.int32, (strip_h, strip_w, 1), 1)
    grow = row_idx + (i * tile_h - halo)
    gcol = col_idx - halo
    inside = (grow >= 0) & (grow < height) & (gcol >= 0) & (gcol < width)

    y = None
    for j, (ksize, cin, cout, relu) in enumerate(specs):
        w_ref, b_ref = wrefs[2 * j], wrefs[2 * j + 1]
        src = bufs[j]
        x = src[:, :, :cin] if src.shape[-1] != cin else src[:]
        flat = (strip_h * strip_w, cin)
        if ksize == 3:
            acc = None
            for dy in range(3):
                # Static-shift rolls lower to slice+concat (Mosaic's
                # tpu.dynamic_rotate only handles 32-bit data); wrapped
                # rings are outside the valid window by construction.
                rows = _static_roll(x, 1 - dy, axis=0)
                pieces = jnp.concatenate(
                    [_static_roll(rows, 1 - dx, axis=1) for dx in range(3)],
                    axis=-1,
                ).reshape(strip_h * strip_w, 3 * cin)
                part = jnp.dot(
                    pieces, w_ref[dy], preferred_element_type=jnp.float32
                )
                acc = part if acc is None else acc + part
        else:  # 1x1 conv: plain matmul, consumes no halo.
            acc = jnp.dot(
                x.reshape(flat), w_ref[0], preferred_element_type=jnp.float32
            )
        acc = acc + b_ref[:].astype(jnp.float32)
        if relu:
            acc = jnp.maximum(acc, 0.0)
        y = acc.reshape(strip_h, strip_w, cout)
        if j < num_convs - 1:
            y = jnp.where(inside, y, 0.0).astype(buf_dtype)
            dst = bufs[j + 1]
            if dst.shape[-1] != cout:
                dst[:, :, :cout] = y
            else:
                dst[:] = y

    valid = y[halo : halo + tile_h, halo : halo + width, :]
    if tap:
        outs[1][:] = valid.astype(out_dtype)
    if pool:
        cout = specs[-1][2]
        pooled = jnp.max(
            valid.reshape(tile_h // 2, 2, width // 2, 2, cout), axis=(1, 3)
        )
        outs[0][:] = pooled.astype(out_dtype)
    else:
        outs[0][:] = valid.astype(out_dtype)


def conv_chain(
    x: jnp.ndarray,
    convs,
    pool: bool = False,
    tap_prepool: bool = False,
    tile_h: int = 16,
    interpret: bool = False,
    out_dtype=None,
):
    """Fused chain of convs (+bias+ReLU each) with optional 2x2/2 max-pool.

    The whole chain runs strip-by-strip in VMEM: ONE HBM read of the input
    and ONE write of the (possibly pooled) output — intermediate
    activations never touch HBM. This is the inference engine for the
    VGG blocks of CRAFT (/root/reference/keras_ocr/detection.py:312-335,
    whose conv-BN-ReLU blocks fold into conv+bias at inference) and the
    CRNN conv stack.

    Args:
        x: (H, W, Cin) NHWC image (vmap over batch).
        convs: sequence of (w, b, relu) with w of shape (k, k, Cin, Cout),
            k in {1, 3}, b of shape (Cout,). BatchNorm must already be
            folded into (w, b).
        pool: append a 2x2 stride-2 VALID max-pool (H and W must be even).
        tap_prepool: also return the last conv's pre-pool activation
            (CRAFT taps s1 before the pool, detection.py:327-335).
        tile_h: rows of output computed per grid step. Larger amortizes
            the 2*halo recompute overhead; bounded by VMEM.

    Returns:
        (H//2, W//2, Cout) if pool else (H, W, Cout); with ``tap_prepool``
        a tuple (pooled, prepool).
    """
    height, width, cin0 = x.shape
    out_dtype = out_dtype or x.dtype
    specs = []
    wmats, brows = [], []
    for w, b, relu in convs:
        k = int(w.shape[0])
        assert k in (1, 3) and w.shape[1] == k, w.shape
        cin, cout = int(w.shape[2]), int(w.shape[3])
        specs.append((k, cin, cout, bool(relu)))
        if k == 3:
            # (3, 3, Cin, Cout) -> (3, 3*Cin, Cout); per-dy matrices whose
            # rows are dx-major to match the lane-concat of shifted taps.
            wmats.append(w.transpose(0, 1, 2, 3).reshape(3, 3 * cin, cout).astype(x.dtype))
        else:
            wmats.append(w.reshape(1, cin, cout).astype(x.dtype))
        brows.append(b.reshape(1, cout).astype(jnp.float32))
    specs = tuple(specs)
    halo = sum((k - 1) // 2 for k, _, _, _ in specs)
    assert halo >= 1 or not pool, "pure-1x1 chains with pool unsupported"
    if pool:
        assert height % 2 == 0 and width % 2 == 0, (height, width)
        assert tile_h % 2 == 0, tile_h

    tiled_h = _round_up(height, tile_h)
    strip_w = _round_up(width + 2 * halo, 8)
    dma_c = _round_up(cin0, 128)
    xp = jnp.pad(
        x,
        (
            (halo, halo + (tiled_h - height)),
            (halo, strip_w - width - halo),
            (0, dma_c - cin0),
        ),
    )

    cout_last = specs[-1][2]
    out_shapes = [
        jax.ShapeDtypeStruct(
            (tiled_h // 2, width // 2, cout_last)
            if pool
            else (tiled_h, width, cout_last),
            out_dtype,
        )
    ]
    out_specs = [
        pl.BlockSpec(
            (tile_h // 2, width // 2, cout_last) if pool else (tile_h, width, cout_last),
            lambda i: (i, 0, 0),
            memory_space=pltpu.VMEM,
        )
    ]
    if tap_prepool:
        out_shapes.append(
            jax.ShapeDtypeStruct((tiled_h, width, cout_last), out_dtype)
        )
        out_specs.append(
            pl.BlockSpec(
                (tile_h, width, cout_last),
                lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )

    strip_h = tile_h + 2 * halo
    scratch = [pltpu.VMEM((strip_h, strip_w, dma_c), x.dtype)]
    for _, _, cout, _ in specs[:-1]:
        scratch.append(pltpu.VMEM((strip_h, strip_w, cout), x.dtype))
    scratch.append(pltpu.SemaphoreType.DMA(()))

    kernel = functools.partial(
        _chain_kernel,
        tile_h=tile_h,
        halo=halo,
        height=height,
        width=width,
        specs=specs,
        pool=pool,
        tap=tap_prepool,
        out_dtype=out_dtype,
        buf_dtype=x.dtype,
    )
    weight_args = []
    for wm, br in zip(wmats, brows):
        weight_args.extend([wm, br])
    outs = pl.pallas_call(
        kernel,
        grid=(tiled_h // tile_h,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(weight_args),
        out_specs=out_specs if len(out_specs) > 1 else out_specs[0],
        out_shape=out_shapes if len(out_shapes) > 1 else out_shapes[0],
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024
        ),
        interpret=interpret,
    )(xp, *weight_args)
    if not isinstance(outs, (list, tuple)):
        outs = [outs]
    main = outs[0][: height // 2] if pool else outs[0][:height]
    if tap_prepool:
        return main, outs[1][:height]
    return main


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
