"""CRNN text recognizer as a Flax module.

Re-implements the reference Keras CRNN graph
(/root/reference/keras_ocr/recognition.py:187-350) TPU-first. Notable
semantics reproduced exactly (they are baked into the pretrained weights):

* Input (H=31, W=200, 1) is permuted to width-major and flipped along the
  original height axis (recognition.py:215-216) so the conv stack sees a
  (200, 31) "image".
* 7-conv stack with inline ReLU; BatchNorm (Keras defaults eps=1e-3) after
  convs 3, 5, 7; 2x2 max-pool after bn_3 and bn_5 (recognition.py:217-242).
* Spatial Transformer (recognition.py:54-166,243-281): localization net
  (conv16-5x5, conv32-5x5, flatten, dense64, dense6) predicts an affine
  map; the sampling grid uses ``0.5 * (g + 1) * size`` with indices
  clipped *before* the bilinear weights are computed — including the
  quirky zero-contribution at the right/bottom edges — reproduced
  literally.
* Reshape to (50, 3584), dense-128 ReLU, then two bidirectional LSTM
  stages where the backward pass output is *not* re-reversed: stage 1 sums
  forward + backward, stage 2 concatenates (recognition.py:292-319).
  LSTMs use Keras gate order [i, f, c~, o], sigmoid recurrent activation,
  tanh activation.
* Dropout, dense softmax over len(alphabet)+1 classes, and the first
  ``rnn_steps_to_discard=2`` frames dropped (recognition.py:321-328).

TPU mapping: the input projection ``x @ W`` of each LSTM is hoisted out of
the recurrence into one big (B*T, in) x (in, 4u) matmul on the MXU; only
the (u, 4u) recurrent matmul stays inside ``lax.scan``.
"""

from __future__ import annotations

import typing

import flax.linen as nn
import jax
import jax.numpy as jnp

DEFAULT_BUILD_PARAMS = {
    "height": 31,
    "width": 200,
    "color": False,
    "filters": (64, 128, 256, 256, 512, 512, 512),
    "rnn_units": (128, 128),
    "dropout": 0.25,
    "rnn_steps_to_discard": 2,
    "pool_size": 2,
    "stn": True,
}


class KerasLSTM(nn.Module):
    """LSTM with Keras weight layout/semantics, scanned over time.

    Weight layout matches Keras exactly for free weight conversion:
    ``kernel`` (in, 4u), ``recurrent_kernel`` (u, 4u), ``bias`` (4u,) with
    gate order [i, f, c~, o]; recurrent_activation=sigmoid, activation=tanh.
    ``reverse=True`` replicates ``go_backwards=True``: the input is
    processed back-to-front and the output is returned in processing order
    (NOT flipped back), as the reference consumes it
    (recognition.py:298-319).
    """

    units: int
    reverse: bool = False
    dtype: typing.Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        batch, time, features = x.shape
        kernel = self.param(
            "kernel", nn.initializers.glorot_uniform(), (features, 4 * self.units)
        ).astype(self.dtype)
        recurrent = self.param(
            "recurrent_kernel",
            nn.initializers.orthogonal(),
            (self.units, 4 * self.units),
        ).astype(self.dtype)
        bias = self.param("bias", nn.initializers.zeros, (4 * self.units,)).astype(
            self.dtype
        )

        inputs = x.astype(self.dtype)
        if self.reverse:
            inputs = inputs[:, ::-1, :]
        # Hoist the input projection out of the recurrence: one MXU matmul.
        projected = jnp.einsum("bti,iu->btu", inputs, kernel) + bias

        units = self.units

        def step(carry, z_t):
            h, c = carry
            z = z_t + h @ recurrent
            i = jax.nn.sigmoid(z[:, :units])
            f = jax.nn.sigmoid(z[:, units : 2 * units])
            c_tilde = jnp.tanh(z[:, 2 * units : 3 * units])
            o = jax.nn.sigmoid(z[:, 3 * units :])
            c_new = f * c + i * c_tilde
            h_new = o * jnp.tanh(c_new)
            return (h_new, c_new), h_new

        h0 = jnp.zeros((batch, units), dtype=self.dtype)
        c0 = jnp.zeros((batch, units), dtype=self.dtype)
        _, outputs = jax.lax.scan(
            step, (h0, c0), jnp.transpose(projected, (1, 0, 2))
        )
        return jnp.transpose(outputs, (1, 0, 2))


class LSTMParams(nn.Module):
    """Parameter container matching :class:`KerasLSTM`'s tree exactly.

    Lets the CRNN run both directions of a bidirectional pair in ONE
    fused ``lax.scan`` (see :func:`fused_bilstm`) while keeping the
    per-direction parameter paths (``lstm_10``, ``lstm_10_back``, ...)
    that the Keras ``.h5`` weight converter maps onto.
    """

    units: int

    @nn.compact
    def __call__(self, features: int):
        kernel = self.param(
            "kernel", nn.initializers.glorot_uniform(), (features, 4 * self.units)
        )
        recurrent = self.param(
            "recurrent_kernel",
            nn.initializers.orthogonal(),
            (self.units, 4 * self.units),
        )
        bias = self.param("bias", nn.initializers.zeros, (4 * self.units,))
        return kernel, recurrent, bias


def fused_bilstm(x, params_fwd, params_bwd, units, dtype):
    """Both directions of a Keras bidirectional LSTM in one scan.

    Four separate 50-step scans dominate the CRNN's TPU latency through
    per-step dispatch overhead; stacking the forward stream and the
    time-reversed backward stream into one scan halves the sequential
    step count at identical math (each stream keeps its own weights via
    a batched matmul over the stream axis).

    Matches :class:`KerasLSTM` semantics exactly: the backward stream
    processes the input back-to-front and its output stays in processing
    order (``go_backwards=True`` consumed as-is, recognition.py:298-319).

    Returns:
        (forward_outputs, backward_outputs), each (B, T, units).
    """
    kf, rf, bf = (p.astype(dtype) for p in params_fwd)
    kb, rb, bb = (p.astype(dtype) for p in params_bwd)
    inputs = x.astype(dtype)
    batch = inputs.shape[0]
    # Hoist both input projections out of the recurrence: one MXU matmul each.
    proj_f = jnp.einsum("bti,iu->btu", inputs, kf) + bf
    proj_b = jnp.einsum("bti,iu->btu", inputs[:, ::-1, :], kb) + bb
    proj = jnp.stack([proj_f, proj_b], axis=0)  # (2, B, T, 4u)
    recurrent = jnp.stack([rf, rb], axis=0)  # (2, u, 4u)

    def step(carry, z_t):
        h, c = carry  # (2, B, u)
        z = z_t + jnp.einsum("sbu,suv->sbv", h, recurrent)
        i = jax.nn.sigmoid(z[..., :units])
        f = jax.nn.sigmoid(z[..., units : 2 * units])
        c_tilde = jnp.tanh(z[..., 2 * units : 3 * units])
        o = jax.nn.sigmoid(z[..., 3 * units :])
        c_new = f * c + i * c_tilde
        h_new = o * jnp.tanh(c_new)
        return (h_new, c_new), h_new

    h0 = jnp.zeros((2, batch, units), dtype=dtype)
    _, outputs = jax.lax.scan(
        step, (h0, h0), jnp.transpose(proj, (2, 0, 1, 3))
    )  # outputs (T, 2, B, u)
    outputs = jnp.transpose(outputs, (1, 2, 0, 3))  # (2, B, T, u)
    return outputs[0], outputs[1]


class SpatialTransformer(nn.Module):
    """Affine STN with the reference's exact grid/sampling arithmetic.

    (/root/reference/keras_ocr/recognition.py:54-166,263-281.)
    """

    dtype: typing.Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        batch, height, width, channels = x.shape

        # Localization network (recognition.py:268-278).
        y = nn.Conv(16, (5, 5), padding="SAME", dtype=self.dtype, name="conv1")(x)
        y = nn.relu(y)
        y = nn.Conv(32, (5, 5), padding="SAME", dtype=self.dtype, name="conv2")(y)
        y = nn.relu(y)
        y = y.reshape((batch, -1))
        y = nn.Dense(64, dtype=self.dtype, name="dense1")(y)
        y = nn.relu(y)
        # Identity init (STN paper convention): zero kernel + identity
        # bias, so an untrained localization net passes features through
        # unchanged instead of warping them chaotically and stalling CTC
        # training. Deliberate init-only deviation from the reference's
        # default Dense init (recognition.py:277 uses glorot; loaded
        # pretrained weights override init either way).
        theta = nn.Dense(
            6,
            dtype=self.dtype,
            name="dense2",
            kernel_init=nn.initializers.zeros,
            bias_init=lambda key, shape, dtype=jnp.float32: jnp.asarray(
                [1.0, 0.0, 0.0, 0.0, 1.0, 0.0], dtype
            ),
        )(y)
        theta = theta.reshape((batch, 2, 3)).astype(jnp.float32)

        # Sampling grid in [-1, 1] (recognition.py:61-94). linspace matches
        # tf.linspace (endpoints included).
        x_lin = jnp.linspace(-1.0, 1.0, width)
        y_lin = jnp.linspace(-1.0, 1.0, height)
        x_grid, y_grid = jnp.meshgrid(x_lin, y_lin)
        ones = jnp.ones_like(x_grid)
        grid = jnp.stack(
            [x_grid.reshape(-1), y_grid.reshape(-1), ones.reshape(-1)], axis=0
        )  # (3, H*W)
        transformed = jnp.einsum("bij,jn->bin", theta, grid)  # (B, 2, H*W)
        sx = 0.5 * (transformed[:, 0, :] + 1.0) * width
        sy = 0.5 * (transformed[:, 1, :] + 1.0) * height

        # Bilinear sampling with clip-before-weights (recognition.py:112-160),
        # expressed as separable one-hot matmuls instead of 4-tap gathers:
        # XLA:TPU serializes dynamically-indexed gathers (~2.5 ms for 64
        # crops), while the (B, P, H) x (B, H, W*C) einsums ride the MXU.
        # The arithmetic is identical — each sample's two taps per axis land
        # as weights on a one-hot row, including the reference's quirky
        # zero-contribution at the right/bottom edges (when both clipped
        # taps coincide the weights sum to x1f - x0f = 0).
        x0 = jnp.floor(sx).astype(jnp.int32)
        y0 = jnp.floor(sy).astype(jnp.int32)
        x0c = jnp.clip(x0, 0, width - 1)
        x1c = jnp.clip(x0 + 1, 0, width - 1)
        y0c = jnp.clip(y0, 0, height - 1)
        y1c = jnp.clip(y0 + 1, 0, height - 1)

        def axis_weights(s, lo, hi, size):
            # (B, P, size): (hi_f - s) at index lo, (s - lo_f) at index hi.
            idx = jnp.arange(size, dtype=jnp.int32)[None, None, :]
            w_lo = (hi.astype(jnp.float32) - s)[..., None]
            w_hi = (s - lo.astype(jnp.float32))[..., None]
            return jnp.where(idx == lo[..., None], w_lo, 0.0) + jnp.where(
                idx == hi[..., None], w_hi, 0.0
            )

        w_x = axis_weights(sx, x0c, x1c, width)  # (B, P, W)
        w_y = axis_weights(sy, y0c, y1c, height)  # (B, P, H)
        feats = x.astype(jnp.float32)
        # precision=HIGHEST: the bilinear weights and features must multiply
        # in full fp32 even when the surrounding model computes in bf16 —
        # JAX's default TPU matmul precision would round the fp32 operands
        # to bf16 and drift from the reference's gather-based sampling.
        # Contract the larger spatial axis first so the (B, P, ·, C)
        # intermediate stays as small as possible (P = H*W; at CRNN shapes
        # ~ B x 350 x min(H,W) x 512 fp32 ≈ 2.9 MB per crop).
        if height >= width:
            t = jnp.einsum(
                "bph,bhwc->bpwc", w_y, feats, precision=jax.lax.Precision.HIGHEST
            )
            out = jnp.einsum(
                "bpw,bpwc->bpc", w_x, t, precision=jax.lax.Precision.HIGHEST
            )
        else:
            t = jnp.einsum(
                "bpw,bhwc->bphc", w_x, feats, precision=jax.lax.Precision.HIGHEST
            )
            out = jnp.einsum(
                "bph,bphc->bpc", w_y, t, precision=jax.lax.Precision.HIGHEST
            )
        return out.reshape((batch, height, width, channels)).astype(self.dtype)


class CRNN(nn.Module):
    """Full CRNN graph. ``__call__`` returns post-softmax frames with the
    first ``rnn_steps_to_discard`` dropped; ``backbone`` returns the
    pre-dropout biLSTM features (the reference's ``backbone`` model,
    recognition.py:320)."""

    alphabet_size: int = 36
    height: int = 31
    width: int = 200
    color: bool = False
    filters: typing.Tuple[int, ...] = (64, 128, 256, 256, 512, 512, 512)
    rnn_units: typing.Tuple[int, int] = (128, 128)
    dropout: float = 0.25
    rnn_steps_to_discard: int = 2
    pool_size: int = 2
    stn: bool = True
    dtype: typing.Any = jnp.float32

    def setup(self):
        assert len(self.filters) == 7, "7 CNN filters must be provided."
        assert len(self.rnn_units) == 2, "2 RNN filters must be provided."

    @nn.compact
    def __call__(
        self,
        x,
        train: bool = False,
        return_backbone: bool = False,
        return_logits: bool = False,
    ):
        x = x.astype(self.dtype)
        # Permute to width-major and flip the original height axis
        # (recognition.py:215-216).
        x = jnp.transpose(x, (0, 2, 1, 3))[:, :, ::-1, :]

        def conv(h, features, name):
            h = nn.Conv(features, (3, 3), padding="SAME", dtype=self.dtype, name=name)(h)
            return nn.relu(h)

        def bn(h, name):
            return nn.BatchNorm(
                use_running_average=not train,
                epsilon=1e-3,
                momentum=0.99,
                dtype=self.dtype,
                name=name,
            )(h)

        p = self.pool_size
        x = conv(x, self.filters[0], "conv_1")
        x = conv(x, self.filters[1], "conv_2")
        x = conv(x, self.filters[2], "conv_3")
        x = bn(x, "bn_3")
        x = nn.max_pool(x, (p, p), strides=(p, p), padding="VALID")
        x = conv(x, self.filters[3], "conv_4")
        x = conv(x, self.filters[4], "conv_5")
        x = bn(x, "bn_5")
        x = nn.max_pool(x, (p, p), strides=(p, p), padding="VALID")
        x = conv(x, self.filters[5], "conv_6")
        x = conv(x, self.filters[6], "conv_7")
        x = bn(x, "bn_7")

        if self.stn:
            x = SpatialTransformer(dtype=self.dtype, name="stn")(x)

        time = self.width // p**2
        x = x.reshape((x.shape[0], time, (self.height // p**2) * self.filters[-1]))

        x = nn.Dense(self.rnn_units[0], dtype=self.dtype, name="fc_9")(x)
        x = nn.relu(x)

        u1, u2 = self.rnn_units
        fwd1, bwd1 = fused_bilstm(
            x,
            LSTMParams(u1, name="lstm_10")(x.shape[-1]),
            LSTMParams(u1, name="lstm_10_back")(x.shape[-1]),
            u1,
            self.dtype,
        )
        x = fwd1 + bwd1
        fwd2, bwd2 = fused_bilstm(
            x,
            LSTMParams(u2, name="lstm_11")(x.shape[-1]),
            LSTMParams(u2, name="lstm_11_back")(x.shape[-1]),
            u2,
            self.dtype,
        )
        features = jnp.concatenate([fwd2, bwd2], axis=-1)
        if return_backbone:
            return features.astype(jnp.float32)

        x = nn.Dropout(self.dropout, deterministic=not train)(features)
        x = nn.Dense(self.alphabet_size + 1, dtype=self.dtype, name="fc_12")(x)
        x = x.astype(jnp.float32)
        if not return_logits:
            x = jax.nn.softmax(x, axis=-1)
        return x[:, self.rnn_steps_to_discard :]
