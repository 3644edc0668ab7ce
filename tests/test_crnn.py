"""CRNN Flax model: shape checks + numerical parity vs torch twins.

Validates the Keras-semantics pieces that matter for loading the published
weights: LSTM gate order/activations (vs torch.nn.LSTM with zeroed b_hh),
the un-reversed go_backwards output, the STN grid arithmetic, and the full
graph against an independently written functional torch twin.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy; `make test-all` / nightly CI

import jax
import jax.numpy as jnp

from keras_ocr_tpu.models.crnn import CRNN, KerasLSTM

torch = pytest.importorskip("torch")
F = torch.nn.functional


def test_keras_lstm_matches_torch():
    rng = np.random.RandomState(0)
    B, T, I, U = 3, 7, 5, 4
    x = rng.randn(B, T, I).astype("float32")
    model = KerasLSTM(units=U)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = variables["params"]
    ours = np.asarray(model.apply(variables, jnp.asarray(x)))

    lstm = torch.nn.LSTM(I, U, batch_first=True)
    with torch.no_grad():
        lstm.weight_ih_l0.copy_(torch.tensor(np.asarray(params["kernel"]).T))
        lstm.weight_hh_l0.copy_(torch.tensor(np.asarray(params["recurrent_kernel"]).T))
        lstm.bias_ih_l0.copy_(torch.tensor(np.asarray(params["bias"])))
        lstm.bias_hh_l0.zero_()
        theirs = lstm(torch.tensor(x))[0].numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5, rtol=1e-5)


def test_keras_lstm_reverse_not_reflipped():
    """go_backwards: output[t] corresponds to input[T-1-t], NOT re-reversed."""
    rng = np.random.RandomState(1)
    B, T, I, U = 2, 6, 4, 3
    x = rng.randn(B, T, I).astype("float32")
    model_fwd = KerasLSTM(units=U)
    variables = model_fwd.init(jax.random.PRNGKey(0), jnp.asarray(x))
    model_rev = KerasLSTM(units=U, reverse=True)
    fwd_on_flipped = np.asarray(model_fwd.apply(variables, jnp.asarray(x[:, ::-1])))
    rev = np.asarray(model_rev.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(rev, fwd_on_flipped, atol=1e-6)


def _torch_stn_transform(x_nhwc, theta):
    """Literal reference STN sampling (recognition.py:73-166) in torch."""
    B, H, W, C = x_nhwc.shape
    x_lin = torch.linspace(-1, 1, W)
    y_lin = torch.linspace(-1, 1, H)
    yg, xg = torch.meshgrid(y_lin, x_lin, indexing="ij")
    grid = torch.stack([xg.reshape(-1), yg.reshape(-1), torch.ones(H * W)], dim=0)
    tg = torch.einsum("bij,jn->bin", theta, grid)
    sx = 0.5 * (tg[:, 0] + 1.0) * W
    sy = 0.5 * (tg[:, 1] + 1.0) * H
    x0 = torch.clamp(torch.floor(sx).long(), 0, W - 1)
    x1 = torch.clamp(torch.floor(sx).long() + 1, 0, W - 1)
    y0 = torch.clamp(torch.floor(sy).long(), 0, H - 1)
    y1 = torch.clamp(torch.floor(sy).long() + 1, 0, H - 1)
    flat = x_nhwc.reshape(B, H * W, C)

    def gather(yy, xx):
        idx = (yy * W + xx).unsqueeze(-1).expand(-1, -1, C)
        return torch.gather(flat, 1, idx)

    va, vb = gather(y0, x0), gather(y1, x0)
    vc, vd = gather(y0, x1), gather(y1, x1)
    x0f, x1f, y0f, y1f = x0.float(), x1.float(), y0.float(), y1.float()
    wa = ((x1f - sx) * (y1f - sy)).unsqueeze(-1)
    wb = ((x1f - sx) * (sy - y0f)).unsqueeze(-1)
    wc = ((sx - x0f) * (y1f - sy)).unsqueeze(-1)
    wd = ((sx - x0f) * (sy - y0f)).unsqueeze(-1)
    return (wa * va + wb * vb + wc * vc + wd * vd).reshape(B, H, W, C)


def _torch_crnn_forward(params, stats, x_bhwc, alphabet_size):
    """Functional torch twin of the CRNN graph (independent implementation)."""

    def conv(h, name, pad):
        w = torch.tensor(np.asarray(params[name]["kernel"]).transpose(3, 2, 0, 1))
        b = torch.tensor(np.asarray(params[name]["bias"]))
        return F.conv2d(h, w, b, padding=pad)

    def bn(h, name):
        return F.batch_norm(
            h,
            torch.tensor(np.asarray(stats[name]["mean"])),
            torch.tensor(np.asarray(stats[name]["var"])),
            torch.tensor(np.asarray(params[name]["scale"])),
            torch.tensor(np.asarray(params[name]["bias"])),
            training=False,
            eps=1e-3,
        )

    def dense(h, name):
        w = torch.tensor(np.asarray(params[name]["kernel"]))
        b = torch.tensor(np.asarray(params[name]["bias"]))
        return h @ w + b

    def lstm(h, name, reverse=False):
        p = params[name]
        cell = torch.nn.LSTM(h.shape[-1], p["recurrent_kernel"].shape[0], batch_first=True)
        with torch.no_grad():
            cell.weight_ih_l0.copy_(torch.tensor(np.asarray(p["kernel"]).T))
            cell.weight_hh_l0.copy_(torch.tensor(np.asarray(p["recurrent_kernel"]).T))
            cell.bias_ih_l0.copy_(torch.tensor(np.asarray(p["bias"])))
            cell.bias_hh_l0.zero_()
        inp = torch.flip(h, dims=[1]) if reverse else h
        return cell(inp)[0]

    x = torch.tensor(x_bhwc).permute(0, 2, 1, 3)  # (B, W, H, C)
    x = torch.flip(x, dims=[2])
    x = x.permute(0, 3, 1, 2)  # NCHW, "H"=200, "W"=31
    x = F.relu(conv(x, "conv_1", 1))
    x = F.relu(conv(x, "conv_2", 1))
    x = F.relu(conv(x, "conv_3", 1))
    x = bn(x, "bn_3")
    x = F.max_pool2d(x, 2, 2)
    x = F.relu(conv(x, "conv_4", 1))
    x = F.relu(conv(x, "conv_5", 1))
    x = bn(x, "bn_5")
    x = F.max_pool2d(x, 2, 2)
    x = F.relu(conv(x, "conv_6", 1))
    x = F.relu(conv(x, "conv_7", 1))
    x = bn(x, "bn_7")

    # STN
    h = F.relu(conv(x, "stn/conv1", 2))
    h = F.relu(conv(h, "stn/conv2", 2))
    h = h.permute(0, 2, 3, 1).reshape(h.shape[0], -1)
    h = F.relu(dense(h, "stn/dense1"))
    theta = dense(h, "stn/dense2").reshape(-1, 2, 3)
    x = x.permute(0, 2, 3, 1)  # NHWC (B, 50, 7, 512)
    x = _torch_stn_transform(x, theta)

    x = x.reshape(x.shape[0], x.shape[1], -1)  # (B, 50, 3584)
    x = F.relu(dense(x, "fc_9"))
    r1 = lstm(x, "lstm_10") + lstm(x, "lstm_10_back", reverse=True)
    r2 = torch.cat([lstm(r1, "lstm_11"), lstm(r1, "lstm_11_back", reverse=True)], dim=-1)
    y = dense(r2, "fc_12")
    y = torch.softmax(y, dim=-1)
    return y[:, 2:]


def _flat_params(tree, prefix=""):
    out = {}
    for key, value in tree.items():
        path = f"{prefix}/{key}" if prefix else key
        if isinstance(value, dict) and not {"kernel", "scale", "mean"} & set(value):
            out.update(_flat_params(value, path))
        else:
            out[path] = value
    return out


def test_crnn_output_shape():
    model = CRNN(alphabet_size=36)
    x = jnp.zeros((2, 31, 200, 1))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    y = model.apply(variables, x, train=False)
    assert y.shape == (2, 48, 37)
    np.testing.assert_allclose(np.asarray(y.sum(axis=-1)), 1.0, rtol=1e-5)
    features = model.apply(variables, x, train=False, return_backbone=True)
    assert features.shape == (2, 50, 256)


def test_crnn_parity_with_torch_twin():
    model = CRNN(alphabet_size=36)
    rng = np.random.RandomState(5)
    x = (rng.rand(2, 31, 200, 1) > 0.5).astype("float32")
    variables = model.init(jax.random.PRNGKey(1), jnp.asarray(x), train=False)
    # Randomize batch stats to exercise BN.
    stats = jax.tree.map(
        lambda a: jnp.asarray(rng.uniform(0.5, 1.5, a.shape).astype("float32")),
        variables["batch_stats"],
    )
    variables = {"params": variables["params"], "batch_stats": stats}
    ours = np.asarray(model.apply(variables, jnp.asarray(x), train=False))
    with torch.no_grad():
        theirs = _torch_crnn_forward(
            _flat_params(variables["params"]),
            _flat_params(variables["batch_stats"]),
            x,
            36,
        ).numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-4, rtol=1e-3)


def test_crnn_no_stn_variant():
    model = CRNN(alphabet_size=10, stn=False)
    x = jnp.zeros((1, 31, 200, 1))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    y = model.apply(variables, x, train=False)
    assert y.shape == (1, 48, 11)


def test_crnn_dropout_train_mode():
    model = CRNN(alphabet_size=10)
    x = jnp.ones((1, 31, 200, 1))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    y1 = model.apply(
        variables, x, train=True,
        rngs={"dropout": jax.random.PRNGKey(1)},
        mutable=["batch_stats"],
    )[0]
    y2 = model.apply(
        variables, x, train=True,
        rngs={"dropout": jax.random.PRNGKey(2)},
        mutable=["batch_stats"],
    )[0]
    assert not np.allclose(np.asarray(y1), np.asarray(y2))


def test_build_model_parity_alias():
    """recognition.build_model mirrors the reference graph builder

    (/root/reference/keras_ocr/recognition.py:187-350)."""
    from keras_ocr_tpu import recognition

    model = recognition.build_model("abc", height=31, width=200, stn=False)
    assert model.alphabet_size == 3
    assert model.stn is False
