"""CTC loss/decode vs PyTorch oracle (torch.nn.CTCLoss runs on CPU here)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from keras_ocr_tpu.ops import ctc

torch = pytest.importorskip("torch")


def _torch_ctc(logits, labels, input_lengths, label_lengths):
    """Reference CTC loss via torch (blank remapped: torch wants any index)."""
    B, T, C = logits.shape
    log_probs = torch.log_softmax(torch.tensor(logits), dim=-1).permute(1, 0, 2)
    targets = []
    for row, n in zip(labels, label_lengths):
        targets.extend(row[:n].tolist())
    targets = torch.tensor(targets, dtype=torch.long)
    loss = torch.nn.CTCLoss(blank=C - 1, reduction="none", zero_infinity=False)(
        log_probs,
        targets,
        torch.tensor(input_lengths, dtype=torch.long),
        torch.tensor(label_lengths, dtype=torch.long),
    )
    return loss.numpy()


def test_ctc_loss_matches_torch():
    rng = np.random.RandomState(0)
    B, T, C, L = 4, 12, 7, 5
    logits = rng.randn(B, T, C).astype("float32")
    label_lengths = np.array([5, 3, 1, 4])
    labels = np.full((B, L), -1, dtype="int32")
    for i, n in enumerate(label_lengths):
        labels[i, :n] = rng.randint(0, C - 1, size=n)
    input_lengths = np.array([12, 10, 12, 8])

    ours = np.asarray(
        ctc.ctc_loss(
            jnp.asarray(logits),
            jnp.asarray(labels),
            jnp.asarray(input_lengths),
            jnp.asarray(label_lengths),
        )
    )
    theirs = _torch_ctc(logits, labels, input_lengths, label_lengths)
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_ctc_loss_repeated_labels():
    # Repeats exercise the skip-transition constraint.
    rng = np.random.RandomState(1)
    B, T, C, L = 3, 15, 5, 6
    logits = rng.randn(B, T, C).astype("float32")
    labels = np.array(
        [
            [1, 1, 2, 2, 1, -1],
            [0, 0, 0, 0, 0, 0],
            [3, 3, 3, -1, -1, -1],
        ],
        dtype="int32",
    )
    label_lengths = np.array([5, 6, 3])
    input_lengths = np.array([15, 15, 15])
    ours = np.asarray(
        ctc.ctc_loss(
            jnp.asarray(logits),
            jnp.asarray(labels),
            jnp.asarray(input_lengths),
            jnp.asarray(label_lengths),
        )
    )
    theirs = _torch_ctc(logits, labels, input_lengths, label_lengths)
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_ctc_loss_empty_label():
    rng = np.random.RandomState(2)
    B, T, C, L = 2, 8, 4, 3
    logits = rng.randn(B, T, C).astype("float32")
    labels = np.full((B, L), -1, dtype="int32")
    labels[1, :2] = [0, 1]
    label_lengths = np.array([0, 2])
    input_lengths = np.array([8, 8])
    ours = np.asarray(
        ctc.ctc_loss(
            jnp.asarray(logits),
            jnp.asarray(labels),
            jnp.asarray(input_lengths),
            jnp.asarray(label_lengths),
        )
    )
    theirs = _torch_ctc(logits, labels, input_lengths, label_lengths)
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_ctc_loss_grad_finite():
    rng = np.random.RandomState(3)
    B, T, C, L = 2, 10, 6, 4
    logits = jnp.asarray(rng.randn(B, T, C).astype("float32"))
    labels = jnp.asarray(rng.randint(0, C - 1, size=(B, L)).astype("int32"))
    grad = jax.grad(
        lambda lg: ctc.ctc_loss(
            lg, labels, jnp.array([T, T]), jnp.array([L, L])
        ).sum()
    )(logits)
    assert np.isfinite(np.asarray(grad)).all()
    # Gradient of log-likelihood wrt logits sums to ~0 per frame
    # (softmax property): sum over classes of dL/dlogit = 0.
    np.testing.assert_allclose(np.asarray(grad.sum(axis=-1)), 0, atol=1e-4)


def test_ctc_greedy_decode_basic():
    # Sequence: a a _ b b c -> a b c  (blank = 3)
    path = [0, 0, 3, 1, 1, 2]
    C = 4
    probs = np.zeros((1, len(path), C), dtype="float32")
    for t, c in enumerate(path):
        probs[0, t, c] = 1.0
    out = np.asarray(ctc.ctc_greedy_decode(jnp.asarray(probs)))
    assert out.shape == (1, 6)
    assert out[0].tolist() == [0, 1, 2, -1, -1, -1]


def test_ctc_greedy_decode_repeat_after_blank():
    # a _ a -> a a (blank separates repeats)
    path = [0, 3, 0]
    probs = np.zeros((1, 3, 4), dtype="float32")
    for t, c in enumerate(path):
        probs[0, t, c] = 1.0
    out = np.asarray(ctc.ctc_greedy_decode(jnp.asarray(probs)))
    assert out[0].tolist() == [0, 0, -1]


def test_ctc_greedy_decode_all_blank():
    probs = np.zeros((2, 5, 4), dtype="float32")
    probs[..., 3] = 1.0
    out = np.asarray(ctc.ctc_greedy_decode(jnp.asarray(probs)))
    assert (out == -1).all()


def test_ctc_decode_to_strings():
    decoded = np.array([[0, 12, 35, -1, -1], [36, -1, -1, -1, -1]])
    import string

    alphabet = string.digits + string.ascii_lowercase
    words = ctc.ctc_decode_to_strings(decoded, alphabet)
    assert words == ["0cz", ""]


def test_ctc_greedy_decode_matches_collapse_oracle():
    rng = np.random.RandomState(4)
    B, T, C = 8, 20, 10
    probs = rng.rand(B, T, C).astype("float32")
    out = np.asarray(ctc.ctc_greedy_decode(jnp.asarray(probs)))
    for b in range(B):
        path = probs[b].argmax(axis=-1)
        collapsed = []
        prev = C - 1
        for c in path:
            if c != prev and c != C - 1:
                collapsed.append(int(c))
            prev = c
        expected = collapsed + [-1] * (T - len(collapsed))
        assert out[b].tolist() == expected
