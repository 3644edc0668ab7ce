"""CTC loss and greedy decoding as jittable XLA programs.

TPU-native replacements for the reference's TF kernels:
``keras.backend.ctc_batch_cost`` (/root/reference/keras_ocr/recognition.py:340)
and the greedy ``keras.backend.ctc_decode`` Lambda layer
(/root/reference/keras_ocr/recognition.py:169-184). The loss is the
standard log-space alpha (forward) recursion over the blank-interleaved
label sequence, run as one ``lax.scan`` over time with the batch and state
dimensions fully vectorized; gradients come from JAX autodiff of the scan,
which matches the classic beta-recursion gradient. Blank is the LAST class
(TF convention), labels are ``-1``-padded.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG_INF = -1e30


def ctc_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    input_lengths: jnp.ndarray,
    label_lengths: jnp.ndarray,
    logits_are_log_probs: bool = False,
) -> jnp.ndarray:
    """Per-sample CTC negative log-likelihood.

    Args:
        logits: (B, T, C) unnormalized scores (or log-probs if
            ``logits_are_log_probs``). Class ``C - 1`` is the blank,
            matching ``ctc_batch_cost``'s TF convention.
        labels: (B, L) int labels, padded with any value (commonly -1).
        input_lengths: (B,) number of valid time steps per sample.
        label_lengths: (B,) number of valid labels per sample.

    Returns:
        (B,) float32 loss values.
    """
    logits = logits.astype(jnp.float32)
    batch, time, num_classes = logits.shape
    blank = num_classes - 1
    max_label = labels.shape[1]
    num_states = 2 * max_label + 1

    if logits_are_log_probs:
        log_probs = logits
    else:
        log_probs = jax.nn.log_softmax(logits, axis=-1)

    labels = labels.astype(jnp.int32)
    label_lengths = label_lengths.astype(jnp.int32)
    input_lengths = input_lengths.astype(jnp.int32)

    state_idx = jnp.arange(num_states)
    is_label_state = (state_idx % 2) == 1
    label_pos = jnp.clip((state_idx - 1) // 2, 0, max_label - 1)
    safe_labels = jnp.clip(labels, 0, num_classes - 1)
    # ext[b, s]: class emitted at state s (blank at even states).
    ext = jnp.where(
        is_label_state[None, :], safe_labels[:, label_pos], blank
    )  # (B, S)
    # A state is live only if it exists for this sample's label length.
    live = state_idx[None, :] < (2 * label_lengths[:, None] + 1)

    # Skip transition s-2 -> s allowed when ext[s] is a non-blank different
    # from ext[s-2].
    ext_minus2 = jnp.pad(ext, ((0, 0), (2, 0)), constant_values=blank)[:, :num_states]
    allow_skip = is_label_state[None, :] & (ext != ext_minus2)

    def emit(t):
        # (B, S) log prob of emitting each state's class at time t.
        return jnp.take_along_axis(log_probs[:, t, :], ext, axis=1)

    alpha0 = jnp.full((batch, num_states), _NEG_INF)
    alpha0 = alpha0.at[:, 0].set(log_probs[:, 0, blank])
    first_label = jnp.take_along_axis(
        log_probs[:, 0, :], ext[:, 1:2], axis=1
    )[:, 0]
    alpha0 = alpha0.at[:, 1].set(
        jnp.where(label_lengths > 0, first_label, _NEG_INF)
    )
    alpha0 = jnp.where(live, alpha0, _NEG_INF)

    def step(alpha, t):
        prev1 = jnp.pad(alpha, ((0, 0), (1, 0)), constant_values=_NEG_INF)[
            :, :num_states
        ]
        prev2 = jnp.pad(alpha, ((0, 0), (2, 0)), constant_values=_NEG_INF)[
            :, :num_states
        ]
        prev2 = jnp.where(allow_skip, prev2, _NEG_INF)
        stacked = jnp.stack([alpha, prev1, prev2], axis=0)
        merged = jax.nn.logsumexp(stacked, axis=0)
        new_alpha = merged + emit(t)
        new_alpha = jnp.where(live, new_alpha, _NEG_INF)
        # Freeze alphas past each sample's input length.
        active = (t < input_lengths)[:, None]
        new_alpha = jnp.where(active, new_alpha, alpha)
        return new_alpha, None

    alpha, _ = jax.lax.scan(step, alpha0, jnp.arange(1, time))

    final_state = 2 * label_lengths  # last blank state index
    last_blank = jnp.take_along_axis(alpha, final_state[:, None], axis=1)[:, 0]
    last_label = jnp.take_along_axis(
        alpha, jnp.maximum(final_state - 1, 0)[:, None], axis=1
    )[:, 0]
    last_label = jnp.where(label_lengths > 0, last_label, _NEG_INF)
    total = jax.nn.logsumexp(jnp.stack([last_blank, last_label], axis=0), axis=0)
    return -total


def ctc_greedy_decode(
    probs: jnp.ndarray,
    mask: jnp.ndarray | None = None,
    pad_value: int = -1,
) -> jnp.ndarray:
    """Greedy (best-path) CTC decode.

    Argmax per frame, collapse repeats, drop blanks, left-pack, pad with
    ``pad_value`` — identical output contract to the reference's
    ``CTCDecoder`` Lambda (/root/reference/keras_ocr/recognition.py:169-184):
    output shape (B, T) padded with -1.

    Args:
        probs: (B, T, C) probabilities or logits (argmax is invariant).
        mask: optional (B, T) bool; False frames are ignored.
    """
    batch, time, num_classes = probs.shape
    blank = num_classes - 1
    assert pad_value < 0, "max-based packing needs pad_value below any label"
    preds = jnp.argmax(probs, axis=-1).astype(jnp.int32)  # (B, T)
    prev = jnp.pad(preds, ((0, 0), (1, 0)), constant_values=blank)[:, :time]
    keep = (preds != prev) & (preds != blank)
    if mask is not None:
        keep = keep & mask
    positions = jnp.where(keep, jnp.cumsum(keep, axis=1) - 1, time)  # (B, T)
    # Left-pack WITHOUT a scatter (XLA:TPU serializes row scatters; the
    # (B, T, T) one-hot max is a trivial VPU reduce at T=48): output slot p
    # takes the unique frame whose kept-rank equals p, else pad_value.
    slots = jnp.arange(time, dtype=jnp.int32)[None, :, None]  # (1, P, 1)
    hits = positions[:, None, :] == slots  # (B, P, T)
    out = jnp.max(
        jnp.where(hits, preds[:, None, :], pad_value), axis=2
    ).astype(jnp.int32)
    return out


def ctc_decode_to_strings(decoded, alphabet: str) -> list:
    """Convert -1-padded decoded label rows into python strings.

    Mirrors the host-side join in
    /root/reference/keras_ocr/recognition.py:527-537.
    """
    import numpy as np

    decoded = np.asarray(decoded)
    blank = len(alphabet)
    return [
        "".join(alphabet[idx] for idx in row if idx not in (blank, -1))
        for row in decoded
    ]
