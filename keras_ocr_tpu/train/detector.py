"""CRAFT detector training: heatmap loss + Adam, data-parallel mesh.

Replaces the reference's ``model.compile(loss='mse', optimizer='adam')`` +
generator ``fit`` (/root/reference/keras_ocr/detection.py:696,698-743) with
a jitted SPMD step (batch sharded on the mesh ``data`` axis). The default
plain MSE on both heatmap channels is behavior parity (SURVEY.md §3.2
note); ``loss="ohem"`` additionally offers the original CRAFT paper's
online hard-example-mining objective, which the reference's docs admit
their "very simple training mechanism" does not match
(/root/reference/docs/examples/end_to_end_training.rst:8-10).
"""

from __future__ import annotations

import typing

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..parallel import mesh as mesh_lib


def _mse_loss(preds, targets, sample_weights):
    """The reference's compiled objective: plain MSE over both channels."""
    per_sample = jnp.mean((preds - targets) ** 2, axis=(1, 2, 3))
    return jnp.mean(per_sample * sample_weights)


def ohem_mse_loss(
    preds,
    targets,
    sample_weights,
    pos_threshold: float = 0.1,
    neg_ratio: int = 3,
    min_negatives: int = 512,
):
    """CRAFT online hard-example-mining pixel loss, per channel.

    For each sample and each heatmap channel (region, affinity):
    positives are pixels whose target exceeds ``pos_threshold``; all
    positive squared errors count, plus the ``neg_ratio`` x num_positives
    largest-error negatives (or ``min_negatives`` when a map has no
    positives), normalized by the number of contributing pixels. Dynamic
    top-k is expressed as a full descending sort + rank mask so the whole
    loss stays one static-shape XLA program.
    """
    batch = preds.shape[0]
    err = (preds.astype(jnp.float32) - targets.astype(jnp.float32)) ** 2
    # (B, H, W, C) -> (B, C, N): OHEM runs independently per channel.
    err = err.reshape(batch, -1, err.shape[-1]).swapaxes(1, 2)
    pos = (
        targets.reshape(batch, -1, targets.shape[-1]).swapaxes(1, 2)
        > pos_threshold
    )
    n_pixels = err.shape[-1]
    n_pos = jnp.sum(pos, axis=-1)
    n_neg = n_pixels - n_pos
    k = jnp.where(
        n_pos > 0,
        jnp.minimum(neg_ratio * n_pos, n_neg),
        jnp.minimum(min_negatives, n_neg),
    )
    pos_sum = jnp.sum(jnp.where(pos, err, 0.0), axis=-1)
    # Rank negatives by error: positives sink below every true negative
    # (err >= 0 > -1), and the rank<k mask keeps -1 fill from ever being
    # selected because k <= n_neg.
    neg_sorted = jnp.sort(jnp.where(pos, -1.0, err), axis=-1)[..., ::-1]
    ranks = jnp.arange(n_pixels)
    neg_sum = jnp.sum(
        jnp.where(ranks < k[..., None], neg_sorted, 0.0), axis=-1
    )
    denom = jnp.maximum(n_pos + k, 1)
    per_channel = (pos_sum + neg_sum) / denom  # (B, C)
    per_sample = jnp.mean(per_channel, axis=-1)
    return jnp.mean(per_sample * sample_weights)


class DetectorTrainer:
    def __init__(
        self,
        detector,
        optimizer: typing.Optional[optax.GradientTransformation] = None,
        mesh=None,
        loss: typing.Union[str, typing.Callable] = "mse",
    ):
        self.detector = detector
        self.model = detector.model
        self.optimizer = optimizer or optax.adam(learning_rate=1e-3)
        self.mesh = mesh if mesh is not None else mesh_lib.create_mesh()
        if callable(loss):
            self.loss = loss
        elif loss == "mse":
            self.loss = _mse_loss
        elif loss == "ohem":
            self.loss = ohem_mse_loss
        else:
            raise ValueError(f"unknown loss {loss!r}; use 'mse', 'ohem', or a callable")
        self.variables = mesh_lib.shard_params(
            jax.tree.map(jnp.asarray, detector.variables), self.mesh
        )
        self.opt_state = self.optimizer.init(self.variables["params"])
        self._step = jax.jit(self._train_step, donate_argnums=(0, 1))

    def _train_step(self, variables, opt_state, batch):
        images, targets, sample_weights = batch

        def loss_fn(params):
            preds, updates = self.model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                images,
                train=True,
                mutable=["batch_stats"],
            )
            loss = self.loss(preds, targets, sample_weights)
            return loss, updates["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            variables["params"]
        )
        updates, opt_state = self.optimizer.update(
            grads, opt_state, variables["params"]
        )
        params = optax.apply_updates(variables["params"], updates)
        return {"params": params, "batch_stats": new_stats}, opt_state, loss

    def train_step(self, batch) -> float:
        if len(batch) == 3:
            images, targets, weights = batch
        else:
            images, targets = batch
            weights = np.ones((len(images),), dtype="float32")
        device_batch = mesh_lib.shard_batch(
            (
                jnp.asarray(images, dtype=jnp.float32),
                jnp.asarray(targets, dtype=jnp.float32),
                jnp.asarray(np.asarray(weights), dtype=jnp.float32),
            ),
            self.mesh,
        )
        self.variables, self.opt_state, loss = self._step(
            self.variables, self.opt_state, device_batch
        )
        return float(loss)

    def fit(
        self,
        batch_generator,
        steps_per_epoch: int,
        epochs: int = 1,
        callbacks: typing.Optional[list] = None,
    ):
        from .callbacks import CallbackList

        callbacks = CallbackList(callbacks or [], owner=self)
        history = []
        for epoch in range(epochs):
            losses = [
                self.train_step(next(batch_generator)) for _ in range(steps_per_epoch)
            ]
            epoch_loss = float(np.mean(losses))
            history.append(epoch_loss)
            if callbacks.on_epoch_end(epoch, {"loss": epoch_loss}):
                break
        self.detector.variables = self.variables
        return history
