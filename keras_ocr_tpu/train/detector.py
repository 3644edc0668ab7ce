"""CRAFT detector training: MSE heatmap loss + Adam, data-parallel mesh.

Replaces the reference's ``model.compile(loss='mse', optimizer='adam')`` +
generator ``fit`` (/root/reference/keras_ocr/detection.py:696,698-743) with
a jitted SPMD step (batch sharded on the mesh ``data`` axis). The plain
MSE on both heatmap channels — rather than the original CRAFT OHEM loss —
is intentional behavior parity (SURVEY.md §3.2 note).
"""

from __future__ import annotations

import typing

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..parallel import mesh as mesh_lib


class DetectorTrainer:
    def __init__(
        self,
        detector,
        optimizer: typing.Optional[optax.GradientTransformation] = None,
        mesh=None,
    ):
        self.detector = detector
        self.model = detector.model
        self.optimizer = optimizer or optax.adam(learning_rate=1e-3)
        self.mesh = mesh if mesh is not None else mesh_lib.create_mesh()
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
            per_sample = jnp.mean((preds - targets) ** 2, axis=(1, 2, 3))
            loss = jnp.mean(per_sample * sample_weights)
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
