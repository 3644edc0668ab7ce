"""CRNN recognizer training: CTC loss, RMSprop, data-parallel mesh.

The functional replacement for the reference's Keras training model — the
``ctc_batch_cost`` Lambda + identity loss + RMSprop ``compile``
(/root/reference/keras_ocr/recognition.py:334-349,539-545) and the
MirroredStrategy multi-GPU script
(/root/reference/scripts/train_recognizer_synthtext90_multigpu.py) — as a
jitted SPMD train step: batch sharded over the mesh's ``data`` axis,
params replicated (or tensor-parallel via
:func:`keras_ocr_tpu.parallel.mesh.crnn_param_sharding`), gradient
reduction inserted by XLA as ICI collectives.
"""

from __future__ import annotations

import typing

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..ops.ctc import ctc_loss
from ..parallel import mesh as mesh_lib


class RecognizerTrainer:
    """Train state + jitted SPMD step for the CRNN.

    Args:
        recognizer: a :class:`keras_ocr_tpu.recognition.Recognizer`.
        optimizer: optax transform; default RMSprop(1e-3) like Keras'
            default compile (recognition.py:539-545).
        mesh: optional Mesh; default all-devices data-parallel.
    """

    def __init__(
        self,
        recognizer,
        optimizer: typing.Optional[optax.GradientTransformation] = None,
        mesh=None,
        tensor_parallel: bool = False,
    ):
        self.recognizer = recognizer
        self.model = recognizer.model
        self.optimizer = optimizer or optax.rmsprop(learning_rate=1e-3)
        self.mesh = mesh if mesh is not None else mesh_lib.create_mesh()
        rules = mesh_lib.crnn_param_sharding(self.mesh) if tensor_parallel else None
        self.variables = mesh_lib.shard_params(
            jax.tree.map(jnp.asarray, recognizer.variables), self.mesh, rules
        )
        self.opt_state = self.optimizer.init(self.variables["params"])
        self._step = jax.jit(self._train_step, donate_argnums=(0, 1))

    def _train_step(self, variables, opt_state, batch, rng):
        images, labels, input_length, label_length, sample_weights = batch

        def loss_fn(params):
            logits, updates = self.model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                images,
                train=True,
                return_logits=True,
                rngs={"dropout": rng},
                mutable=["batch_stats"],
            )
            losses = ctc_loss(
                logits,
                labels,
                input_length.reshape(-1),
                label_length.reshape(-1),
            )
            loss = jnp.mean(losses * sample_weights)
            return loss, updates["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            variables["params"]
        )
        updates, opt_state = self.optimizer.update(
            grads, opt_state, variables["params"]
        )
        params = optax.apply_updates(variables["params"], updates)
        return {"params": params, "batch_stats": new_stats}, opt_state, loss

    def train_step(self, batch, rng) -> float:
        """One SPMD step on a host batch tuple from ``get_batch_generator``."""
        (images, labels, input_length, label_length), _y, *rest = (
            batch if len(batch) == 3 else (batch[0], batch[1])
        )
        weights = (
            np.asarray(rest[0], dtype="float32")
            if rest
            else np.ones((len(images),), dtype="float32")
        )
        device_batch = mesh_lib.shard_batch(
            (
                jnp.asarray(images, dtype=jnp.float32),
                jnp.asarray(labels, dtype=jnp.int32),
                jnp.asarray(input_length, dtype=jnp.int32),
                jnp.asarray(label_length, dtype=jnp.int32),
                jnp.asarray(weights),
            ),
            self.mesh,
        )
        self.variables, self.opt_state, loss = self._step(
            self.variables, self.opt_state, device_batch, rng
        )
        return float(loss)

    def fit(
        self,
        batch_generator,
        steps_per_epoch: int,
        epochs: int = 1,
        callbacks: typing.Optional[list] = None,
        seed: int = 0,
    ):
        """Generator-driven fit loop with Keras-style callbacks.

        (The analog of ``training_model.fit`` in the reference scripts.)
        """
        from .callbacks import CallbackList

        callbacks = CallbackList(callbacks or [], owner=self)
        rng = jax.random.PRNGKey(seed)
        history = []
        for epoch in range(epochs):
            losses = []
            for _ in range(steps_per_epoch):
                rng, step_rng = jax.random.split(rng)
                losses.append(self.train_step(next(batch_generator), step_rng))
            epoch_loss = float(np.mean(losses))
            history.append(epoch_loss)
            if callbacks.on_epoch_end(epoch, {"loss": epoch_loss}):
                break
        # Sync trained variables back to the recognizer facade.
        self.recognizer.variables = self.variables
        return history
