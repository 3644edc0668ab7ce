"""SPMD trainers, callbacks, and checkpointing on the 8-fake-device mesh.

What the reference leaves untested (SURVEY.md §4: "the MirroredStrategy
script is untested"): one real optimization step for both trainers with
the batch sharded over the mesh's data axis, loss decrease on a fixed
batch, checkpoint save/restore roundtrip, and callback semantics.
"""

import os
import string

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy; `make test-all` / nightly CI

import jax
import jax.numpy as jnp

from keras_ocr_tpu.detection import Detector
from keras_ocr_tpu.recognition import Recognizer
from keras_ocr_tpu.train import DetectorTrainer, RecognizerTrainer, checkpoint
from keras_ocr_tpu.train.callbacks import CSVLogger, EarlyStopping

TINY_CRNN = {
    "height": 31,
    "width": 64,
    "color": False,
    "filters": (8, 8, 8, 8, 16, 16, 16),
    "rnn_units": (16, 16),
    "dropout": 0.25,
    "rnn_steps_to_discard": 2,
    "pool_size": 2,
    "stn": False,
}
ALPHABET = string.ascii_lowercase[:8]


@pytest.fixture(scope="module")
def recognizer():
    return Recognizer(weights=None, alphabet=ALPHABET, build_params=TINY_CRNN)


def _recognizer_batch(recognizer, batch_size=8, seed=0):
    rng = np.random.RandomState(seed)
    h, w, _ = recognizer.input_shape
    images = rng.rand(batch_size, h, w, 1).astype("float32")
    label_length = rng.randint(1, 5, size=(batch_size, 1)).astype("int32")
    time_steps = (
        TINY_CRNN["width"] // TINY_CRNN["pool_size"] ** 2
        - TINY_CRNN["rnn_steps_to_discard"]
    )
    labels = np.full((batch_size, 8), -1, dtype="int32")
    for i, n in enumerate(label_length[:, 0]):
        labels[i, :n] = rng.randint(0, len(ALPHABET), size=n)
    input_length = np.full((batch_size, 1), time_steps, dtype="int32")
    return (images, labels, input_length, label_length), np.zeros(batch_size)


def test_recognizer_trainer_loss_decreases(recognizer):
    trainer = RecognizerTrainer(recognizer)
    assert trainer.mesh.shape["data"] == len(jax.devices())
    batch = _recognizer_batch(recognizer)
    rng = jax.random.PRNGKey(0)
    first = trainer.train_step(batch, rng)
    losses = [trainer.train_step(batch, rng) for _ in range(8)]
    assert np.isfinite(first)
    assert losses[-1] < first


def test_recognizer_fit_syncs_variables_and_runs_callbacks(recognizer, tmp_path):
    trainer = RecognizerTrainer(recognizer)

    def gen():
        while True:
            yield _recognizer_batch(recognizer)

    csv_path = os.path.join(tmp_path, "log.csv")
    history = trainer.fit(
        gen(),
        steps_per_epoch=2,
        epochs=2,
        callbacks=[CSVLogger(csv_path)],
    )
    assert len(history) == 2
    assert recognizer.variables is trainer.variables
    rows = open(csv_path).read().strip().splitlines()
    assert len(rows) == 3  # header + 2 epochs


def test_early_stopping_halts_training(recognizer):
    trainer = RecognizerTrainer(recognizer)

    def gen():
        while True:
            yield _recognizer_batch(recognizer)

    # Patience 0 with an already-converged (constant) metric: EarlyStopping
    # monitors epoch loss; with patience 1 it must stop well before 50.
    history = trainer.fit(
        gen(),
        steps_per_epoch=1,
        epochs=50,
        callbacks=[EarlyStopping(monitor="loss", patience=1)],
    )
    assert len(history) < 50


def test_detector_trainer_step_and_loss_decreases():
    detector = Detector(weights=None, max_components=16)
    trainer = DetectorTrainer(detector)
    rng = np.random.RandomState(0)
    images = rng.rand(8, 64, 64, 3).astype("float32")
    targets = rng.rand(8, 32, 32, 2).astype("float32") * 0.1
    first = trainer.train_step((images, targets))
    losses = [trainer.train_step((images, targets)) for _ in range(4)]
    assert np.isfinite(first)
    assert losses[-1] < first
    # Trained variables flow back through fit().
    history = trainer.fit(
        iter(lambda: (images, targets), None), steps_per_epoch=1, epochs=1
    )
    assert len(history) == 1
    assert detector.variables is trainer.variables


def _ohem_oracle(preds, targets, weights, pos_threshold=0.1, neg_ratio=3,
                 min_negatives=512):
    """Independent NumPy statement of the OHEM definition."""
    batch, _, _, channels = preds.shape
    per_sample = np.zeros(batch)
    for b in range(batch):
        channel_losses = []
        for c in range(channels):
            err = (preds[b, ..., c] - targets[b, ..., c]).ravel() ** 2
            pos = targets[b, ..., c].ravel() > pos_threshold
            n_pos = int(pos.sum())
            neg_err = np.sort(err[~pos])[::-1]
            k = (
                min(neg_ratio * n_pos, neg_err.size)
                if n_pos
                else min(min_negatives, neg_err.size)
            )
            total = err[pos].sum() + neg_err[:k].sum()
            channel_losses.append(total / max(n_pos + k, 1))
        per_sample[b] = np.mean(channel_losses)
    return float(np.mean(per_sample * weights))


def test_ohem_loss_matches_numpy_oracle():
    from keras_ocr_tpu.train.detector import ohem_mse_loss

    rng = np.random.RandomState(3)
    preds = rng.rand(3, 16, 24, 2).astype("float32")
    # Mixed population: sample 0 has positives in both channels, sample 1
    # only in channel 0, sample 2 none (exercises the min_negatives path).
    targets = np.zeros_like(preds)
    targets[0, 2:6, 3:9, :] = rng.uniform(0.3, 1.0, (4, 6, 2))
    targets[1, 8:12, 1:5, 0] = rng.uniform(0.3, 1.0, (4, 4))
    weights = np.array([1.0, 0.5, 2.0], dtype="float32")
    ours = float(ohem_mse_loss(jnp.asarray(preds), jnp.asarray(targets),
                               jnp.asarray(weights), min_negatives=50))
    oracle = _ohem_oracle(preds, targets, weights, min_negatives=50)
    np.testing.assert_allclose(ours, oracle, rtol=1e-5)


def test_detector_trainer_ohem_loss_trains():
    detector = Detector(weights=None, max_components=16)
    trainer = DetectorTrainer(detector, loss="ohem")
    rng = np.random.RandomState(0)
    images = rng.rand(8, 64, 64, 3).astype("float32")
    targets = np.zeros((8, 32, 32, 2), dtype="float32")
    targets[:, 10:20, 8:24, 0] = 0.9
    targets[:, 12:18, 10:22, 1] = 0.7
    first = trainer.train_step((images, targets))
    losses = [trainer.train_step((images, targets)) for _ in range(4)]
    assert np.isfinite(first)
    assert losses[-1] < first


def test_detector_trainer_rejects_unknown_loss():
    detector = Detector(weights=None, max_components=16)
    with pytest.raises(ValueError, match="unknown loss"):
        DetectorTrainer(detector, loss="dice")


def test_checkpoint_roundtrip(recognizer, tmp_path):
    path = os.path.join(tmp_path, "ckpt-1")
    saved = checkpoint.save(path, recognizer.variables)
    restored = checkpoint.restore(saved)
    flat_a = jax.tree.leaves(recognizer.variables)
    flat_b = jax.tree.leaves(restored)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    assert checkpoint.latest(str(tmp_path)) == saved


def test_checkpoint_npz_single_file_roundtrip(recognizer, tmp_path):
    """save_npz/restore_npz: one committable file, optional f16 cast
    (the golden-artifact format, scripts/make_golden_artifact.py)."""
    path = os.path.join(tmp_path, "weights.npz")
    checkpoint.save_npz(path, recognizer.variables)
    restored = checkpoint.restore_npz(path)
    flat_a = jax.tree.leaves(recognizer.variables)
    flat_b = jax.tree.leaves(restored)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    assert os.path.isfile(path)  # exactly one file, no orbax directory

    # f16 cast halves the payload and round-trips within f16 precision.
    half = os.path.join(tmp_path, "weights_f16.npz")
    checkpoint.save_npz(half, recognizer.variables, cast=np.float16)
    restored16 = checkpoint.restore_npz(half)
    for a, b in zip(flat_a, jax.tree.leaves(restored16)):
        a = np.asarray(a)
        assert np.asarray(b).dtype != np.float16  # upcast on restore
        if np.issubdtype(a.dtype, np.floating):
            np.testing.assert_allclose(np.asarray(b), a, rtol=2e-3, atol=1e-4)


def test_tensor_parallel_sharding_step(recognizer):
    """model-axis sharding (§2c): a (4, 2) mesh step compiles and runs."""
    from keras_ocr_tpu.parallel import mesh as mesh_lib

    mesh = mesh_lib.create_mesh(shape=(4, 2))
    trainer = RecognizerTrainer(recognizer, mesh=mesh, tensor_parallel=True)
    batch = _recognizer_batch(recognizer)
    loss = trainer.train_step(batch, jax.random.PRNGKey(0))
    assert np.isfinite(loss)


def test_hybrid_multislice_mesh_step(recognizer):
    """Multi-slice DP (SURVEY §2c DCN/ICI layering): one train step on a
    (slice=2, data=2, model=2) hybrid mesh runs and matches the loss of a
    plain single-mesh step (same global batch, same init)."""
    from keras_ocr_tpu.parallel import mesh as mesh_lib

    batch = _recognizer_batch(recognizer)
    plain = RecognizerTrainer(recognizer, mesh=mesh_lib.create_mesh(shape=(8, 1)))
    loss_plain = plain.train_step(batch, jax.random.PRNGKey(0))

    mesh = mesh_lib.create_hybrid_mesh(dcn_data=2, ici_shape=(2, 2))
    assert dict(mesh.shape) == {"slice": 2, "data": 2, "model": 2}
    hybrid = RecognizerTrainer(recognizer, mesh=mesh)
    loss_hybrid = hybrid.train_step(batch, jax.random.PRNGKey(0))
    assert np.isfinite(loss_hybrid)
    np.testing.assert_allclose(loss_hybrid, loss_plain, rtol=1e-4)


def test_recognizer_overfit_reads_back_strings():
    """Functional training check (offline analog of the reference's golden
    'eventdock' test): overfit a tiny CRNN on four deterministic synthetic
    crops until the END-TO-END prediction path reads the strings back."""
    recognizer = Recognizer(weights=None, alphabet=ALPHABET, build_params=TINY_CRNN)
    h, w = TINY_CRNN["height"], TINY_CRNN["width"]
    # 8 samples so the batch shards evenly over the 8 fake devices.
    texts = ["abc", "hgf", "adg", "ceb", "bad", "fed", "gac", "hbe"]

    def render(text):
        # Char c -> horizontal stripe at a c-specific height inside its
        # third of the crop: trivially separable, must still be learned.
        image = np.zeros((h, w), dtype="float32")
        seg = w // len(text)
        for i, ch in enumerate(text):
            c = ALPHABET.index(ch)
            y = 2 + 3 * c
            image[y : y + 3, i * seg + 2 : (i + 1) * seg - 2] = 1.0
        return image

    images = np.stack([render(t) for t in texts])[..., None]
    time_steps = (
        TINY_CRNN["width"] // TINY_CRNN["pool_size"] ** 2
        - TINY_CRNN["rnn_steps_to_discard"]
    )
    labels = np.full((len(texts), 8), -1, dtype="int32")
    for i, t in enumerate(texts):
        labels[i, : len(t)] = [ALPHABET.index(ch) for ch in t]
    input_length = np.full((len(texts), 1), time_steps, dtype="int32")
    label_length = np.full((len(texts), 1), 3, dtype="int32")
    batch = ((images, labels, input_length, label_length), np.zeros(len(texts)))

    import optax

    trainer = RecognizerTrainer(recognizer, optimizer=optax.rmsprop(5e-3))
    rng = jax.random.PRNGKey(0)
    got = None
    for step in range(400):
        trainer.train_step(batch, jax.random.fold_in(rng, step))
        if step % 50 == 49:
            recognizer.variables = jax.device_get(trainer.variables)
            got = [
                recognizer.recognize(
                    np.repeat((render(t) * 255).astype("uint8")[..., None], 3, -1)
                )
                for t in texts
            ]
            if got == texts:
                break
    assert got == texts, got
