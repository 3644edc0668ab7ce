"""Train the CRNN recognizer on MJSynth/SynthText90 with mesh data parallelism.

The TPU-native analog of
/root/reference/scripts/train_recognizer_synthtext90_multigpu.py: the same
dataset download + path-traversal-safe extraction, letterbox fitting,
brightness/gamma/invert augmentation, and EarlyStopping / ModelCheckpoint
/ CSVLogger callbacks — but ``tf.distribute.MirroredStrategy`` is replaced
by a ``jax.sharding.Mesh`` data-parallel
:class:`keras_ocr_tpu.train.RecognizerTrainer` (gradients reduced by XLA
collectives over ICI), and resume restores from the checkpoint that
actually exists (the reference's resume had a latent bug: it timestamped a
new path and then loaded from that nonexistent file, script:138-147).
"""

import argparse
import os
import tarfile
import time

import numpy as np

import os
import sys

# Make the in-repo package importable when run as `python scripts/<name>.py`
# without a pip install (sys.path[0] is scripts/, not the repo root).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import keras_ocr_tpu
from keras_ocr_tpu import tools
from keras_ocr_tpu.data import augmentation
from keras_ocr_tpu.train import RecognizerTrainer, callbacks, checkpoint
from keras_ocr_tpu.parallel import mesh as mesh_lib


def safe_extract(tar_path: str, destination: str) -> None:
    """Extract a tarball, refusing members that escape the destination."""
    destination = os.path.realpath(destination)
    with tarfile.open(tar_path) as archive:
        for member in archive.getmembers():
            member_path = os.path.realpath(os.path.join(destination, member.name))
            if not member_path.startswith(destination + os.sep):
                raise RuntimeError(f"Refusing unsafe tar member: {member.name}")
        archive.extractall(destination)


def get_filepaths_and_labels(data_dir: str, split: str):
    """(filepath, label) pairs from the mjsynth annotation files; labels are
    embedded in the filenames (..._WORD_...)."""
    annotation = os.path.join(data_dir, f"annotation_{split}.txt")
    entries = []
    with open(annotation, "r", encoding="utf8") as f:
        for line in f:
            relpath = line.split(" ")[0].strip()
            if not relpath:
                continue
            label = os.path.basename(relpath).split("_")[1].lower()
            entries.append((os.path.join(data_dir, relpath[2:]), label))
    return entries


def download_synthtext90(cache_dir=None) -> str:
    if cache_dir is None:
        cache_dir = tools.get_default_cache_dir()
    data_dir = os.path.join(cache_dir, "synthtext90")
    tar_path = tools.download_and_verify(
        url="https://thor.robots.ox.ac.uk/~vgg/data/text/mjsynth.tar.gz",
        cache_dir=data_dir,
        filename="mjsynth.tar.gz",
    )
    extracted = os.path.join(data_dir, "mnt", "ramdisk", "max", "90kDICT32px")
    if not os.path.isdir(extracted):
        safe_extract(tar_path, data_dir)
    return extracted


def image_generator(entries, alphabet, height, width, augmenter=None):
    rng = np.random.RandomState(0)
    while True:
        rng.shuffle(entries)
        for filepath, label in entries:
            if not os.path.isfile(filepath):
                continue
            if any(c not in alphabet for c in label) or not label:
                continue
            try:
                image = tools.read_and_fit(filepath, width=width, height=height, cval=0)
            except Exception:  # noqa: BLE001 - skip corrupt files
                continue
            if augmenter is not None:
                image = augmenter.augment_image(image)
            yield image, label


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch-size", type=int, default=64)
    parser.add_argument("--epochs", type=int, default=1000)
    parser.add_argument("--steps-per-epoch", type=int, default=1000)
    parser.add_argument("--learning-rate", type=float, default=1e-3)
    parser.add_argument("--output-dir", default="recognizer_synthtext90")
    parser.add_argument("--resume", action="store_true")
    args = parser.parse_args()

    data_dir = download_synthtext90()
    recognizer = keras_ocr_tpu.Recognizer(weights=None, alphabet=None)
    alphabet = recognizer.alphabet
    height, width, _ = recognizer.input_shape

    augmenter = augmentation.Sequential(
        [
            augmentation.Multiply((0.9, 1.1)),
            augmentation.GammaContrast(gamma=(0.5, 3.0)),
            augmentation.Invert(0.25, per_channel=0.5),
        ]
    )
    train_entries = get_filepaths_and_labels(data_dir, "train")
    batch_gen = recognizer.get_batch_generator(
        image_generator(train_entries, alphabet, height, width, augmenter),
        batch_size=args.batch_size,
    )

    import optax

    mesh = mesh_lib.create_mesh()
    trainer = RecognizerTrainer(
        recognizer, optimizer=optax.rmsprop(args.learning_rate), mesh=mesh
    )
    os.makedirs(args.output_dir, exist_ok=True)
    if args.resume:
        existing = checkpoint.latest(args.output_dir, prefix="recognizer")
        if existing is not None:
            print(f"Resuming from {existing}")
            trainer.variables = checkpoint.restore(existing)
            trainer.opt_state = trainer.optimizer.init(trainer.variables["params"])
    run_name = time.strftime("recognizer_%Y-%m-%d_%H-%M")
    trainer.fit(
        batch_gen,
        steps_per_epoch=args.steps_per_epoch,
        epochs=args.epochs,
        callbacks=[
            callbacks.EarlyStopping(patience=10, restore_best_weights=False),
            callbacks.ModelCheckpoint(
                os.path.join(args.output_dir, run_name), save_best_only=True
            ),
            callbacks.CSVLogger(os.path.join(args.output_dir, run_name + ".csv")),
        ],
    )


if __name__ == "__main__":
    main()
