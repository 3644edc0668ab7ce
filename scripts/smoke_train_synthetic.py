"""End-to-end smoke: synth data -> recognizer training -> word accuracy.

Renders synthetic word crops with the built-in generator (PIL default font
when no font assets are available), trains a small CRNN from scratch with
the CTC SPMD trainer, and reports exact-match word accuracy on held-out
crops. Proves the data-generation -> training -> inference loop closes
without any downloads. Run:  python scripts/smoke_train_synthetic.py
"""

import argparse
import itertools
import random
import string

import numpy as np

import os
import sys

# Make the in-repo package importable when run as `python scripts/<name>.py`
# without a pip install (sys.path[0] is scripts/, not the repo root).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from keras_ocr_tpu import data_generation
from keras_ocr_tpu.recognition import Recognizer
from keras_ocr_tpu.train import RecognizerTrainer


def crop_generator(alphabet, height, width, seed, min_len=2, max_len=6):
    """Clean single-word crops rendered with the default PIL font."""
    rng = random.Random(seed)
    while True:
        word = "".join(rng.choice(alphabet) for _ in range(rng.randint(min_len, max_len)))
        image, lines = data_generation.draw_text_image(
            text=word,
            fontsize=18,
            height=height,
            width=width,
            fonts={alphabet: None},
        )
        drawn = "".join(c for line in lines for _, c in line)
        if drawn != word:
            continue
        rgb = 255 - image[..., 3]  # black text on white
        yield np.stack([rgb] * 3, axis=-1), word


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=300)
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("--eval-samples", type=int, default=64)
    parser.add_argument("--alphabet", default=string.ascii_lowercase[:10])
    args = parser.parse_args()

    build_params = {
        "height": 31,
        "width": 96,
        "color": False,
        "filters": (16, 32, 32, 64, 64, 128, 128),
        "rnn_units": (64, 64),
        "dropout": 0.25,
        "rnn_steps_to_discard": 2,
        "pool_size": 2,
        "stn": False,
    }
    recognizer = Recognizer(
        weights=None, alphabet=args.alphabet, build_params=build_params
    )
    height, width, _ = recognizer.input_shape

    train_gen = crop_generator(args.alphabet, height, width, seed=0)
    batch_gen = recognizer.get_batch_generator(train_gen, batch_size=args.batch_size)

    import optax

    trainer = RecognizerTrainer(recognizer, optimizer=optax.adam(1e-3))
    epochs = min(10, max(1, args.steps))
    history = trainer.fit(
        batch_gen, steps_per_epoch=max(1, args.steps // epochs), epochs=epochs
    )
    print("loss history:", [round(h, 3) for h in history])

    eval_gen = crop_generator(args.alphabet, height, width, seed=999)
    correct = 0
    for image, word in itertools.islice(eval_gen, args.eval_samples):
        predicted = recognizer.recognize(image)
        correct += predicted == word
    accuracy = correct / args.eval_samples
    print(f"held-out word accuracy: {accuracy:.2%} ({correct}/{args.eval_samples})")
    return accuracy


if __name__ == "__main__":
    main()
