"""End-to-end smoke: synth scenes -> DETECTOR training -> localization.

Renders synthetic word scenes with the built-in generator (PIL default
font, no downloads), builds CRAFT ground-truth heatmaps with the same
``compute_maps`` pipeline the reference uses (detection.py:698-743),
trains CRAFT from scratch with the MSE SPMD trainer, and reports word
recall@IoU0.5 of ``Detector.detect`` on held-out scenes. Proves the
scene-generation -> GT-map -> detector-training -> on-device getBoxes
loop closes without any network. Run on a TPU (CRAFT training is slow on
CPU):  python scripts/smoke_train_detector.py --steps 200
"""

import argparse
import random

import numpy as np

import os
import sys

# Make the in-repo package importable when run as `python scripts/<name>.py`
# without a pip install (sys.path[0] is scripts/, not the repo root).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from keras_ocr_tpu import data_generation, tools
from keras_ocr_tpu.detection import Detector
from keras_ocr_tpu.evaluation import iou_score
from keras_ocr_tpu.train import DetectorTrainer

WORDS = ["event", "dock", "open", "craft", "read", "text", "word", "line"]


def scene_generator(height, width, seed):
    """(image, lines, confidence) scenes: 1-2 rendered words on white."""
    rng = random.Random(seed)
    alphabet = "".join(sorted(set("".join(WORDS))))
    while True:
        text = " ".join(rng.sample(WORDS, rng.randint(1, 2)))
        rendered, lines = data_generation.draw_text_image(
            text=text,
            fontsize=rng.randint(20, 28),
            height=height,
            width=width,
            fonts={alphabet: None},
        )
        drawn = "".join(c for line in lines for _, c in line if c != " ")
        if drawn != text.replace(" ", ""):
            continue
        scene = np.full((height, width, 3), 255, dtype="uint8")
        alpha = rendered[..., 3:4].astype("float32") / 255
        scene = (scene * (1 - alpha)).astype("uint8")
        yield scene, lines, 1.0


def word_boxes(lines):
    """Word-level ground-truth boxes via combine_line per word."""
    boxes = []
    for line in lines:
        chars = []
        for box, character in line:
            if character == " ":
                if chars:
                    boxes.append(tools.combine_line(chars)[0])
                chars = []
            else:
                chars.append((box, character))
        if chars:
            boxes.append(tools.combine_line(chars)[0])
    return boxes


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=200)
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--eval-scenes", type=int, default=16)
    parser.add_argument("--size", type=int, default=256)
    args = parser.parse_args()

    detector = Detector(weights=None, max_components=32)
    gen = scene_generator(args.size, args.size, seed=0)
    batches = detector.get_batch_generator(gen, batch_size=args.batch_size)

    trainer = DetectorTrainer(detector)
    losses = []
    for step in range(args.steps):
        X, y = next(batches)[:2]
        losses.append(trainer.train_step((X, y)))
        if (step + 1) % max(1, args.steps // 5) == 0:
            print(f"step {step + 1}: loss {np.mean(losses[-20:]):.5f}", flush=True)
    detector.variables = trainer.variables

    held_out = scene_generator(args.size, args.size, seed=123)
    hits = total = 0
    for _ in range(args.eval_scenes):
        scene, lines, _ = next(held_out)
        gt = word_boxes(lines)
        predicted = detector.detect([scene])[0]
        for true_box in gt:
            total += 1
            if any(iou_score(true_box, box) >= 0.5 for box in predicted):
                hits += 1
    recall = hits / max(total, 1)
    print(f"held-out word recall@IoU0.5: {recall:.2%} ({hits}/{total})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
