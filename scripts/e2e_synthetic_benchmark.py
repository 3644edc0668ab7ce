"""Offline end-to-end quality proof: train both models, benchmark P/R.

No network, no datasets, no pretrained weights: renders synthetic word
scenes with the built-in generator (PIL default font), trains CRAFT
(MSE on compute_maps heatmaps) and the CRNN (CTC on word crops) from
scratch with the SPMD trainers, then runs the full fused
``Pipeline.recognize`` on held-out scenes and scores it with the
COCO-Text protocol scorer (greedy IoU>=0.5 + text-similarity>=0.5).

This is the strongest quality evidence available offline: a nonzero
end-to-end P/R requires every stage — scene generation, GT maps,
detector training, on-device getBoxes, perspective crops, recognizer
training, CTC decode, the scorer — to be correct together.

Run on a TPU:  python scripts/e2e_synthetic_benchmark.py
"""

import argparse
import json
import random
import string

import numpy as np

import os
import sys

# Make the in-repo package importable when run as `python scripts/<name>.py`
# without a pip install (sys.path[0] is scripts/, not the repo root).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from keras_ocr_tpu import data_generation, evaluation, tools
from keras_ocr_tpu.detection import Detector
from keras_ocr_tpu.pipeline import Pipeline
from keras_ocr_tpu.recognition import Recognizer
from keras_ocr_tpu.train import DetectorTrainer, RecognizerTrainer

WORDS = ["event", "dock", "open", "craft", "read", "text", "word", "line"]
ALPHABET = string.digits + string.ascii_lowercase


def recognizer_build_params():
    from keras_ocr_tpu.recognition import DEFAULT_BUILD_PARAMS

    params = dict(DEFAULT_BUILD_PARAMS)
    params["stn"] = False
    return params


def scene_generator(height, width, seed):
    rng = random.Random(seed)
    charset = "".join(sorted(set("".join(WORDS))))
    while True:
        text = " ".join(rng.sample(WORDS, rng.randint(1, 2)))
        rendered, lines = data_generation.draw_text_image(
            text=text,
            fontsize=rng.randint(20, 28),
            height=height,
            width=width,
            fonts={charset: None},
        )
        drawn = "".join(c for line in lines for _, c in line if c != " ")
        if drawn != text.replace(" ", ""):
            continue
        scene = np.full((height, width, 3), 255, dtype="uint8")
        alpha = rendered[..., 3:4].astype("float32") / 255
        scene = (scene * (1 - alpha)).astype("uint8")
        yield scene, lines, 1.0


def words_of(lines):
    """[(box, word)] via combine_line per space-separated word."""
    out = []
    for line in lines:
        chars = []
        for box, character in line:
            if character == " ":
                if chars:
                    out.append(tools.combine_line(chars))
                chars = []
            else:
                chars.append((box, character))
        if chars:
            out.append(tools.combine_line(chars))
    return out


def pooled(generator, count, seed):
    """Pre-render a fixed sample pool once and cycle it shuffled.

    PIL glyph rendering dominates wall time if done per step; a pool
    makes training device-bound while keeping sample diversity.
    """
    pool = [next(generator) for _ in range(count)]
    rng = random.Random(seed)
    while True:
        rng.shuffle(pool)
        yield from pool


def crop_generator(scenes, height, width):
    """Recognizer inputs: warpBox word crops from the SAME scene pipe."""
    for scene, lines, _ in scenes:
        for box, word in words_of(lines):
            crop = tools.warpBox(
                scene, box.astype("float32"),
                target_height=height, target_width=width,
            )
            yield crop, word


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--detector-steps", type=int, default=200)
    parser.add_argument("--recognizer-steps", type=int, default=1200)
    parser.add_argument("--pool-scenes", type=int, default=300)
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--eval-scenes", type=int, default=32)
    parser.add_argument("--size", type=int, default=256)
    parser.add_argument("--output", default="e2e_synthetic_results.json")
    args = parser.parse_args()

    # ---- detector ----
    detector = Detector(weights=None, max_components=32)
    det_batches = detector.get_batch_generator(
        pooled(scene_generator(args.size, args.size, seed=0), args.pool_scenes, 1),
        batch_size=args.batch_size,
    )
    det_trainer = DetectorTrainer(detector)
    for step in range(args.detector_steps):
        X, y = next(det_batches)[:2]
        loss = det_trainer.train_step((X, y))
        if (step + 1) % max(1, args.detector_steps // 4) == 0:
            print(f"detector step {step + 1}: loss {loss:.6f}", flush=True)
    detector.variables = det_trainer.variables

    # ---- recognizer ----
    # From-scratch synthetic training: the STN is disabled (a randomly
    # initialized localization net warps crops chaotically and stalls
    # CTC training; the pretrained path keeps stn=True as in the
    # reference) and adam replaces the reference's RMSprop default —
    # the recipe validated by scripts/smoke_train_synthetic.py.
    build_params = dict(recognizer_build_params())
    recognizer = Recognizer(
        weights=None, alphabet=ALPHABET, build_params=build_params
    )
    height, width, _ = recognizer.input_shape
    rec_batches = recognizer.get_batch_generator(
        pooled(
            crop_generator(
                scene_generator(args.size, args.size, seed=7), height, width
            ),
            args.pool_scenes * 3 // 2,
            2,
        ),
        batch_size=max(args.batch_size, 32),
    )
    import jax
    import optax

    rec_trainer = RecognizerTrainer(recognizer, optimizer=optax.adam(1e-3))

    for step in range(args.recognizer_steps):
        batch = next(rec_batches)
        loss = rec_trainer.train_step(batch, jax.random.PRNGKey(step))
        if (step + 1) % max(1, args.recognizer_steps // 4) == 0:
            print(f"recognizer step {step + 1}: loss {loss:.4f}", flush=True)
    recognizer.variables = jax.device_get(rec_trainer.variables)

    # ---- end-to-end benchmark on held-out scenes ----
    # scale=1: the detector was trained at native scene resolution, and
    # CNNs are not scale-invariant — the reference's scale=2 default
    # exists to enlarge small real-world text, which synthetic scenes
    # don't need. (The scale knob is exercised by the pipeline tests.)
    pipeline = Pipeline(
        detector=detector, recognizer=recognizer, scale=1,
        pad_to=(args.size, args.size), max_words=16,
    )
    held_out = scene_generator(args.size, args.size, seed=12345)
    true, pred = {}, {}
    import time

    latencies = []
    for index in range(args.eval_scenes):
        scene, lines, _ = next(held_out)
        key = f"scene-{index}"
        true[key] = [
            {"text": word, "vertices": box, "ignore": False}
            for box, word in words_of(lines)
        ]
        start = time.perf_counter()
        predictions = pipeline.recognize(images=[scene])[0]
        latencies.append(time.perf_counter() - start)
        pred[key] = [{"text": w, "vertices": b} for w, b in predictions]

    _, (precision, recall) = evaluation.score(
        true, pred, iou_threshold=0.5, similarity_threshold=0.5
    )
    # Detector-only diagnostic so recognition and localization failures
    # are attributable separately.
    from keras_ocr_tpu.evaluation import iou_score

    det_hits = det_total = 0
    for key in true:
        for ann in true[key]:
            det_total += 1
            if any(
                iou_score(ann["vertices"], p["vertices"]) >= 0.5
                for p in pred[key]
            ):
                det_hits += 1
    print(
        f"detector-only recall@IoU0.5: {det_hits}/{det_total};"
        f" sample predictions: {[p['text'] for p in pred['scene-0']]}"
        f" vs truth {[a['text'] for a in true['scene-0']]}",
        flush=True,
    )
    result = {
        "n_scenes": args.eval_scenes,
        "precision": round(precision, 4),
        "recall": round(recall, 4),
        "p50_latency_ms": round(float(np.median(latencies)) * 1000, 2),
        "detector_steps": args.detector_steps,
        "recognizer_steps": args.recognizer_steps,
    }
    print(json.dumps(result))
    with open(args.output, "w", encoding="utf8") as f:
        json.dump(result, f, indent=2)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
