"""COCO-Text val-N end-to-end benchmark: precision/recall + latency.

Reproduces the reference's published benchmark protocol
(/root/reference/README.md:57-73, SURVEY.md §6): first N images of the
COCO-Text validation set; a prediction is a true positive when IoU >= 0.5
AND text similarity (1 - editdistance/maxlen) >= 0.5; case and punctuation
ignored; non-English and illegible annotations marked "ignore"; latency is
sequential single-image recognize() wall time.

Targets: P/R >= 0.53/0.54 at scale=2 (reference on Tesla P4: 417 ms).
"""

import argparse
import json
import os
import string
import sys
import time

import numpy as np

# Make the in-repo package importable when run as `python scripts/<name>.py`
# without a pip install (sys.path[0] is scripts/, not the repo root).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import keras_ocr_tpu
from keras_ocr_tpu import datasets, evaluation, tools


def build_ground_truth(limit):
    """{image_id: [{'text', 'vertices', 'ignore'}]} from COCO-Text val."""
    dataset, (labels, images_dir) = datasets.get_cocotext_recognizer_dataset(
        split="val", limit=limit, return_raw_labels=True
    )
    true = {}
    for cocoid in list(labels["imgs"])[:limit]:
        filepath = os.path.join(images_dir, labels["imgs"][cocoid]["file_name"])
        anns = []
        for ann_index in labels["imgToAnns"].get(cocoid, []):
            ann = labels["anns"][str(ann_index)]
            vertices = np.array(ann["mask"]).reshape(-1, 2)
            ignore = (
                ann["legibility"] != "legible" or ann["language"] != "english"
            )
            anns.append(
                {"text": ann["utf8_string"], "vertices": vertices, "ignore": ignore}
            )
        true[filepath] = anns
    return true


def build_synthetic_ground_truth(limit, seed=0):
    """Offline stand-in for COCO-Text: PIL-rendered words on blank scenes.

    Exercises the COMPLETE benchmark harness (rendering -> pipeline ->
    greedy-IoU/editdistance scoring) with known ground truth and no
    network; with pretrained or fine-tuned weights the P/R is meaningful,
    with random weights it smoke-tests the protocol.
    """
    from keras_ocr_tpu import tools as _tools
    from keras_ocr_tpu.data import generation

    rng = np.random.RandomState(seed)
    words = ["event", "dock", "open", "text", "craft", "read"]
    true = {}
    images = {}
    for index in range(limit):
        text = " ".join(rng.choice(words, size=2, replace=False))
        rendered, lines = generation.draw_text_image(
            text=text, fontsize=24, height=240, width=320,
            fonts={"".join(sorted(set(text))): None},
        )
        scene = np.full((240, 320, 3), 255, dtype="uint8")
        alpha = rendered[..., 3:4].astype("float32") / 255
        scene = (
            scene * (1 - alpha) + rendered[..., :3].astype("float32") * alpha
        ).astype("uint8")
        anns = []
        # Word-level ground truth via combine_line on each word's chars.
        for line in lines:
            word_chars = []
            for box, character in line:
                if character == " ":
                    if word_chars:
                        box_w, text_w = _tools.combine_line(word_chars)
                        anns.append(
                            {"text": text_w, "vertices": box_w, "ignore": False}
                        )
                    word_chars = []
                else:
                    word_chars.append((box, character))
            if word_chars:
                box_w, text_w = _tools.combine_line(word_chars)
                anns.append({"text": text_w, "vertices": box_w, "ignore": False})
        key = f"synthetic-{index}"
        true[key] = anns
        images[key] = scene
    return true, images


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--limit", type=int, default=1000)
    parser.add_argument("--scale", type=int, default=2)
    parser.add_argument("--max-size", type=int, default=2048)
    parser.add_argument("--output", default="coco_text_results.json")
    parser.add_argument(
        "--synthetic", action="store_true",
        help="use offline PIL-rendered scenes instead of COCO-Text",
    )
    parser.add_argument(
        "--progress-every", type=int, default=100,
        help="write partial scored results to --output every N images "
        "(0 disables); a bounded-timeout kill then still leaves a valid "
        "prefix P/R on disk",
    )
    args = parser.parse_args()

    if args.synthetic:
        true, images = build_synthetic_ground_truth(args.limit)
    else:
        true = build_ground_truth(args.limit)
    # One static padded shape across the whole sweep: COCO images come in
    # many sizes and per-shape XLA compilation would otherwise dominate.
    if not args.synthetic:
        images = {filepath: tools.read(filepath) for filepath in true}
    pad_h = max(im.shape[0] for im in images.values())
    pad_w = max(im.shape[1] for im in images.values())
    import urllib.error

    weights_provenance = "pretrained"
    # Dense benchmark scenes (signage, storefronts) can exceed the default
    # 64-word cap; give the ladder headroom so truncation can't cost recall.
    pipeline_kwargs = dict(
        scale=args.scale,
        max_size=args.max_size,
        pad_to=(pad_h, pad_w),
        max_words=128,
        word_buckets=(16, 64, 128),
    )
    try:
        pipeline = keras_ocr_tpu.Pipeline(**pipeline_kwargs)
    except (urllib.error.URLError, OSError, ValueError, RuntimeError) as exc:
        # ValueError: sha256 mismatch from tools.download_and_verify;
        # RuntimeError: weights.download_pretrained exhausted every source.
        # Weight download/verify failed — fall back to random weights so
        # the PROTOCOL can still be smoke-tested offline, but say so loudly
        # and stamp the output: a random-weight P/R is NOT a benchmark.
        print(
            f"WARNING: pretrained weights unavailable ({type(exc).__name__}: "
            f"{exc}); falling back to RANDOM weights — the reported P/R is "
            "a protocol smoke test, not a quality benchmark.",
            file=sys.stderr,
        )
        weights_provenance = "random"
        from keras_ocr_tpu.detection import Detector
        from keras_ocr_tpu.recognition import Recognizer

        pipeline = keras_ocr_tpu.Pipeline(
            detector=Detector(weights=None),
            recognizer=Recognizer(
                weights=None, alphabet=string.digits + string.ascii_lowercase
            ),
            **pipeline_kwargs,
        )

    translator = str.maketrans(
        string.ascii_uppercase, string.ascii_lowercase, string.punctuation
    )

    def score_and_write(pred, latencies, counters, done, partial):
        """Score the processed subset and (re)write the results file.

        Written after every --progress-every images so that a wall-clock
        kill of this process (the bench runs it under a bounded timeout)
        still leaves a valid partial P/R on disk instead of nothing —
        the protocol scores each image independently, so a prefix of the
        val set is a meaningful (if noisier) estimate.
        """
        _, (precision, recall) = evaluation.score(
            {k: true[k] for k in pred},
            pred,
            iou_threshold=0.5,
            similarity_threshold=0.5,
            translator=translator,
        )
        result = {
            "n_images": done,
            "n_images_requested": len(true),
            "scale": args.scale,
            "weights": weights_provenance,
            "synthetic": bool(args.synthetic),
            "precision": round(precision, 4),
            "recall": round(recall, 4),
            "p50_latency_ms": round(float(np.median(latencies)) * 1000, 2),
            "mean_latency_ms": round(float(np.mean(latencies)) * 1000, 2),
            "escalations": counters["escalations"],
            "truncated_images": counters["truncated"],
            "component_escalations": counters["component_escalations"],
        }
        if partial:
            result["partial"] = True
        tmp_path = args.output + ".tmp"
        with open(tmp_path, "w", encoding="utf8") as f:
            json.dump(result, f, indent=2)
        os.replace(tmp_path, args.output)
        return result

    pred = {}
    latencies = []
    counters = {"escalations": 0, "truncated": 0, "component_escalations": 0}
    ordered = sorted(true)
    for done, filepath in enumerate(ordered, start=1):
        image = images[filepath]
        start = time.perf_counter()
        predictions = pipeline.recognize(images=[image])[0]
        latencies.append(time.perf_counter() - start)
        counters["escalations"] += pipeline.last_run_stats["escalations"]
        counters["truncated"] += pipeline.last_run_stats["truncated_images"]
        counters["component_escalations"] += pipeline.last_run_stats.get(
            "component_escalations", 0
        )
        pred[filepath] = [
            {"text": word, "vertices": box} for word, box in predictions
        ]
        if args.progress_every and done % args.progress_every == 0 and done < len(
            ordered
        ):
            interim = score_and_write(
                pred, latencies, counters, done, partial=True
            )
            print(
                f"progress {done}/{len(ordered)}: "
                f"P={interim['precision']} R={interim['recall']}",
                file=sys.stderr,
            )

    result = score_and_write(pred, latencies, counters, len(ordered), partial=False)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
