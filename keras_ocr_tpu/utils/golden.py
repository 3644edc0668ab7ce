"""Hermetic golden-quality check from a committed offline artifact.

The reference's load-bearing quality test is a golden end-to-end
assertion with MEANINGFUL weights (tests/test_pipeline.py:19-20 — one
box, text == "eventdock"). Its analog here cannot rely on the pretrained
downloads (the bench environment has had dead DNS every round), so the
repo commits a small self-contained artifact instead
(tests/fixtures/golden_offline/, built by scripts/make_golden_artifact.py):

* slim CRAFT (``Detector(width=...)``) + slim CRNN checkpoints trained
  offline on the hard synthetic distribution, stored as f16 .npz (a few
  MB total);
* 12-16 fixture scene PNGs rendered from a held-out seed;
* ``expected.json``: the words the trained pipeline reads on each scene
  (its own verified behavior, like "eventdock" is the reference model's),
  plus the ground truth for context.

:func:`run_golden_check` rebuilds the pipeline from the artifact and
asserts the expected words are still read — an end-to-end
meaningful-weights pass/fail that works with zero network.
"""

from __future__ import annotations

import json
import os
import typing

META_NAME = "meta.json"
EXPECTED_NAME = "expected.json"
DETECTOR_NAME = "detector_slim.npz"
RECOGNIZER_NAME = "recognizer_slim.npz"


def artifact_available(artifact_dir: str) -> bool:
    return all(
        os.path.isfile(os.path.join(artifact_dir, name))
        for name in (META_NAME, EXPECTED_NAME, DETECTOR_NAME, RECOGNIZER_NAME)
    )


def load_golden_pipeline(artifact_dir: str, compute_dtype=None):
    """(pipeline, meta) rebuilt from the committed artifact files."""
    import jax.numpy as jnp

    from ..detection import Detector
    from ..pipeline import Pipeline
    from ..recognition import Recognizer
    from ..train.checkpoint import restore_npz

    with open(os.path.join(artifact_dir, META_NAME), encoding="utf8") as f:
        meta = json.load(f)
    if compute_dtype is None:
        compute_dtype = jnp.float32
    detector = Detector(
        weights=None,
        width=meta["detector_width"],
        max_components=meta["max_components"],
        compute_dtype=compute_dtype,
    )
    detector.variables = restore_npz(os.path.join(artifact_dir, DETECTOR_NAME))
    recognizer = Recognizer(
        weights=None,
        alphabet=meta["alphabet"],
        build_params=dict(meta["recognizer_build_params"]),
        compute_dtype=compute_dtype,
    )
    recognizer.variables = restore_npz(
        os.path.join(artifact_dir, RECOGNIZER_NAME)
    )
    pipeline = Pipeline(
        detector=detector,
        recognizer=recognizer,
        scale=meta["scale"],
        pad_to=tuple(meta["pad_to"]),
        max_words=meta["max_words"],
    )
    return pipeline, meta


def _word_match_fraction(expected_words, predicted_words) -> float:
    """Fraction of expected words found (multiset semantics)."""
    remaining = list(predicted_words)
    hits = 0
    for word in expected_words:
        if word in remaining:
            remaining.remove(word)
            hits += 1
    return hits / max(len(expected_words), 1)


def run_golden_check(
    artifact_dir: str,
    compute_dtype=None,
    pipeline=None,
) -> typing.Dict[str, typing.Any]:
    """Run the committed scenes through the artifact pipeline and score.

    Returns {"fraction", "n_scenes", "n_words", "pass", "per_scene"}:
    ``fraction`` is the overall expected-word reproduction rate and
    ``pass`` applies the artifact's own threshold (meta["pass_fraction"],
    slack for bf16/hardware variation — the artifact is verified at 1.0
    on creation).
    """
    from .. import tools

    with open(os.path.join(artifact_dir, EXPECTED_NAME), encoding="utf8") as f:
        expected = json.load(f)
    if pipeline is None:
        pipeline, meta = load_golden_pipeline(artifact_dir, compute_dtype)
    else:
        with open(os.path.join(artifact_dir, META_NAME), encoding="utf8") as f:
            meta = json.load(f)

    per_scene = []
    total_hits = 0.0
    total_words = 0
    for entry in expected["scenes"]:
        image = tools.read(os.path.join(artifact_dir, entry["image"]))
        predictions = pipeline.recognize(images=[image])[0]
        predicted_words = [word for word, _ in predictions]
        fraction = _word_match_fraction(entry["words"], predicted_words)
        per_scene.append(
            {
                "image": entry["image"],
                "fraction": round(fraction, 4),
                "predicted": predicted_words,
            }
        )
        total_hits += fraction * len(entry["words"])
        total_words += len(entry["words"])
    overall = total_hits / max(total_words, 1)
    return {
        "fraction": round(overall, 4),
        "n_scenes": len(per_scene),
        "n_words": total_words,
        "pass": overall >= meta["pass_fraction"],
        "per_scene": per_scene,
    }
