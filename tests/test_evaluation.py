"""Tests for the evaluation module.

Covers the reference's evaluation tests
(/root/reference/tests/test_evaluation.py:4-10: 0.25-overlap and disjoint
boxes) plus the Levenshtein DP and the full score() bucketing.
"""

import numpy as np
import pytest

from keras_ocr_tpu import evaluation


def test_iou_quarter_overlap():
    box1 = np.array([[0, 0], [10, 0], [10, 10], [0, 10]])
    box2 = np.array([[5, 5], [15, 5], [15, 15], [5, 15]])
    # intersection 25, union 175
    assert evaluation.iou_score(box1, box2) == pytest.approx(25 / 175)


def test_iou_disjoint():
    box1 = np.array([[0, 0], [10, 0], [10, 10], [0, 10]])
    box2 = np.array([[20, 20], [30, 20], [30, 30], [20, 30]])
    assert evaluation.iou_score(box1, box2) == 0


def test_iou_identical():
    box = np.array([[0, 0], [10, 0], [10, 10], [0, 10]])
    assert evaluation.iou_score(box, box) == pytest.approx(1.0)


def test_iou_two_point_format():
    box1 = [(0, 0), (10, 10)]
    box2 = [(0, 0), (10, 10)]
    assert evaluation.iou_score(box1, box2) == pytest.approx(1.0)


def test_iou_rotated():
    # 45-degree rotated square inscribed in an axis-aligned square is fully
    # contained: intersection = 50, union = 100.
    box1 = np.array([[0, 0], [10, 0], [10, 10], [0, 10]])
    box2 = np.array([[5, 0], [10, 5], [5, 10], [0, 5]])
    assert evaluation.iou_score(box1, box2) == pytest.approx(0.5, abs=1e-6)

    # Two unit-offset rotated squares: verify symmetry.
    box3 = box2 + np.array([2, 0])
    assert evaluation.iou_score(box2, box3) == pytest.approx(
        evaluation.iou_score(box3, box2), abs=1e-9
    )


def test_levenshtein():
    assert evaluation.levenshtein("kitten", "sitting") == 3
    assert evaluation.levenshtein("", "abc") == 3
    assert evaluation.levenshtein("abc", "abc") == 0
    assert evaluation.levenshtein("flaw", "lawn") == 2


def test_score_perfect():
    box = [[0, 0], [10, 0], [10, 10], [0, 10]]
    true = {"im": [{"text": "hello", "vertices": box}]}
    pred = {"im": [{"text": "hello", "vertices": box}]}
    results, (precision, recall) = evaluation.score(true, pred)
    assert precision == 1.0
    assert recall == 1.0
    assert len(results["true_positives"]) == 1


def test_score_near_match_and_fp():
    box = [[0, 0], [10, 0], [10, 10], [0, 10]]
    far_box = [[100, 100], [110, 100], [110, 110], [100, 110]]
    missed_box = [[200, 200], [210, 200], [210, 210], [200, 210]]
    true = {
        "im": [
            {"text": "hello", "vertices": box},
            {"text": "missed", "vertices": missed_box},
        ]
    }
    pred = {
        "im": [
            {"text": "zzzzz", "vertices": box},
            {"text": "spurious", "vertices": far_box},
        ]
    }
    results, (precision, recall) = evaluation.score(true, pred)
    assert len(results["near_true_positives"]) == 1
    assert len(results["false_positives"]) == 1
    assert len(results["false_negatives"]) == 1
    assert precision == 0.0
    assert recall == 0.0


def test_score_ignore():
    box = [[0, 0], [10, 0], [10, 10], [0, 10]]
    other = [[50, 50], [60, 50], [60, 60], [50, 60]]
    true = {
        "im": [
            {"text": "hello", "vertices": box, "ignore": True},
            {"text": "kept", "vertices": other},
        ]
    }
    pred = {
        "im": [
            {"text": "anything", "vertices": box},
            {"text": "kept", "vertices": other},
        ]
    }
    results, (precision, recall) = evaluation.score(true, pred)
    # Matched-but-ignored: not a TP, not an FP, not an FN; the other pair is a TP.
    assert len(results["true_positives"]) == 1
    assert len(results["false_positives"]) == 0
    assert len(results["false_negatives"]) == 0
    assert precision == 1.0
    assert recall == 1.0
