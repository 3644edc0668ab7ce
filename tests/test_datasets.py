"""Offline tests for dataset-loader parsing and download-failure handling.

The archives themselves need network; the parsing logic — the part that
determines what training actually sees — is pure and tested here against
handcrafted fixtures in the published formats
(reference /root/reference/keras_ocr/datasets.py).
"""

import itertools
import json
import zipfile

import numpy as np

from keras_ocr_tpu import tools
from keras_ocr_tpu.data import datasets


def test_born_digital_labels_parsing(tmp_path):
    gt = tmp_path / "gt.txt"
    # utf-8-sig with a BOM, quoted labels, a comma inside a label.
    gt.write_bytes(
        "﻿".encode("utf8")
        + b'word_1.png, "Alpha"\nword_2.png, "with, comma"\nword_3.png, ""\n'
    )
    labels = datasets._read_born_digital_labels_file(str(gt), "/imgs")
    assert labels[0] == ("/imgs/word_1.png", None, "Alpha")
    assert labels[1] == ("/imgs/word_2.png", None, "with, comma")
    assert labels[2] == ("/imgs/word_3.png", None, "")


def test_icdar_2013_gt_parsing():
    text = (
        '1 2 3 10 10 0 0 5 9 "h"\n'
        '1 2 3 10 10 6 0 11 9 "i"\n'
        "\n"
        '1 2 3 10 10 0 20 5 29 ""\n'
        '1 2 3 10 10 6 20 11 29 "x"\n'
        "\n"
    )
    lines = datasets._parse_icdar_2013_gt(text)
    assert len(lines) == 2
    assert [c for _, c in lines[0]] == ["h", "i"]
    np.testing.assert_array_equal(lines[0][0][0], [[0, 0], [5, 0], [5, 9], [0, 9]])
    # Illegible characters ('""') kept by default, skipped on request.
    assert [c for _, c in lines[1]] == ["", "x"]
    skipped = datasets._parse_icdar_2013_gt(text, skip_illegible=True)
    assert [c for _, c in skipped[1]] == ["x"]


def _fake_cocotext_fixture(tmp_path, n_images=3):
    """A tiny cocotext.v2.zip + image files in the published schema."""
    imgs = {
        str(100 + i): {"file_name": f"COCO_train2014_{i:012d}.jpg", "set": "val"}
        for i in range(n_images)
    }
    anns = {}
    img_to_anns = {}
    for i, cocoid in enumerate(imgs):
        ann_id = 500 + i
        anns[str(ann_id)] = {
            "mask": [0, 0, 10, 0, 10, 5, 0, 5],
            "utf8_string": f"word{i}",
            "legibility": "legible" if i % 2 == 0 else "illegible",
            "language": "english",
        }
        img_to_anns[cocoid] = [ann_id]
    labels = {"imgs": imgs, "anns": anns, "imgToAnns": img_to_anns}
    zip_path = tmp_path / "cocotext.v2.zip"
    with zipfile.ZipFile(zip_path, "w") as z:
        z.writestr("cocotext.v2.json", json.dumps(labels))
    return zip_path, labels


def test_cocotext_loader_drops_failed_downloads(tmp_path, monkeypatch):
    zip_path, _ = _fake_cocotext_fixture(tmp_path)
    real_download = tools.download_and_verify

    def fake_download(url, sha256=None, cache_dir=None, verbose=True, **kwargs):
        if url.endswith(".zip"):
            return str(zip_path)
        filename = url.rsplit("/", 1)[-1]
        if filename.endswith("000001.jpg"):
            raise OSError("simulated 404")
        import os

        os.makedirs(cache_dir, exist_ok=True)
        path = os.path.join(cache_dir, filename)
        with open(path, "wb") as f:
            f.write(b"fake-jpeg-bytes")
        return path

    monkeypatch.setattr(tools, "download_and_verify", fake_download)
    try:
        dataset, (labels, images_dir) = datasets.get_cocotext_recognizer_dataset(
            split="val", cache_dir=str(tmp_path / "cache"), return_raw_labels=True
        )
    finally:
        monkeypatch.setattr(tools, "download_and_verify", real_download)
    # Image 1 failed to download: pruned from dataset AND raw labels —
    # including its annotations, so return_raw_labels callers never see
    # anns for images that are not on disk.
    assert len(labels["imgs"]) == 2
    assert all(not f["file_name"].endswith("000001.jpg") for f in labels["imgs"].values())
    kept_anns = set(
        itertools.chain.from_iterable(labels["imgToAnns"].values())
    )
    assert {int(k) for k in labels["anns"]} == kept_anns
    words = sorted(word for _, _, word in dataset)
    assert words == ["word0", "word2"]


def test_cocotext_loader_filters(tmp_path, monkeypatch):
    zip_path, _ = _fake_cocotext_fixture(tmp_path)

    def fake_download(url, sha256=None, cache_dir=None, verbose=True, **kwargs):
        if url.endswith(".zip"):
            return str(zip_path)
        import os

        os.makedirs(cache_dir, exist_ok=True)
        path = os.path.join(cache_dir, url.rsplit("/", 1)[-1])
        with open(path, "wb") as f:
            f.write(b"fake")
        return path

    monkeypatch.setattr(tools, "download_and_verify", fake_download)
    dataset = datasets.get_cocotext_recognizer_dataset(
        split="val", cache_dir=str(tmp_path / "cache2"), legible_only=True
    )
    # Odd-indexed fixtures are illegible.
    assert sorted(w for _, _, w in dataset) == ["word0", "word2"]
    limited = datasets.get_cocotext_recognizer_dataset(
        split="val", cache_dir=str(tmp_path / "cache2"), limit=1
    )
    assert len(limited) == 1
