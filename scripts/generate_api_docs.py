"""Generate docs/api.md from the package's docstrings.

The markdown analog of the reference's Sphinx-autodoc API page
(/root/reference/docs/api.rst — Detector, Recognizer, data_generation,
tools, datasets), extended with the TPU-native modules this framework
adds (pipeline, evaluation, ops, train, parallel, weights, config).
Run offline: ``python scripts/generate_api_docs.py`` rewrites docs/api.md.
"""

import inspect
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SECTIONS = [
    (
        "Core Detector and Recognizer",
        "The detector and recognizer classes are the core of the package; "
        "they wrap the underlying Flax models and the fused device kernels.",
        [
            ("keras_ocr_tpu.detection", ["Detector"]),
            ("keras_ocr_tpu.recognition", ["Recognizer"]),
        ],
    ),
    (
        "Pipeline",
        "End-to-end inference: one fused XLA program from image batch to "
        "(word, box) pairs, plus AOT export for serving.",
        [
            (
                "keras_ocr_tpu.pipeline",
                ["Pipeline", "ExportedPipeline", "load_exported"],
            )
        ],
    ),
    (
        "Data Generation",
        "Synthetic training data: fonts, backgrounds, and rendered scenes.",
        [("keras_ocr_tpu.data.generation", None)],
    ),
    (
        "Tools",
        "Convenience functions for reading images, geometry, drawing, and "
        "downloading assets.",
        [("keras_ocr_tpu.tools", None)],
    ),
    (
        "Datasets",
        "Loaders for public datasets (COCO-Text, BornDigital, ICDAR) and "
        "the detector/recognizer image generators.",
        [("keras_ocr_tpu.data.datasets", None)],
    ),
    (
        "Evaluation",
        "Polygon-IoU + edit-distance precision/recall scoring.",
        [("keras_ocr_tpu.evaluation", None)],
    ),
    (
        "Training",
        "Mesh-data-parallel trainers, checkpointing, and Keras-style "
        "callbacks.",
        [
            ("keras_ocr_tpu.train.detector", ["DetectorTrainer", "ohem_mse_loss"]),
            ("keras_ocr_tpu.train.recognizer", ["RecognizerTrainer"]),
            ("keras_ocr_tpu.train.checkpoint", None),
            ("keras_ocr_tpu.train.callbacks", None),
        ],
    ),
    (
        "Parallelism",
        "Device meshes (ICI/DCN), shardings, and collectives helpers.",
        [("keras_ocr_tpu.parallel.mesh", None)],
    ),
    (
        "Weights",
        "Pretrained-weight download/verification and the Keras ``.h5`` / "
        "PyTorch ``.pth`` converters, both directions.",
        [
            ("keras_ocr_tpu.weights", None),
            ("keras_ocr_tpu.weights.export", None),
        ],
    ),
    (
        "Configuration",
        "Runtime configuration (dtype policy, memory fraction, compile "
        "cache).",
        [("keras_ocr_tpu.config", None)],
    ),
]


def first_paragraph(obj):
    doc = inspect.getdoc(obj) or ""
    return doc.split("\n\n")[0].strip()


def public_members(module, names):
    if names is not None:
        return [(n, getattr(module, n)) for n in names]
    members = []
    for name in sorted(vars(module)):
        if name.startswith("_"):
            continue
        obj = vars(module)[name]
        if not (inspect.isfunction(obj) or inspect.isclass(obj)):
            continue
        if getattr(obj, "__module__", None) != module.__name__:
            continue
        members.append((name, obj))
    return members


def signature(obj):
    try:
        return str(inspect.signature(obj))
    except (TypeError, ValueError):
        return "(...)"


def render_member(module_name, name, obj, out):
    kind = "class" if inspect.isclass(obj) else "function"
    out.append(f"### `{module_name}.{name}`\n")
    out.append(f"```python\n{name}{signature(obj)}\n```\n")
    para = first_paragraph(obj)
    if para:
        out.append(para + "\n")
    if inspect.isclass(obj):
        for mname in sorted(vars(obj)):
            if mname.startswith("_"):
                continue
            method = vars(obj)[mname]
            if not inspect.isfunction(method):
                continue
            out.append(f"- **`.{mname}{signature(method)}`** — ")
            out.append((first_paragraph(method) or "").split("\n")[0] + "\n")
    out.append("")
    return kind


def main(argv=None):
    import argparse
    import importlib

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        "--check",
        action="store_true",
        help="exit 1 if docs/api.md differs from what would be generated "
        "(CI drift guard) instead of writing it",
    )
    args = parser.parse_args(argv)

    out = [
        "# API reference",
        "",
        "Generated from docstrings by `scripts/generate_api_docs.py`;",
        "regenerate after changing public signatures. The section layout",
        "mirrors the reference's Sphinx API page",
        "(reference docs/api.rst) with the TPU-native additions.",
        "",
    ]
    for title, blurb, modules in SECTIONS:
        out.append(f"## {title}\n")
        out.append(blurb + "\n")
        for module_name, names in modules:
            module = importlib.import_module(module_name)
            for name, obj in public_members(module, names):
                render_member(module_name, name, obj, out)
    path = os.path.join(REPO, "docs", "api.md")
    content = "\n".join(out).rstrip() + "\n"
    if args.check:
        try:
            with open(path, encoding="utf8") as f:
                current = f.read()
        except OSError:
            current = None
        if current != content:
            print(
                f"{path} is stale: run `python scripts/generate_api_docs.py` "
                "and commit the result"
            )
            return 1
        print(f"{path} is up to date")
        return 0
    with open(path, "w", encoding="utf8") as f:
        f.write(content)
    print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
