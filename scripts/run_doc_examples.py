"""Execute the offline-runnable code blocks in docs/examples/*.md.

Each worked example carries at least one ```python fenced block whose
first line is ``# offline-runnable``: a scaled-down variant of the
example that needs no network, no pretrained weights, and finishes in
minutes. This runner extracts those blocks (per file, in order, sharing
one namespace so later blocks can use earlier results) and executes them
in a scratch directory, failing loudly on any exception — the executable
analog of the reference's doc examples (reference
docs/examples/*.rst), kept green by `make doc-examples`.

Usage: python scripts/run_doc_examples.py [file.md ...]
"""

import os
import pathlib
import re
import sys
import tempfile

MARKER = "# offline-runnable"
FENCE = re.compile(r"```python\n(.*?)```", re.DOTALL)


def offline_blocks(markdown_text):
    return [
        block
        for block in FENCE.findall(markdown_text)
        if block.lstrip().startswith(MARKER)
    ]


def run_file(path):
    blocks = offline_blocks(path.read_text(encoding="utf8"))
    if not blocks:
        print(f"SKIP {path} (no {MARKER} blocks)")
        return True
    namespace = {"__name__": "__main__"}
    for index, block in enumerate(blocks):
        print(f"RUN  {path} block {index + 1}/{len(blocks)}")
        try:
            exec(compile(block, f"{path}[{index}]", "exec"), namespace)
        except Exception:
            import traceback

            traceback.print_exc()
            print(f"FAIL {path} block {index + 1}")
            return False
    print(f"PASS {path}")
    return True


def main():
    repo_root = pathlib.Path(__file__).resolve().parent.parent
    # The examples import keras_ocr_tpu; make the in-repo package importable
    # even when it is not pip-installed (sys.path[0] is scripts/, and the
    # runner chdirs to a scratch directory below).
    sys.path.insert(0, str(repo_root))
    arguments = sys.argv[1:]
    files = (
        [pathlib.Path(a).resolve() for a in arguments]
        if arguments
        else sorted((repo_root / "docs" / "examples").glob("*.md"))
    )
    with tempfile.TemporaryDirectory(prefix="doc_examples_") as scratch:
        os.chdir(scratch)
        ok = all([run_file(path) for path in files])
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
