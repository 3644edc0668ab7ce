# Development targets (mirrors the reference's Makefile surface:
# init/format/lint/type-check/test/docs — reference Makefile:22-59).

PYTHON ?= python

.PHONY: init format format-check lint-check type-check test test-all test-tpu doc-examples bench golden-artifact native docs docs-check clean

init:
	$(PYTHON) -m pip install -e . --no-deps --no-build-isolation

# Checks FAIL when their tool reports problems. When a tool is not
# installed (this image bundles none of them), format/type checks skip
# with a notice and lint falls back to the bundled AST checker — the
# fallback still exits nonzero on findings, so `make lint-check` can
# fail everywhere.
format:
	$(PYTHON) -m black keras_ocr_tpu tests scripts bench.py __graft_entry__.py

format-check:
	@if $(PYTHON) -c "import black" 2>/dev/null; then \
		$(PYTHON) -m black --check keras_ocr_tpu tests scripts bench.py __graft_entry__.py; \
	else \
		echo "black not installed; skipping format check"; \
	fi

lint-check:
	@if $(PYTHON) -c "import pyflakes" 2>/dev/null; then \
		$(PYTHON) -m pyflakes keras_ocr_tpu tests scripts bench.py __graft_entry__.py; \
	else \
		$(PYTHON) scripts/lint_ast.py keras_ocr_tpu tests scripts bench.py __graft_entry__.py; \
	fi

type-check:
	@if $(PYTHON) -c "import mypy" 2>/dev/null; then \
		$(PYTHON) -m mypy --ignore-missing-imports keras_ocr_tpu; \
	else \
		echo "mypy not installed; skipping type check"; \
	fi

# Fast suite: excludes tests marked `slow` (fused-pipeline / mesh-training
# compiles) so a cold CI run stays in minutes; `test-all` runs everything.
test:
	$(PYTHON) -m pytest tests/ -x -q -m "not slow"

# Note: the suite defaults to NO persistent compile cache (a jaxlib
# XLA:CPU AOT reload bug SIGSEGVs on some environments — see
# tests/conftest.py). On a trusted environment, speed the slow suite up
# ~3x with: KERAS_OCR_TPU_TEST_CACHE="$$(mktemp -d)" make test-all
test-all:
	$(PYTHON) -m pytest tests/ -x -q

# Execute the offline-runnable blocks in docs/examples/*.md (the
# executable analog of the reference's worked examples).
doc-examples:
	$(PYTHON) scripts/run_doc_examples.py

# Run the suite against the real TPU chip (slow: per-shape compiles).
test-tpu:
	JAX_PLATFORM_NAME= JAX_PLATFORMS=axon $(PYTHON) -m pytest tests/ -q

bench:
	$(PYTHON) bench.py

# Rebuild the committed hermetic golden artifact (run on a TPU; trains
# the slim models from scratch and verifies the artifact from disk).
golden-artifact:
	$(PYTHON) scripts/make_golden_artifact.py

docs-check:
	$(PYTHON) scripts/generate_api_docs.py --check

native:
	g++ -O3 -shared -fPIC -o keras_ocr_tpu/_native/libhostops.so csrc/hostops.cpp

docs:
	$(PYTHON) scripts/generate_api_docs.py
	@echo "Docs are plain markdown under docs/ (api.md regenerated)."

clean:
	rm -rf keras_ocr_tpu/_native .pytest_cache
	find . -name __pycache__ -type d -exec rm -rf {} +
