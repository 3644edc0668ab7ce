# Development targets (mirrors the reference's Makefile surface:
# init/format/lint/type-check/test/docs — reference Makefile:22-59).

PYTHON ?= python

.PHONY: init format format-check lint-check type-check test test-tpu bench native docs clean

init:
	$(PYTHON) -m pip install -e . --no-deps --no-build-isolation

format:
	$(PYTHON) -m black keras_ocr_tpu tests scripts bench.py __graft_entry__.py || true

format-check:
	$(PYTHON) -m black --check keras_ocr_tpu tests scripts || true

lint-check:
	$(PYTHON) -m pyflakes keras_ocr_tpu scripts || $(PYTHON) -m flake8 --select=F keras_ocr_tpu scripts || true

type-check:
	$(PYTHON) -m mypy --ignore-missing-imports keras_ocr_tpu || true

test:
	$(PYTHON) -m pytest tests/ -x -q

# Run the suite against the real TPU chip (slow: per-shape compiles).
test-tpu:
	JAX_PLATFORM_NAME= JAX_PLATFORMS=axon $(PYTHON) -m pytest tests/ -q

bench:
	$(PYTHON) bench.py

native:
	g++ -O3 -shared -fPIC -o keras_ocr_tpu/_native/libhostops.so csrc/hostops.cpp

docs:
	@echo "Docs are plain markdown under docs/."

clean:
	rm -rf keras_ocr_tpu/_native .pytest_cache
	find . -name __pycache__ -type d -exec rm -rf {} +
