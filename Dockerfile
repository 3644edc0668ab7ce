# Container with pretrained weights pre-baked (the reference Dockerfile
# pre-caches weights into /root/.keras-ocr for hermetic runs).
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends g++ && \
    rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY . /app
RUN pip install --no-cache-dir "jax[tpu]" flax optax orbax-checkpoint \
        numpy pillow scipy h5py && \
    pip install --no-cache-dir -e . --no-deps

# Pre-bake pretrained weights into the cache.
RUN python -c "import keras_ocr_tpu; keras_ocr_tpu.Pipeline()" || true
