"""keras_ocr_tpu: a TPU-native (JAX/XLA/Flax/Pallas) scene-text OCR framework.

Provides the same capabilities as the reference ``keras-ocr`` package
(reference: /root/reference/keras_ocr/__init__.py:1-12) — a CRAFT text
detector plus CRNN recognizer pipeline with synthetic data generation,
dataset loaders, training, and evaluation — rebuilt TPU-first: models are
Flax modules compiled by XLA, detection post-processing / perspective
cropping / CTC decoding run on-device, and training scales over
``jax.sharding.Mesh`` data-parallel shardings instead of
``tf.distribute.MirroredStrategy``.
"""

from . import config

# NOTE: the persistent XLA compile cache is enabled lazily at
# Detector/Recognizer construction (see detection.py / recognition.py), not
# at import: mutating global jax.config as an import side effect would
# override embedding applications' own configuration.

from . import tools  # noqa: E402
from . import evaluation
from . import ops
from . import models
from . import weights
from . import detection
from . import recognition
from . import pipeline
from . import parallel
from . import data
from . import datasets
from . import data_generation

from .detection import Detector
from .recognition import Recognizer
from .pipeline import Pipeline

__version__ = "0.1.0"
