"""Dataset loaders (facade re-exporting keras_ocr_tpu.data.datasets).

API parity with /root/reference/keras_ocr/datasets.py.
"""

from .data.datasets import (  # noqa: F401
    get_cocotext_recognizer_dataset,
    get_born_digital_recognizer_dataset,
    get_icdar_2013_recognizer_dataset,
    get_icdar_2013_detector_dataset,
    get_icdar_2019_semisupervised_dataset,
    get_detector_image_generator,
    get_recognizer_image_generator,
)
