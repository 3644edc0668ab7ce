"""Synthetic data generation (facade re-exporting keras_ocr_tpu.data.generation).

API parity with /root/reference/keras_ocr/data_generation.py.
"""

from .data.generation import (  # noqa: F401
    LIGATURES,
    LIGATURE_STRING,
    get_rotation_matrix,
    get_maximum_uniform_contour,
    font_supports_alphabet,
    get_text_generator,
    get_backgrounds,
    get_fonts,
    convert_lines_to_paragraph,
    convert_image_generator_to_recognizer_input,
    draw_text_image,
    compute_transformed_contour,
    get_image_generator,
)
from .data.detection_targets import compute_maps, map_to_rgb  # noqa: F401
