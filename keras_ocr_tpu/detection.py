"""Detector facade (CRAFT). Implemented in models/craft.py + ops/postprocess.py."""
