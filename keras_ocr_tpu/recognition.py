"""Recognizer facade (CRNN). Implemented in models/crnn.py + ops/ctc.py."""
