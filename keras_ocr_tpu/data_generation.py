"""Synthetic data generation facade. Implemented in data/generation.py."""
