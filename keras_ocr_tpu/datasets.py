"""Dataset loaders facade. Implemented in data/datasets.py."""
