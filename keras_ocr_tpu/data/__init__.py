"""Data subsystem: synthetic generation, dataset loaders, augmentation, targets."""

from . import augmentation
from . import datasets
from . import detection_targets
from . import generation
