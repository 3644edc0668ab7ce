"""Training subsystem: SPMD trainers, callbacks, checkpointing."""

from . import callbacks
from . import checkpoint
from .detector import DetectorTrainer
from .recognizer import RecognizerTrainer
