"""Utilities: profiling, tracing, timing."""

from . import profiling
from .profiling import StageTimer, trace, annotate
