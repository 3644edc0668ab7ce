"""Model zoo: CRAFT detector, CRNN recognizer, EfficientNet backbones."""

from . import craft
from . import crnn
from . import efficientnet
from .craft import CRAFT
from .crnn import CRNN
