"""On-device (XLA) kernels: image ops, connected components, heatmap
post-processing, perspective warps, and CTC."""

from . import cc
from . import cc_pallas
from . import conv_pallas
from . import ctc
from . import image
from . import postprocess
from . import warp
