"""studiosr_tpu — a TPU-native (JAX/XLA/Pallas) super-resolution framework.

From-scratch rebuild of the capabilities of StudioSR (veritross/studiosr)
designed for TPU hardware: NHWC models compiled with XLA, fused Pallas
window-attention kernels, mesh-sharded data-parallel training, and an
on-device evaluation protocol.
"""

__version__ = "0.1.0"

from studiosr_tpu.data import DF2K, DIV2K, Flickr2K, PairedImageDataset  # noqa: F401
from studiosr_tpu.data.handler import DataHandler, DataIterator  # noqa: F401
from studiosr_tpu.engine import *  # noqa: F401,F403
from studiosr_tpu.models import (  # noqa: F401
    EDSR,
    ESPCN,
    HAN,
    HAT,
    IMDN,
    MaxSR,
    Model,
    RCAN,
    SRCNN,
    SRResNet,
    SwinFIR,
    SwinIR,
    VDSR,
)
from studiosr_tpu.utils import *  # noqa: F401,F403
from studiosr_tpu.utils.compare import compare  # noqa: F401
