from studiosr_tpu.models.base import Model
from studiosr_tpu.models.edsr import EDSR
from studiosr_tpu.models.espcn import ESPCN
from studiosr_tpu.models.han import HAN
from studiosr_tpu.models.hat import HAT
from studiosr_tpu.models.imdn import IMDN
from studiosr_tpu.models.maxsr import MaxSR
from studiosr_tpu.models.rcan import RCAN
from studiosr_tpu.models.srcnn import SRCNN
from studiosr_tpu.models.srresnet import SRResNet
from studiosr_tpu.models.swinfir import SwinFIR
from studiosr_tpu.models.swinir import SwinIR
from studiosr_tpu.models.vdsr import VDSR

__all__ = [
    "Model",
    "EDSR",
    "ESPCN",
    "HAN",
    "HAT",
    "IMDN",
    "MaxSR",
    "RCAN",
    "SRCNN",
    "SRResNet",
    "SwinFIR",
    "SwinIR",
    "VDSR",
]
