from studiosr_tpu.models.base import Model
from studiosr_tpu.models.edsr import EDSR

__all__ = ["Model", "EDSR"]
