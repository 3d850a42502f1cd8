from studiosr_tpu.serving.hat_fast import hat_fast_forward
from studiosr_tpu.serving.swinir_fast import swinir_fast_forward

__all__ = ["hat_fast_forward", "swinir_fast_forward"]
