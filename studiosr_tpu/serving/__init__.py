from studiosr_tpu.serving.edsr_fast import edsr_fast_forward
from studiosr_tpu.serving.hat_fast import hat_fast_forward
from studiosr_tpu.serving.swinir_fast import swinir_fast_forward

__all__ = ["edsr_fast_forward", "hat_fast_forward", "swinir_fast_forward"]
