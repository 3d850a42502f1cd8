from studiosr_tpu.serving.hat_fast import hat_fast_forward
from studiosr_tpu.serving.swinir_fast import prepare_serving, swinir_fast_forward

__all__ = ["hat_fast_forward", "prepare_serving", "swinir_fast_forward"]
