from studiosr_tpu.serving.swinir_fast import swinir_fast_forward

__all__ = ["swinir_fast_forward"]
