from studiosr_tpu.ops.pixel_shuffle import pixel_shuffle, pixel_unshuffle
from studiosr_tpu.ops.resize import bicubic_matrix, bicubic_resize, bicubic_upsample
from studiosr_tpu.ops.windows import (
    calculate_mask,
    pad_to_multiple_flip,
    pad_to_multiple_reflect,
    relative_position_index,
    relative_position_index_oca,
    window_partition,
    window_reverse,
)

__all__ = [
    "pixel_shuffle",
    "pixel_unshuffle",
    "bicubic_matrix",
    "bicubic_resize",
    "bicubic_upsample",
    "calculate_mask",
    "pad_to_multiple_flip",
    "pad_to_multiple_reflect",
    "relative_position_index",
    "relative_position_index_oca",
    "window_partition",
    "window_reverse",
]
