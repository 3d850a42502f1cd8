"""VDSR — Very Deep Super-Resolution (NHWC / JAX).

Capabilities of the reference ``studiosr/models/vdsr.py``: bicubic upsample
to target size, 20 convs with ReLU, global residual, Google-Drive zoo
(``vdsr.py:75-93``). The bicubic upsample uses the torch-parity matrix-matmul
resize (ops/resize.py) so pretrained outputs match.
"""

from __future__ import annotations

import math
from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from studiosr_tpu.models.base import Model
from studiosr_tpu.models.blocks import Normalizer, conv
from studiosr_tpu.ops.resize import bicubic_upsample

__all__ = ["VDSR", "VDSRModule"]


def _vdsr_conv_init(kernel_size: int, in_channels: int):
    """Kaiming-style normal init used by the reference (``vdsr.py:36-40``)."""
    stddev = math.sqrt(2 / (kernel_size * kernel_size * in_channels))
    return nn.initializers.normal(stddev)


class VDSRModule(nn.Module):
    scale: int = 4
    n_colors: int = 3
    img_range: float = 1.0
    channels: int = 64
    n_layers: int = 18

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        normalizer = Normalizer(self.img_range)
        x = normalizer.normalize(x)

        u = bicubic_upsample(x, self.scale)
        y = nn.Conv(
            self.channels,
            (3, 3),
            padding=[(1, 1), (1, 1)],
            kernel_init=_vdsr_conv_init(3, self.n_colors),
            name="layers.0",
        )(u)
        y = nn.relu(y)
        for i in range(self.n_layers):
            y = nn.Conv(
                self.channels,
                (3, 3),
                padding=[(1, 1), (1, 1)],
                kernel_init=_vdsr_conv_init(3, self.channels),
                name=f"layers.{2 * (i + 1)}",
            )(y)
            y = nn.relu(y)
        y = nn.Conv(
            self.n_colors,
            (3, 3),
            padding=[(1, 1), (1, 1)],
            kernel_init=_vdsr_conv_init(3, self.channels),
            name=f"layers.{2 * (self.n_layers + 1)}",
        )(y)
        x = y + u
        return normalizer.unnormalize(x)


class VDSR(Model):
    @classmethod
    def build(
        cls,
        scale: int = 4,
        n_colors: int = 3,
        img_range: float = 1.0,
        channels: int = 64,
        n_layers: int = 18,
        seed: int = 0,
        fast_init: bool = False,
    ) -> "VDSR":
        from studiosr_tpu.models.base import init_variables

        config = dict(scale=scale, n_colors=n_colors, img_range=img_range, channels=channels, n_layers=n_layers)
        module = VDSRModule(**config)
        variables = init_variables(module, (1, 12, 12, n_colors), seed, fast=fast_init)
        return cls(module, variables, config, _TRAINING_CONFIG)

    @classmethod
    def from_pretrained(cls, scale: int = 4) -> "VDSR":
        assert scale in [2, 3, 4]
        from studiosr_tpu.zoo import fetch, load_torch_state_dict, translate_state_dict

        file_ids = {
            2: "1eQnGseT3SqQirB5ueAFfsClhLlpeoUOX",
            3: "1wXOnLFf7rWglzzVMzYSVrb5Po79vUUq3",
            4: "1Q5DKy7oAQbgGqxI-unxPy9X3GcHwZokC",
        }
        # fast_init: the checkpoint covers every parameter.
        model = cls.build(scale=scale, fast_init=True)
        path = fetch(f"VDSRx{scale}.pth", gdrive_id=file_ids[scale])
        state = load_torch_state_dict(path)
        model.variables, _ = translate_state_dict(state, model.variables)
        return model


_TRAINING_CONFIG: Dict[str, Any] = dict(
    batch_size=32,
    learning_rate=0.0002,
    beta1=0.9,
    beta2=0.99,
    weight_decay=0.0,
    max_iters=500000,
    gamma=0.5,
    milestones=[250000, 400000, 450000, 475000],
)
