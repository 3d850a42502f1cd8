"""SRCNN — the original 3-layer SR CNN (NHWC / JAX).

Capabilities of the reference ``studiosr/models/srcnn.py``: bicubic upsample,
9-5-5 conv stack with ReLU, optional global residual, mean normalization.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from studiosr_tpu.models.base import Model
from studiosr_tpu.models.blocks import Normalizer, conv
from studiosr_tpu.ops.resize import bicubic_upsample

__all__ = ["SRCNN", "SRCNNModule"]


class SRCNNModule(nn.Module):
    scale: int = 4
    n_colors: int = 3
    img_range: float = 1.0
    residual: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        normalizer = Normalizer(self.img_range)
        x = normalizer.normalize(x)

        u = bicubic_upsample(x, self.scale)
        y = conv(64, 9, name="layers.0")(u)
        y = nn.relu(y)
        y = conv(32, 5, name="layers.2")(y)
        y = nn.relu(y)
        y = conv(self.n_colors, 5, name="layers.4")(y)
        if self.residual:
            y = y + u
        return normalizer.unnormalize(y)


class SRCNN(Model):
    @classmethod
    def build(
        cls,
        scale: int = 4,
        n_colors: int = 3,
        img_range: float = 1.0,
        residual: bool = False,
        seed: int = 0,
    ) -> "SRCNN":
        config = dict(scale=scale, n_colors=n_colors, img_range=img_range, residual=residual)
        module = SRCNNModule(**config)
        variables = module.init(jax.random.PRNGKey(seed), jnp.zeros((1, 12, 12, n_colors), jnp.float32))
        return cls(module, variables, config, _TRAINING_CONFIG)


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
