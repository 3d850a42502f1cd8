"""ESPCN — efficient sub-pixel convolutional network (NHWC / JAX).

Capabilities of the reference ``studiosr/models/espcn.py``: tanh feature maps
in LR space, final conv to s^2 * n_colors channels, PixelShuffle at the end,
custom normal weight init (``espcn.py:39-48``).
"""

from __future__ import annotations

import math
from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from studiosr_tpu.models.base import Model
from studiosr_tpu.models.blocks import Normalizer
from studiosr_tpu.ops.pixel_shuffle import pixel_shuffle

__all__ = ["ESPCN", "ESPCNModule"]


def _espcn_conv(features: int, kernel_size: int, in_channels: int, name: str) -> nn.Conv:
    """Conv with the reference's init rule: std 0.001 when fed from the
    32-channel hidden layer, else sqrt(2 / (out_c * k * k))."""
    if in_channels == 32:
        init = nn.initializers.normal(0.001)
    else:
        init = nn.initializers.normal(math.sqrt(2.0 / (features * kernel_size * kernel_size)))
    pad = kernel_size // 2
    return nn.Conv(features, (kernel_size, kernel_size), padding=[(pad, pad), (pad, pad)], kernel_init=init, name=name)


class ESPCNModule(nn.Module):
    scale: int = 4
    n_colors: int = 3
    img_range: float = 1.0
    channels: int = 64

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        normalizer = Normalizer(self.img_range)
        hidden = self.channels // 2
        out_channels = self.n_colors * self.scale**2

        x = normalizer.normalize(x)
        x = _espcn_conv(self.channels, 5, self.n_colors, name="feature_maps.0")(x)
        x = jnp.tanh(x)
        x = _espcn_conv(hidden, 3, self.channels, name="feature_maps.2")(x)
        x = jnp.tanh(x)
        x = _espcn_conv(out_channels, 3, hidden, name="sub_pixel.0")(x)
        x = pixel_shuffle(x, self.scale)
        return normalizer.unnormalize(x)


class ESPCN(Model):
    @classmethod
    def build(
        cls,
        scale: int = 4,
        n_colors: int = 3,
        img_range: float = 1.0,
        channels: int = 64,
        seed: int = 0,
    ) -> "ESPCN":
        config = dict(scale=scale, n_colors=n_colors, img_range=img_range, channels=channels)
        module = ESPCNModule(**config)
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
