"""SRResNet — the SRGAN generator (NHWC / JAX).

Capabilities of the reference ``studiosr/models/srresnet.py``: 9x9 head conv
with PReLU, 16 residual conv blocks with BatchNorm + PReLU, BN fusion conv,
PixelShuffle ladder, 9x9 tail. Supports scales {2, 4, 8} like the reference
(``srresnet.py:77-81``).

BatchNorm runs on the ``batch_stats`` collection; under the data-parallel
mesh the batch statistics are computed over the global batch via
``axis_name='data'`` (the SyncBatchNorm analog, reference ``trainer.py:90``).
"""

from __future__ import annotations

import math
from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from studiosr_tpu.models.base import Model
from studiosr_tpu.models.blocks import BatchNorm, Normalizer, PReLU, conv
from studiosr_tpu.ops.pixel_shuffle import pixel_shuffle

__all__ = ["SRResNet", "SRResNetModule"]


class _ResidualConvBlock(nn.Module):
    channels: int
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        y = conv(self.channels, 3, use_bias=False, name="rcb.0")(x)
        y = BatchNorm(use_running_average=not train, name="rcb.1")(y)
        y = PReLU(name="rcb.2")(y)
        y = conv(self.channels, 3, use_bias=False, name="rcb.3")(y)
        y = BatchNorm(use_running_average=not train, name="rcb.4")(y)
        return x + y


class SRResNetModule(nn.Module):
    scale: int = 4
    n_colors: int = 3
    img_range: float = 1.0
    channels: int = 64
    num_rcb: int = 16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.scale not in (2, 4, 8):
            raise NotImplementedError(f"scale `{self.scale}` is not supported.")
        normalizer = Normalizer(self.img_range)
        x = normalizer.normalize(x)

        x = conv(self.channels, 9, name="conv1.0")(x)
        x = PReLU(name="conv1.1")(x)
        head = x

        for i in range(self.num_rcb):
            x = _ResidualConvBlock(self.channels, name=f"trunk.{i}")(x, train=train)

        x = conv(self.channels, 3, use_bias=False, name="conv2.0")(x)
        x = BatchNorm(use_running_average=not train, name="conv2.1")(x)
        x = x + head

        for i in range(int(math.log2(self.scale))):
            x = conv(self.channels * 4, 3, name=f"upsampling.{i}.upsample_block.0")(x)
            x = pixel_shuffle(x, 2)
            x = PReLU(name=f"upsampling.{i}.upsample_block.2")(x)

        x = conv(self.n_colors, 9, name="conv3")(x)
        return normalizer.unnormalize(x)


class SRResNet(Model):
    @classmethod
    def build(
        cls,
        scale: int = 4,
        n_colors: int = 3,
        img_range: float = 1.0,
        channels: int = 64,
        num_rcb: int = 16,
        seed: int = 0,
    ) -> "SRResNet":
        config = dict(scale=scale, n_colors=n_colors, img_range=img_range, channels=channels, num_rcb=num_rcb)
        module = SRResNetModule(**config)
        variables = module.init(jax.random.PRNGKey(seed), jnp.zeros((1, 16, 16, n_colors), jnp.float32))
        return cls(module, variables, config, _TRAINING_CONFIG)


_TRAINING_CONFIG: Dict[str, Any] = dict(
    batch_size=16,
    learning_rate=0.0001,
    beta1=0.9,
    beta2=0.99,
    weight_decay=0.0,
    max_iters=1000000,
    milestones=[],
    loss_function="mse",
    bfloat16=False,
)
