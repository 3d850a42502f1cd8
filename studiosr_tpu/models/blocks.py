"""Shared NHWC building blocks for all models (flax.linen).

TPU-native substrate with the same capabilities as the reference's
``studiosr/models/common.py``: conv/ResBlock/ChannelAttention/Mlp/Upsampler/
MeanShift/Normalizer re-designed for NHWC layout and XLA fusion.

Naming convention: leaf modules are given names matching the reference
checkpoints' ``state_dict`` key prefixes (e.g. ``body.0.body.2``), so
pretrained-weight translation (studiosr_tpu/zoo/translate.py) is a single
generic pass — the joined linen path equals the torch key prefix.

Numerical parity notes:
* GELU is the exact (erf) variant — torch ``nn.GELU()`` default.
* LayerNorm/BatchNorm eps = 1e-5 (torch defaults; flax defaults differ).
* Convolutions use explicit ``k//2`` zero padding, identical to
  ``common.py:104``.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from studiosr_tpu.ops.pixel_shuffle import pixel_shuffle

__all__ = [
    "conv",
    "gelu",
    "mean_shift",
    "Normalizer",
    "Upsampler",
    "ResBlock",
    "ChannelAttention",
    "Mlp",
    "LayerNorm",
    "PReLU",
    "BatchNorm",
    "drop_path",
    "DEFAULT_RGB_MEAN",
]

# DIV2K RGB mean, the normalization constant used across the reference models
# (``common.py:108-121``).
DEFAULT_RGB_MEAN = (0.4488, 0.4371, 0.4040)


def conv(
    features: int,
    kernel_size: int = 3,
    name: Optional[str] = None,
    use_bias: bool = True,
    stride: int = 1,
    feature_group_count: int = 1,
) -> nn.Conv:
    """NHWC conv with torch-style ``k//2`` zero padding."""
    pad = kernel_size // 2
    return nn.Conv(
        features,
        (kernel_size, kernel_size),
        strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        use_bias=use_bias,
        feature_group_count=feature_group_count,
        name=name,
    )


def gelu(x: jnp.ndarray) -> jnp.ndarray:
    """Exact (erf-based) GELU — parity with torch ``nn.GELU()``."""
    return jax.nn.gelu(x, approximate=False)


def mean_shift(
    x: jnp.ndarray,
    img_range: float,
    sign: int = -1,
    rgb_mean: Sequence[float] = DEFAULT_RGB_MEAN,
    rgb_std: Sequence[float] = (1.0, 1.0, 1.0),
) -> jnp.ndarray:
    """Frozen 1x1 mean-shift conv collapsed to an affine constant op.

    The reference implements this as a non-trainable Conv2d
    (``common.py:108-121``); it is mathematically ``x/std + sign*range*mean/std``
    so we bake it as a fused elementwise op instead of a conv.
    """
    std = jnp.asarray(rgb_std, dtype=x.dtype)
    mean = jnp.asarray(rgb_mean, dtype=x.dtype)
    return x / std + sign * img_range * mean / std


class Normalizer:
    """Mean-subtract / re-add helper (``common.py:222-233``). Stateless."""

    def __init__(self, img_range: float = 1.0, img_mean: Sequence[float] = DEFAULT_RGB_MEAN) -> None:
        self.img_range = img_range
        self.img_mean = np.asarray(img_mean, dtype=np.float32)

    def normalize(self, x: jnp.ndarray) -> jnp.ndarray:
        return x / self.img_range - jnp.asarray(self.img_mean, dtype=x.dtype)

    def unnormalize(self, x: jnp.ndarray) -> jnp.ndarray:
        return (x + jnp.asarray(self.img_mean, dtype=x.dtype)) * self.img_range


class Upsampler(nn.Module):
    """conv -> PixelShuffle ladder (``common.py:124-137``).

    Three variants, same as the reference:
    * ``num_out_ch`` set: single conv to ``s^2 * num_out_ch`` then shuffle
      ("pixelshuffledirect");
    * power-of-two scale: log2 ladder of (conv 4x, shuffle 2);
    * otherwise: single conv to ``s^2 * n_feats`` then shuffle.

    Conv names follow torch Sequential indices ("0", "2", ...) — shuffles
    occupy the odd slots but hold no parameters.
    """

    scale: int
    n_feats: int
    num_out_ch: Optional[int] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        s = self.scale
        if self.num_out_ch is not None:
            x = conv(s * s * self.num_out_ch, 3, name="0")(x)
            x = pixel_shuffle(x, s)
        elif (s & (s - 1)) == 0:
            for i in range(int(math.log2(s))):
                x = conv(4 * self.n_feats, 3, name=str(2 * i))(x)
                x = pixel_shuffle(x, 2)
        else:
            x = conv(s * s * self.n_feats, 3, name="0")(x)
            x = pixel_shuffle(x, s)
        return x


class ResBlock(nn.Module):
    """conv-ReLU-conv with residual scaling (``common.py:140-153``)."""

    n_feats: int
    kernel_size: int = 3
    res_scale: float = 1.0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        res = conv(self.n_feats, self.kernel_size, name="body.0")(x)
        res = nn.relu(res)
        res = conv(self.n_feats, self.kernel_size, name="body.2")(res)
        return x + res * self.res_scale


class ChannelAttention(nn.Module):
    """Squeeze-excite channel gate (``common.py:156-170``).

    Global average pool -> 1x1 squeeze conv -> ReLU -> 1x1 excite conv ->
    sigmoid gate. The 1x1 convs on the pooled (N,1,1,C) tensor are kept as
    convs (not Dense) so checkpoint translation stays uniform.
    """

    channel: int
    reduction: int = 16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = jnp.mean(x, axis=(1, 2), keepdims=True)
        y = conv(self.channel // self.reduction, 1, name="conv_du.0")(y)
        y = nn.relu(y)
        y = conv(self.channel, 1, name="conv_du.2")(y)
        y = nn.sigmoid(y)
        return x * y


class Mlp(nn.Module):
    """Dense-GELU-Dense feed-forward (``common.py:173-195``)."""

    in_features: int
    hidden_features: Optional[int] = None
    out_features: Optional[int] = None
    drop: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        hidden = self.hidden_features or self.in_features
        out = self.out_features or self.in_features
        x = nn.Dense(hidden, name="fc1")(x)
        x = gelu(x)
        x = nn.Dropout(self.drop, deterministic=not train)(x)
        x = nn.Dense(out, name="fc2")(x)
        x = nn.Dropout(self.drop, deterministic=not train)(x)
        return x


def LayerNorm(name: Optional[str] = None) -> nn.LayerNorm:
    """LayerNorm with torch eps."""
    return nn.LayerNorm(epsilon=1e-5, name=name)


class PReLU(nn.Module):
    """Parametric ReLU; ``num_parameters=1`` broadcast like torch default."""

    num_parameters: int = 1
    init_value: float = 0.25

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        alpha = self.param("alpha", lambda _: jnp.full((self.num_parameters,), self.init_value, jnp.float32))
        a = alpha.astype(x.dtype)
        if self.num_parameters == 1:
            a = a[0]
        return jnp.where(x >= 0, x, a * x)


def BatchNorm(use_running_average: bool, name: Optional[str] = None, use_scale: bool = True, use_bias: bool = True):
    """BatchNorm2d with torch eps/momentum. Cross-replica stat sync (the
    SyncBatchNorm analog, reference ``trainer.py:90``) is provided via
    ``axis_name='data'`` when run under a mesh — see parallel/train_step.
    """
    return nn.BatchNorm(
        use_running_average=use_running_average,
        momentum=0.9,
        epsilon=1e-5,
        use_scale=use_scale,
        use_bias=use_bias,
        name=name,
    )


def drop_path(x: jnp.ndarray, rate: float, deterministic: bool, rng: Optional[jax.Array]) -> jnp.ndarray:
    """Stochastic depth on the leading (batch) axis (timm DropPath analog)."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape).astype(x.dtype)
    return x * mask / keep


class DropPath(nn.Module):
    """Module wrapper for :func:`drop_path` drawing from the 'dropout' RNG."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        if deterministic or self.rate == 0.0:
            return x
        rng = self.make_rng("dropout")
        return drop_path(x, self.rate, False, rng)
