"""IMDN — lightweight information multi-distillation network (NHWC / JAX).

Capabilities of the reference ``studiosr/models/imdn.py``: 6 IMD modules with
channel-splitting distillation, contrast-aware channel attention (CCA),
1x1 fusion over the 6 module outputs, PixelShuffle tail, and the GitHub-raw
pretrained zoo with DataParallel-prefix stripping (``imdn.py:238-253``).

TPU notes: channel splits are static slices, fully fused by XLA; the contrast
statistic (per-channel spatial stddev) is a pair of reductions.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from studiosr_tpu.models.base import Model
from studiosr_tpu.models.blocks import conv
from studiosr_tpu.ops.pixel_shuffle import pixel_shuffle

__all__ = ["IMDN", "IMDNModule"]

_LRELU_SLOPE = 0.05


def _lrelu(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(x >= 0, x, _LRELU_SLOPE * x)


class CCALayer(nn.Module):
    """Contrast-aware channel attention: gate on stddev + mean pooling
    (``imdn.py:99-137``)."""

    channel: int
    reduction: int = 16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=(1, 2), keepdims=True)
        y = jnp.sqrt(var) + mean
        y = conv(self.channel // self.reduction, 1, name="conv_du.0")(y)
        y = nn.relu(y)
        y = conv(self.channel, 1, name="conv_du.2")(y)
        y = nn.sigmoid(y)
        return x * y


class IMDModule(nn.Module):
    """Three distill/remain channel splits + fused 1x1 + CCA (``imdn.py:140-163``)."""

    in_channels: int
    distillation_rate: float = 0.25

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dc = int(self.in_channels * self.distillation_rate)

        out1 = _lrelu(conv(self.in_channels, 3, name="c1")(x))
        d1, r1 = out1[..., :dc], out1[..., dc:]
        out2 = _lrelu(conv(self.in_channels, 3, name="c2")(r1))
        d2, r2 = out2[..., :dc], out2[..., dc:]
        out3 = _lrelu(conv(self.in_channels, 3, name="c3")(r2))
        d3, r3 = out3[..., :dc], out3[..., dc:]
        d4 = conv(dc, 3, name="c4")(r3)

        out = jnp.concatenate([d1, d2, d3, d4], axis=-1)
        out = CCALayer(dc * 4, name="cca")(out)
        return conv(self.in_channels, 1, name="c5")(out) + x


class IMDNModule(nn.Module):
    scale: int = 4
    n_colors: int = 3
    img_range: float = 1.0
    n_feats: int = 64
    n_modules: int = 6

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        fea = conv(self.n_feats, 3, name="fea_conv")(x)
        outputs = []
        h = fea
        for i in range(self.n_modules):
            h = IMDModule(self.n_feats, name=f"IMDB{i + 1}")(h)
            outputs.append(h)
        out = _lrelu(conv(self.n_feats, 1, name="c.0")(jnp.concatenate(outputs, axis=-1)))
        out = conv(self.n_feats, 3, name="LR_conv")(out) + fea
        out = conv(self.n_colors * self.scale**2, 3, name="upsampler.0")(out)
        return pixel_shuffle(out, self.scale)


class IMDN(Model):
    @classmethod
    def build(
        cls,
        scale: int = 4,
        n_colors: int = 3,
        img_range: float = 1.0,
        n_feats: int = 64,
        n_modules: int = 6,
        seed: int = 0,
        fast_init: bool = False,
    ) -> "IMDN":
        from studiosr_tpu.models.base import init_variables

        config = dict(scale=scale, n_colors=n_colors, img_range=img_range, n_feats=n_feats, n_modules=n_modules)
        module = IMDNModule(**config)
        variables = init_variables(module, (1, 16, 16, n_colors), seed, fast=fast_init)
        return cls(module, variables, config, {})

    @classmethod
    def from_pretrained(cls, scale: int = 4) -> "IMDN":
        """GitHub-raw checkpoints with ``module.`` stripping (``imdn.py:238-253``)."""
        assert scale in [2, 3, 4]
        from studiosr_tpu.zoo import fetch, load_torch_state_dict, translate_state_dict

        # fast_init: the checkpoint covers every parameter.
        model = cls.build(scale=scale, fast_init=True)
        path = fetch(
            f"IMDN_x{scale}.pth",
            url=f"https://github.com/Zheng222/IMDN/raw/master/checkpoints/IMDN_x{scale}.pth",
        )
        state = load_torch_state_dict(path)
        model.variables, _ = translate_state_dict(state, model.variables)
        return model
