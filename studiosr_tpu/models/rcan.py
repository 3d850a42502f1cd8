"""RCAN — residual-in-residual channel-attention network (NHWC / JAX).

Capabilities of the reference ``studiosr/models/rcan.py``: 10 residual groups
of 20 RCABs (conv-ReLU-conv + squeeze-excite channel attention), mean-shift
wrappers, and the Google-Drive pretrained zoo (``rcan.py:107-119``).

TPU notes: the channel-attention global pool reduces to (N,1,1,C); XLA keeps
the gating elementwise chain fused into the producing conv. 820 convolutions
deep but entirely static — one big XLA program.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from studiosr_tpu.models.base import Model
from studiosr_tpu.models.blocks import ChannelAttention, Upsampler, conv, mean_shift

__all__ = ["RCAN", "RCANModule", "RCAB", "ResidualGroup"]


class RCAB(nn.Module):
    """conv-ReLU-conv + channel attention with identity residual."""

    n_feat: int
    kernel_size: int = 3
    reduction: int = 16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        res = conv(self.n_feat, self.kernel_size, name="body.0")(x)
        res = nn.relu(res)
        res = conv(self.n_feat, self.kernel_size, name="body.2")(res)
        res = ChannelAttention(self.n_feat, self.reduction, name="body.3")(res)
        return x + res


class ResidualGroup(nn.Module):
    """n_resblocks RCABs + conv, wrapped in a residual."""

    n_feat: int
    kernel_size: int = 3
    reduction: int = 16
    n_resblocks: int = 20

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        res = x
        for i in range(self.n_resblocks):
            res = RCAB(self.n_feat, self.kernel_size, self.reduction, name=f"body.{i}")(res)
        res = conv(self.n_feat, self.kernel_size, name=f"body.{self.n_resblocks}")(res)
        return x + res


class RCANModule(nn.Module):
    scale: int = 4
    n_colors: int = 3
    img_range: float = 1.0
    n_feats: int = 64
    n_resblocks: int = 20
    n_resgroups: int = 10
    reduction: int = 16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = mean_shift(x, self.img_range, sign=-1)
        x = conv(self.n_feats, 3, name="head.0")(x)
        res = x
        for g in range(self.n_resgroups):
            res = ResidualGroup(self.n_feats, 3, self.reduction, self.n_resblocks, name=f"body.{g}")(res)
        res = conv(self.n_feats, 3, name=f"body.{self.n_resgroups}")(res)
        res = res + x
        x = Upsampler(self.scale, self.n_feats, name="tail.0")(res)
        x = conv(self.n_colors, 3, name="tail.1")(x)
        return mean_shift(x, self.img_range, sign=1)


class RCAN(Model):
    @classmethod
    def build(
        cls,
        scale: int = 4,
        n_colors: int = 3,
        img_range: float = 1.0,
        n_feats: int = 64,
        n_resblocks: int = 20,
        n_resgroups: int = 10,
        reduction: int = 16,
        seed: int = 0,
        fast_init: bool = False,
    ) -> "RCAN":
        config = dict(
            scale=scale,
            n_colors=n_colors,
            img_range=img_range,
            n_feats=n_feats,
            n_resblocks=n_resblocks,
            n_resgroups=n_resgroups,
            reduction=reduction,
        )
        module = RCANModule(**config)
        from studiosr_tpu.models.base import init_variables

        variables = init_variables(module, (1, 16, 16, n_colors), seed, fast=fast_init)
        return cls(module, variables, config, _TRAINING_CONFIG)

    @classmethod
    def from_pretrained(cls, scale: int = 4) -> "RCAN":
        """Published RCAN BIX weights from the Google-Drive zip (``rcan.py:107-119``)."""
        import os

        from studiosr_tpu.utils.helpers import gdown_and_extract
        from studiosr_tpu.zoo import load_torch_state_dict, translate_state_dict

        pretrained_dir = "pretrained"
        rcan_path = os.path.join(pretrained_dir, "models_ECCV2018RCAN")
        if not os.path.exists(rcan_path):
            os.makedirs(pretrained_dir, exist_ok=True)
            gdown_and_extract(id="10bEK-NxVtOS9-XSeyOZyaRmxUTX3iIRa", save_dir=pretrained_dir)
        model = cls.build(scale=scale, img_range=255.0, fast_init=True)
        state = load_torch_state_dict(os.path.join(rcan_path, f"RCAN_BIX{scale}.pt"))
        model.variables, _ = translate_state_dict(state, model.variables, strict=False)
        return model


_TRAINING_CONFIG: Dict[str, Any] = dict(
    batch_size=16,
    learning_rate=0.0001,
    beta1=0.9,
    beta2=0.99,
    weight_decay=0.0,
    max_iters=1000000,
    gamma=0.5,
    milestones=[200000, 400000, 600000, 800000],
)
