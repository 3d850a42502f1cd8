"""EDSR — Enhanced Deep Residual Networks for SISR (NHWC / JAX).

Same capability as the reference ``studiosr/models/edsr.py``: 32 ResBlocks x
256 features with residual scale 0.1, mean-shift wrappers, PixelShuffle tail,
and the published DIV2K (img_range 255) / DF2K (img_range 1) pretrained zoo
(``edsr.py:77-112``).

TPU design: a pure conv trunk is already XLA-optimal — each ResBlock lowers
to two MXU convolutions with the ReLU and residual-add fused into them; the
MeanShift "convs" are folded into elementwise constants.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from studiosr_tpu.models.base import Model
from studiosr_tpu.models.blocks import ResBlock, Upsampler, conv, mean_shift

__all__ = ["EDSR", "EDSRModule"]


class EDSRModule(nn.Module):
    scale: int = 4
    n_colors: int = 3
    img_range: float = 1.0
    n_feats: int = 256
    n_resblocks: int = 32
    res_scale: float = 0.1

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = mean_shift(x, self.img_range, sign=-1)
        x = conv(self.n_feats, 3, name="head.0")(x)
        res = x
        for i in range(self.n_resblocks):
            res = ResBlock(self.n_feats, 3, self.res_scale, name=f"body.{i}")(res)
        res = conv(self.n_feats, 3, name=f"body.{self.n_resblocks}")(res)
        res = res + x
        x = Upsampler(self.scale, self.n_feats, name="tail.0")(res)
        x = conv(self.n_colors, 3, name="tail.1")(x)
        return mean_shift(x, self.img_range, sign=1)


class EDSR(Model):
    @classmethod
    def build(
        cls,
        scale: int = 4,
        n_colors: int = 3,
        img_range: float = 1.0,
        n_feats: int = 256,
        n_resblocks: int = 32,
        res_scale: float = 0.1,
        seed: int = 0,
        fast_init: bool = False,
    ) -> "EDSR":
        config = dict(
            scale=scale,
            n_colors=n_colors,
            img_range=img_range,
            n_feats=n_feats,
            n_resblocks=n_resblocks,
            res_scale=res_scale,
        )
        module = EDSRModule(**config)
        from studiosr_tpu.models.base import init_variables

        variables = init_variables(module, (1, 16, 16, n_colors), seed, fast=fast_init)
        return cls(module, variables, config, _TRAINING_CONFIG)

    @classmethod
    def from_pretrained(cls, scale: int = 4, dataset: str = "DIV2K") -> "EDSR":
        """Load the published EDSR weights (``edsr.py:77-112``)."""
        assert scale in [2, 3, 4]
        assert dataset in ["DIV2K", "DF2K"]
        from studiosr_tpu.zoo import fetch, load_torch_state_dict, translate_state_dict

        if dataset == "DIV2K":
            urls = {
                2: "https://cv.snu.ac.kr/research/EDSR/models/edsr_x2-0edfb8a3.pt",
                3: "https://cv.snu.ac.kr/research/EDSR/models/edsr_x3-ea3ef2c6.pt",
                4: "https://cv.snu.ac.kr/research/EDSR/models/edsr_x4-4f62e9ef.pt",
            }
            model = cls.build(scale=scale, img_range=255.0, fast_init=True)
            path = fetch(f"r32f256x{scale}.pth", url=urls[scale])
        else:
            file_ids = {
                2: "1XEqY_nkUMdIid4lM9zAW99rYDx5eftBT",
                3: "1H1yFCFK14Z0DWAZHCtGXcWS6377fbkJE",
                4: "1TeH67rKNSR3dXs56aLqsA-UvLL3TZL-g",
            }
            model = cls.build(scale=scale, fast_init=True)
            path = fetch(f"EDSRx{scale}.pth", gdrive_id=file_ids[scale])

        state = load_torch_state_dict(path)
        model.variables, _ = translate_state_dict(state, model.variables)
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
