"""Serving-path EDSR forward on the streaming Pallas kernels.

Runs the exact EDSR computation (``models/edsr.py``, reference
``studiosr/models/edsr.py``) from the parameter pytree: every ResBlock as a
one-pass conv-ReLU-conv kernel (ops/pallas/conv3x3.fused_resblock), the
trunk-closing conv as a streaming conv, and the x4 conv+PixelShuffle tail
as the one-pass quadrant-planar kernel (ops/pallas/upsampler.py). XLA
handles only the 3-channel head conv, the mean shifts, and non-x4 tails.

Numerically equivalent to the linen forward (tests/ops/test_edsr_fast.py).

STATUS: measured SLOWER than the linen/XLA forward on v5e (73-168 ms vs
62 ms at 256x256 x4 bf16 across kernel configurations — the conv trunk is
already XLA-optimal, reference edsr.py docstring) and therefore NOT wired
into EDSR by default; kept as a tested reference for narrow-trunk variants.

Re-measured round 3 (scripts/exp_edsr_incontext.py) after the aligned-width
+ lane-stacked-tap conv rework: fused_resblock 256ch band 8 now WINS the
standalone micro (2.315 vs 2.402 ms) but the full streaming path is still
3x slower in context (172.4 vs 56.1 ms) — XLA pipelines the conv trunk far
below its standalone per-op cost. Conclusion unchanged: EDSR serves linen.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp

from studiosr_tpu.models.blocks import mean_shift
from studiosr_tpu.ops.pallas.conv3x3 import fused_conv3x3, fused_resblock
from studiosr_tpu.ops.pixel_shuffle import pixel_shuffle
from studiosr_tpu.serving.swinir_fast import _conv

__all__ = ["edsr_fast_forward"]


def edsr_fast_forward(
    variables: Dict[str, Any],
    x: jnp.ndarray,
    config: Dict[str, Any],
    interpret: bool = False,
) -> jnp.ndarray:
    params = variables["params"]
    scale = int(config["scale"])
    img_range = float(config.get("img_range", 1.0))
    n_resblocks = int(config["n_resblocks"])
    res_scale = float(config.get("res_scale", 1.0))
    c = params["head.0"]["kernel"].shape[-1]
    # The two-conv ResBlock kernel needs band 4 at wide trunks (scoped-VMEM)
    # and its 100% halo re-read then LOSES to XLA (measured 73.4 vs 62.0 ms
    # at 256 ch); use it only for narrow trunks (EDSR-baseline class).
    fuse_resblocks = c <= 128

    x = mean_shift(x, img_range, sign=-1)
    x = _conv(x, params["head.0"])
    res = x
    for i in range(n_resblocks):
        blk = params[f"body.{i}"]
        if fuse_resblocks:
            res = fused_resblock(
                res,
                blk["body.0"]["kernel"].astype(res.dtype), blk["body.0"]["bias"],
                blk["body.2"]["kernel"].astype(res.dtype), blk["body.2"]["bias"],
                res_scale=res_scale, interpret=interpret,
            )
        else:
            h1 = jnp.maximum(_conv(res, blk["body.0"]), 0)
            res = res + _conv(h1, blk["body.2"]) * jnp.asarray(res_scale, res.dtype)
    tail_conv = params[f"body.{n_resblocks}"]
    res = fused_conv3x3(res, tail_conv["kernel"].astype(res.dtype), tail_conv["bias"], interpret=interpret) + x

    up = params["tail.0"]
    if scale == 4 and x.shape[0] == 1:
        from studiosr_tpu.ops.pallas.upsampler import fused_upsample_x4

        out = fused_upsample_x4(
            res,
            up["0"]["kernel"].astype(res.dtype), up["0"]["bias"],
            up["2"]["kernel"].astype(res.dtype), up["2"]["bias"],
            params["tail.1"]["kernel"].astype(res.dtype), params["tail.1"]["bias"],
            interpret=interpret,
        )
        if out is not None:
            return mean_shift(out, img_range, sign=1)

    s, i = scale, 0
    while s > 1 and (s & (s - 1)) == 0:
        res = _conv(res, up[str(2 * i)])
        res = pixel_shuffle(res, 2)
        s //= 2
        i += 1
    if s == 3:
        res = _conv(res, up["0"])
        res = pixel_shuffle(res, 3)
    res = _conv(res, params["tail.1"])
    return mean_shift(res, img_range, sign=1)
