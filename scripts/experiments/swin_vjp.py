"""Whole-Swin-block custom VJP for fused training.

One primitive per transformer block instead of two: the primal runs the
single-pass whole-block Pallas kernel (attention + DropPath + MLP +
DropPath — ops/pallas/swin_block.fused_swin_block) on TPU, removing half
the kernel launches and all the XLA DropPath/add passes that made the
training forward launch-bound (STATUS.md round-2 training dissection:
forward = 0.43 s of the 0.86 s step at 64-px shapes). The backward chains
the two validated backward paths (ops/pallas/mlp_vjp.py's Pallas kernel and
ops/attn_vjp.py's window math) with the per-sample stochastic-depth scales
applied analytically:

    y1 = x + d1 * attn_delta(x)        dy1 = (1-d2)*g + mlp_bwd(d2*g)
    y2 = y1 + d2 * mlp_delta(y1)       dx  = (1-d1)*dy1 + attn_bwd(d1*dy1)

``dp_scales`` are the already-divided-by-keep per-sample Bernoulli draws
(ones when DropPath is off); they receive zero gradients.

Gradients validated against jax.grad of the plain linen module in
tests/ops/test_fused_train.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from studiosr_tpu.ops import attn_vjp as _attn
from studiosr_tpu.ops.pallas import mlp_vjp as _mlp

__all__ = ["swin_block_map_vjp", "WHOLE_BLOCK_TRAIN"]

# Measured SLOWER than the split attention/MLP custom VJPs on the driver
# training shape (0.920 vs 0.859 s/step): at 64-px maps the whole-block
# kernel's larger VMEM working set costs more than the saved launches.
# Kept as a documented opt-in; the split path remains the default.
WHOLE_BLOCK_TRAIN = False


def _xla_forward(x, s1, b1, wqkv, bqkv, wproj, bproj, bias, s2, b2, w1, fb1, w2, fb2,
                 mask, dp_scales, shift, heads, ws):
    b = x.shape[0]
    d1 = dp_scales[:, 0].reshape(b, 1, 1, 1).astype(jnp.float32)
    d2 = dp_scales[:, 1].reshape(b, 1, 1, 1).astype(jnp.float32)
    a_full = _attn._map_forward_xla(x, s1, b1, wqkv, bqkv, wproj, bproj, bias, mask, shift, heads, ws)
    x32 = x.astype(jnp.float32)
    y1 = (x32 + d1 * (a_full.astype(jnp.float32) - x32)).astype(x.dtype)
    flat = y1.reshape(-1, x.shape[-1])
    m_full = _mlp._reference_forward(flat, s2, b2, w1, fb1, w2, fb2).reshape(y1.shape)
    y132 = y1.astype(jnp.float32)
    y2 = y132 + d2 * (m_full.astype(jnp.float32) - y132)
    return y2.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(16, 17, 18))
def swin_block_map_vjp(x, s1, b1, wqkv, bqkv, wproj, bproj, bias, s2, b2, w1, fb1, w2, fb2,
                       mask, dp_scales, shift, heads, ws):
    return _xla_forward(x, s1, b1, wqkv, bqkv, wproj, bproj, bias, s2, b2, w1, fb1, w2, fb2,
                        mask, dp_scales, shift, heads, ws)


def _fwd(x, s1, b1, wqkv, bqkv, wproj, bproj, bias, s2, b2, w1, fb1, w2, fb2,
         mask, dp_scales, shift, heads, ws):
    out = None
    if jax.default_backend() != "cpu":
        from studiosr_tpu.ops.pallas.swin_block import fused_swin_block

        z = jnp.roll(x, (-shift, -shift), axis=(1, 2)) if shift else x
        y = fused_swin_block(
            z, s1, b1, wqkv.astype(z.dtype), bqkv, wproj.astype(z.dtype), bproj, bias, mask,
            s2, b2, w1.astype(z.dtype), fb1, w2.astype(z.dtype), fb2,
            heads=heads, window_size=ws, drop_path=dp_scales,
        )
        if y is not None:
            out = jnp.roll(y, (shift, shift), axis=(1, 2)) if shift else y
    if out is None:
        out = _xla_forward(x, s1, b1, wqkv, bqkv, wproj, bproj, bias, s2, b2, w1, fb1, w2, fb2,
                           mask, dp_scales, shift, heads, ws)
    return out, (x, s1, b1, wqkv, bqkv, wproj, bproj, bias, s2, b2, w1, fb1, w2, fb2, mask, dp_scales)


def _bwd(shift, heads, ws, res, g):
    x, s1, b1, wqkv, bqkv, wproj, bproj, bias, s2, b2, w1, fb1, w2, fb2, mask, dp_scales = res
    b, hgt, wdt, c = x.shape
    d1 = dp_scales[:, 0].reshape(b, 1, 1, 1).astype(jnp.float32)
    d2 = dp_scales[:, 1].reshape(b, 1, 1, 1).astype(jnp.float32)
    g32 = g.astype(jnp.float32)

    # Recompute y1 (flash-style).
    a_full = _attn._map_forward_xla(x, s1, b1, wqkv, bqkv, wproj, bproj, bias, mask, shift, heads, ws)
    x32 = x.astype(jnp.float32)
    y1 = (x32 + d1 * (a_full.astype(jnp.float32) - x32)).astype(x.dtype)

    # MLP half: dy1 = (1-d2)*g + mlp_bwd(d2*g).
    g2 = (d2 * g32).astype(x.dtype).reshape(-1, c)
    dy1_p, ds2, db2, dw1, dfb1, dw2, dfb2 = _mlp._bwd((y1.reshape(-1, c), s2, b2, w1, fb1, w2, fb2), g2)
    dy1 = dy1_p.astype(jnp.float32).reshape(x.shape) + (1.0 - d2) * g32

    # Attention half: dx = (1-d1)*dy1 + attn_bwd(d1*dy1).
    g1 = (d1 * dy1).astype(x.dtype)
    dxp, ds1, db1, dwqkv, dbqkv, dwproj, dbproj, dbias, dmask, _ddp = _attn._map_bwd(
        shift, heads, ws, (x, s1, b1, wqkv, bqkv, wproj, bproj, bias, mask, None), g1
    )
    dx = (dxp.astype(jnp.float32) + (1.0 - d1) * dy1).astype(x.dtype)

    return (
        dx, ds1, db1, dwqkv, dbqkv, dwproj, dbproj, dbias,
        ds2, db2, dw1, dfb1, dw2, dfb2,
        dmask, jnp.zeros_like(dp_scales),
    )


swin_block_map_vjp.defvjp(_fwd, _bwd)
