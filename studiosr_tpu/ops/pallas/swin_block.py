"""Fused Swin transformer block kernels (Pallas TPU).

The XLA lowering of a Swin block makes ~14 HBM round-trips over the
(H, W, C) feature map per block (LayerNorm, window partition/reverse
transposes, attention intermediates, MLP, residuals). At SwinIR scale the
model is HBM-bound, not FLOP-bound. These kernels collapse each block half
into a single pass:

* :func:`fused_window_attention_block` — y = x + proj(window_attn(LN(x))).
  Grid over window-row stripes of the NHWC map; the stripe is window-
  partitioned, attended (QK^T + rel-pos bias + shift mask + softmax + AV,
  per head), projected, and residual-added entirely in VMEM. The window
  partition/reverse transposes disappear — windows are carved out of the
  stripe in registers.
* :func:`fused_mlp_block` — y = x + fc2(gelu(fc1(LN(x)))), grid over row
  blocks, both matmuls with the hidden activations VMEM-resident.

Cyclic shifts stay outside as cheap XLA rolls (2 passes per shifted block);
fusing them would couple stripes. Weights live in VMEM for every program
(~1 MB total at SwinIR scale).

Validated against the linen/XLA block in tests/ops/test_fused_swin.py.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["fused_window_attention_block", "fused_mlp_block"]

# Tunables for the per-program working set (see fused_window_attention_block).
MAX_CHUNK_WINDOWS = 16
SCORE_VMEM_BUDGET = 1_300_000  # bytes of f32 scores per head (ws16 -> 4 windows)


def _erf(x: jnp.ndarray) -> jnp.ndarray:
    """erf via the Abramowitz-Stegun 7.1.26 rational approximation (max error
    1.5e-7) — Mosaic has no erf/erfc lowering; only exp is needed here."""
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p = -1.453152027, 1.061405429, 0.3275911
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _layernorm(x32: jnp.ndarray, scale, bias, eps: float = 1e-5) -> jnp.ndarray:
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
    return (x32 - mu) * jax.lax.rsqrt(var + eps) * scale + bias


def _pad_head_weights(wqkv, bqkv, wproj, heads: int, d: int, dp: int):
    """Re-lay the qkv/proj weights so each head occupies a 32-aligned
    ``dp``-lane group (zero padding). Misaligned lane slices force Mosaic
    relayouts inside the kernel — measured at ~0.2 ms/block at SwinIR scale.
    The 1/sqrt(d) query scale is folded into the q weights/bias."""
    c = wqkv.shape[0]
    scale = float(d) ** -0.5

    def pad_section(w, b, s):
        w = (w.reshape(c, heads, d) * s).astype(wqkv.dtype)
        b = (b.reshape(heads, d) * s).astype(wqkv.dtype)
        w = jnp.pad(w, ((0, 0), (0, 0), (0, dp - d))).reshape(c, heads * dp)
        b = jnp.pad(b, ((0, 0), (0, dp - d))).reshape(heads * dp)
        return w, b

    wq, bq = pad_section(wqkv[:, :c], bqkv[:c], scale)
    wk, bk = pad_section(wqkv[:, c : 2 * c], bqkv[c : 2 * c], 1.0)
    wv, bv = pad_section(wqkv[:, 2 * c :], bqkv[2 * c :], 1.0)
    wqkv_pad = jnp.concatenate([wq, wk, wv], axis=1)  # (C, 3*heads*dp)
    bqkv_pad = jnp.concatenate([bq, bk, bv])
    # proj rows gain matching zero rows per head.
    wproj_pad = jnp.pad(wproj.reshape(heads, d, c), ((0, 0), (0, dp - d), (0, 0))).reshape(heads * dp, c)
    return wqkv_pad, bqkv_pad, wproj_pad


def _attn_block_kernel(
    x_ref,  # (1, ws, W, C)
    ln_scale_ref,  # (1, C)
    ln_bias_ref,  # (1, C)
    wqkv_ref,  # (C, 3*heads*dp) head-padded, q pre-scaled
    bqkv_ref,  # (1, 3*heads*dp)
    wproj_ref,  # (heads*dp, C)
    bproj_ref,  # (1, C)
    bias_ref,  # (heads, N, N)
    mask_ref,  # (nw, N, N) or None
    out_ref,  # (1, ws, W, C)
    *,
    heads: int,
    window_size: int,
    dp: int,
):
    ws = window_size
    _, _, w, c = x_ref.shape
    nw = w // ws
    n = ws * ws
    s = heads * dp

    x = x_ref[0]  # (ws, W, C)
    ln = _layernorm(x.astype(jnp.float32), ln_scale_ref[0].astype(jnp.float32), ln_bias_ref[0].astype(jnp.float32))

    # Stripe -> windows BEFORE the qkv projection: the relayouted tensor is C
    # wide instead of 3C (the matmul output needs no transpose).
    ln_windows = ln.astype(x.dtype).reshape(ws, nw, ws, c).transpose(1, 0, 2, 3).reshape(nw * n, c)
    qkv = (
        jnp.dot(ln_windows, wqkv_ref[...], preferred_element_type=jnp.float32) + bqkv_ref[0].astype(jnp.float32)
    ).astype(x.dtype)
    qkv = qkv.reshape(nw, n, 3 * s)

    head_outs = []
    for h in range(heads):
        q = qkv[:, :, h * dp : (h + 1) * dp]
        k = qkv[:, :, s + h * dp : s + (h + 1) * dp]
        v = qkv[:, :, 2 * s + h * dp : 2 * s + (h + 1) * dp]
        scores = jax.lax.dot_general(
            q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )  # (nw, N, N)
        scores = scores + bias_ref[h][None].astype(jnp.float32)
        if mask_ref is not None:
            scores = scores + mask_ref[...].astype(jnp.float32)
        scores = scores - jnp.max(scores, axis=-1, keepdims=True)
        probs = jnp.exp(scores)
        denom = jnp.sum(probs, axis=-1, keepdims=True)
        av = jax.lax.dot_general(
            probs.astype(v.dtype), v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        # Normalize after AV: divides (nw, N, dp) instead of (nw, N, N).
        head_outs.append((av / denom).astype(x.dtype))

    attn = jnp.concatenate(head_outs, axis=-1)  # (nw, N, heads*dp)
    # Windows -> stripe.
    attn = attn.reshape(nw, ws, ws, s).transpose(1, 0, 2, 3).reshape(ws * w, s)
    proj = (
        jnp.dot(attn, wproj_ref[...], preferred_element_type=jnp.float32)
        + bproj_ref[0].astype(jnp.float32)
    )
    out_ref[0] = (x.astype(jnp.float32) + proj.reshape(ws, w, c)).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("heads", "window_size", "interpret"))
def fused_window_attention_block(
    x: jnp.ndarray,  # (1, H, W, C), already cyclically shifted if needed
    ln_scale: jnp.ndarray,
    ln_bias: jnp.ndarray,
    wqkv: jnp.ndarray,
    bqkv: jnp.ndarray,
    wproj: jnp.ndarray,
    bproj: jnp.ndarray,
    bias: jnp.ndarray,  # (heads, N, N)
    mask: Optional[jnp.ndarray],  # (nW, N, N) or None
    heads: int,
    window_size: int,
    interpret: bool = False,
) -> jnp.ndarray:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, hgt, w, c = x.shape
    ws = window_size
    n = ws * ws
    nw_row = w // ws

    # Chunk each window-row stripe: largest divisor of the windows-per-row
    # count whose f32 score block stays within the VMEM score budget.
    max_chunk = max(1, min(MAX_CHUNK_WINDOWS, (SCORE_VMEM_BUDGET // (n * n * 4))))
    chunk = 1
    for cand in range(1, nw_row + 1):
        if nw_row % cand == 0 and cand <= max_chunk:
            chunk = cand
    cw = chunk * ws  # chunk width in pixels
    grid = (b, hgt // ws, nw_row // chunk)

    d = c // heads
    dp = ((d + 31) // 32) * 32
    s = heads * dp
    wqkv_pad, bqkv_pad, wproj_pad = _pad_head_weights(wqkv, bqkv, wproj, heads, d, dp)

    kernel = functools.partial(_attn_block_kernel, heads=heads, window_size=ws, dp=dp)
    if mask is None:
        def kernel_nomask(x_ref, s_ref, b_ref, wq_ref, bq_ref, wp_ref, bp_ref, bias_ref, out_ref):
            _attn_block_kernel(
                x_ref, s_ref, b_ref, wq_ref, bq_ref, wp_ref, bp_ref, bias_ref, None, out_ref,
                heads=heads, window_size=ws, dp=dp,
            )
        kernel = kernel_nomask

    full = lambda *shape: pl.BlockSpec(shape, lambda bi, i, j: (0,) * len(shape), memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((1, ws, cw, c), lambda bi, i, j: (bi, i, j, 0), memory_space=pltpu.VMEM),
        full(1, c),
        full(1, c),
        full(c, 3 * s),
        full(1, 3 * s),
        full(s, c),
        full(1, c),
        full(bias.shape[0], n, n),
    ]
    operands = [x, ln_scale.reshape(1, c), ln_bias.reshape(1, c), wqkv_pad, bqkv_pad.reshape(1, -1),
                wproj_pad, bproj.reshape(1, c), bias]
    n_chunks = nw_row // chunk
    if mask is not None:
        # Shift mask is shared across the batch (same static image size).
        in_specs.append(
            pl.BlockSpec((chunk, n, n), lambda bi, i, j: (i * n_chunks + j, 0, 0), memory_space=pltpu.VMEM)
        )
        operands.append(mask)

    compiler_params = None
    if not interpret:
        compiler_params = pltpu.CompilerParams(dimension_semantics=("parallel", "parallel", "parallel"))
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, ws, cw, c), lambda bi, i, j: (bi, i, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=compiler_params,
        interpret=interpret,
    )(*operands)


def _mlp_kernel(x_ref, ln_scale_ref, ln_bias_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref):
    x = x_ref[...]
    x32 = x.astype(jnp.float32)
    ln = _layernorm(x32, ln_scale_ref[0].astype(jnp.float32), ln_bias_ref[0].astype(jnp.float32))
    h = jnp.dot(ln.astype(x.dtype), w1_ref[...], preferred_element_type=jnp.float32) + b1_ref[0].astype(jnp.float32)
    h = 0.5 * h * (1.0 + _erf(h * np.float32(1.0 / np.sqrt(2.0))))
    y = jnp.dot(h.astype(x.dtype), w2_ref[...], preferred_element_type=jnp.float32) + b2_ref[0].astype(jnp.float32)
    out_ref[...] = (x32 + y).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_rows", "interpret"))
def fused_mlp_block(
    x: jnp.ndarray,  # (rows, C)
    ln_scale, ln_bias, w1, b1, w2, b2,
    block_rows: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows, c = x.shape
    hidden = w1.shape[1]
    pad = (-rows) % block_rows
    xp = jnp.pad(x, ((0, pad), (0, 0))) if pad else x

    full = lambda *shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
    compiler_params = None
    if not interpret:
        compiler_params = pltpu.CompilerParams(dimension_semantics=("parallel",))
    out = pl.pallas_call(
        _mlp_kernel,
        grid=((rows + pad) // block_rows,),
        in_specs=[
            pl.BlockSpec((block_rows, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            full(1, c), full(1, c), full(c, hidden), full(1, hidden), full(hidden, c), full(1, c),
        ],
        out_specs=pl.BlockSpec((block_rows, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(xp.shape, x.dtype),
        compiler_params=compiler_params,
        interpret=interpret,
    )(xp, ln_scale.reshape(1, c), ln_bias.reshape(1, c), w1, b1.reshape(1, hidden), w2, b2.reshape(1, c))
    return out[:rows] if pad else out
