"""Streaming 3x3 convolution kernels (Pallas TPU).

XLA's conv on the (1, H, W, C) SwinIR/EDSR feature maps measured ~2.4x the
streaming bound in context (1.4 ms vs 0.57 at 256x256x180 — STATUS.md
round-2 dissection), and every ResBlock/RSTB boundary pays it. These kernels
stream the map once: the grid walks row-bands, each program assembles its
band plus a 1-row halo from two extra same-array operands (index-clamped
blocks of the neighbor bands; out-of-image rows are zeroed in-kernel), adds
zero column padding in VMEM, and computes the conv as nine shifted
(rows, Cin) x (Cin, Cout) MXU dots.

* :func:`fused_conv3x3` — y = act(conv(x) + b) [+ x]: one conv, optional
  relu/lrelu activation, optional residual add (reference conv uses,
  ``studiosr/models/common.py:16-22``).
* :func:`fused_resblock` — y = x + res_scale * conv2(relu(conv1(x))): the
  EDSR/SRResNet ResBlock body (``common.py:140-160``) with a 2-row halo, one
  HBM pass instead of two.

Validated against XLA convs in tests/ops/test_conv3x3.py.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["fused_conv3x3", "fused_resblock", "fused_cab_body"]

ROW_BAND = 16
# The nine shifted conv slices put band-16 kernels at ~18-23 MB of Mosaic
# scoped stack; raise the budget past the 16 MB default (same escape jax's
# TPU flash attention uses) instead of shrinking bands (smaller bands cost
# halo re-reads).
VMEM_LIMIT = 64 * 1024 * 1024


def _act(y, kind):
    if kind == "relu":
        return jnp.maximum(y, 0.0)
    if kind == "lrelu":
        return jnp.where(y >= 0, y, 0.01 * y)
    return y


def _assemble_band(prev_ref, cur_ref, next_ref, i, n_bands, halo):
    """(band + 2*halo, W, C) from the cur band plus halo-row neighbor blocks
    (index-clamped), with out-of-image halo rows zeroed."""
    t = cur_ref.shape[1]
    x = jnp.concatenate([prev_ref[0], cur_ref[0], next_ref[0]], axis=0)  # (t + 2*halo, W, C)
    rg = jax.lax.broadcasted_iota(jnp.int32, (t + 2 * halo, 1, 1), 0) + i * t - halo
    ok = (rg >= 0) & (rg < n_bands * t)
    return jnp.where(ok, x, jnp.zeros_like(x))


def _col_pad(x, halo):
    h, w, c = x.shape
    z = jnp.zeros((h, halo, c), x.dtype)
    return jnp.concatenate([z, x, z], axis=1)


def _conv9(x, w_ref, b, oh, ow):
    acc = None
    for dy in range(3):
        for dx in range(3):
            t = jax.lax.dot_general(
                x[dy : dy + oh, dx : dx + ow, :], w_ref[dy, dx],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = t if acc is None else acc + t
    return acc + b.astype(jnp.float32)


def _conv_kernel(prev_ref, cur_ref, next_ref, w_ref, b_ref, out_ref, *, activation, residual):
    from jax.experimental import pallas as pl

    i = pl.program_id(1)
    t = cur_ref.shape[1]
    x = _assemble_band(prev_ref, cur_ref, next_ref, i, pl.num_programs(1), 1)
    xp = _col_pad(x, 1)
    y = _act(_conv9(xp, w_ref, b_ref[0], t, xp.shape[1] - 2), activation)
    if residual:
        y = y + cur_ref[0].astype(jnp.float32)
    out_ref[0] = y.astype(out_ref.dtype)


def _resblock_kernel(prev_ref, cur_ref, next_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref, *, res_scale):
    from jax.experimental import pallas as pl

    i = pl.program_id(1)
    t = cur_ref.shape[1]
    x = _assemble_band(prev_ref, cur_ref, next_ref, i, pl.num_programs(1), 2)
    xp = _col_pad(x, 2)  # (t+4, W+4, C)
    h1 = jnp.maximum(_conv9(xp, w1_ref, b1_ref[0], t + 2, xp.shape[1] - 2), 0.0)
    # h1 columns carry a 1-px halo; rows likewise. Out-of-image h1 values
    # must be zero for conv2's zero padding (cols are exact already; rows
    # need masking only at the image border, handled by _assemble_band's
    # zeroed 2-row halo making conv1 output 0... relu(b1) may be nonzero, so
    # mask explicitly).
    rg = jax.lax.broadcasted_iota(jnp.int32, (t + 2, 1, 1), 0) + i * t - 1
    ok_r = (rg >= 0) & (rg < pl.num_programs(1) * t)
    cg = jax.lax.broadcasted_iota(jnp.int32, (1, h1.shape[1], 1), 1) - 1
    ok_c = (cg >= 0) & (cg < h1.shape[1] - 2)
    h1 = jnp.where(ok_r & ok_c, h1, jnp.zeros_like(h1)).astype(cur_ref.dtype)
    y = _conv9(h1, w2_ref, b2_ref[0], t, h1.shape[1] - 2)
    out_ref[0] = (cur_ref[0].astype(jnp.float32) + res_scale * y).astype(out_ref.dtype)


def _band_specs(b, hgt, w, c, t, halo):
    """cur band (t rows) + two halo operands fetching only ``halo`` rows each
    (same array, halo-row block granularity, index-clamped at the borders —
    the kernel zeroes the out-of-image rows). Extra read traffic is
    2*halo/t, not the 2x a full-band neighbor fetch would cost."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_hb = hgt // halo  # halo-block units
    r = t // halo
    clamp = lambda v: jnp.clip(v, 0, n_hb - 1)
    return [
        pl.BlockSpec((1, halo, w, c), lambda bi, i: (bi, clamp(i * r - 1), 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, t, w, c), lambda bi, i: (bi, i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, halo, w, c), lambda bi, i: (bi, clamp((i + 1) * r), 0, 0), memory_space=pltpu.VMEM),
    ]


def _row_band(hgt: int) -> int:
    for t in (ROW_BAND, 8, 4, 2, 1):
        if hgt % t == 0:
            return t
    return 1


@functools.partial(jax.jit, static_argnames=("activation", "residual", "interpret"))
def fused_conv3x3(
    x: jnp.ndarray,  # (B, H, W, Cin)
    w: jnp.ndarray,  # (3, 3, Cin, Cout)
    b: jnp.ndarray,  # (Cout,)
    activation: Optional[str] = None,
    residual: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from studiosr_tpu.ops.pallas import engagement

    engagement.engaged("fused_conv3x3")
    bsz, hgt, wdt, cin = x.shape
    cout = w.shape[-1]
    t = _row_band(hgt)
    grid = (bsz, hgt // t)
    full = lambda *shape: pl.BlockSpec(shape, lambda bi, i: (0,) * len(shape), memory_space=pltpu.VMEM)
    kernel = functools.partial(_conv_kernel, activation=activation, residual=residual)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=_band_specs(bsz, hgt, wdt, cin, t, 1) + [full(3, 3, cin, cout), full(1, cout)],
        out_specs=pl.BlockSpec((1, t, wdt, cout), lambda bi, i: (bi, i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, hgt, wdt, cout), x.dtype),
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"), vmem_limit_bytes=VMEM_LIMIT
        ),
        interpret=interpret,
    )(x, x, x, w.astype(x.dtype), b.reshape(1, -1).astype(jnp.float32))


@functools.partial(jax.jit, static_argnames=("res_scale", "band", "interpret"))
def fused_resblock(
    x: jnp.ndarray,  # (B, H, W, C)
    w1, b1, w2, b2,
    res_scale: float = 1.0,
    band: int = 8,  # band 16 VMEM-OOMs in Mosaic's scoped stack (35 MB)
    interpret: bool = False,
) -> jnp.ndarray:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bsz, hgt, wdt, c = x.shape
    t = min(band, _row_band(hgt))
    while hgt % t:
        t //= 2
    grid = (bsz, hgt // t)
    full = lambda *shape: pl.BlockSpec(shape, lambda bi, i: (0,) * len(shape), memory_space=pltpu.VMEM)
    kernel = functools.partial(_resblock_kernel, res_scale=res_scale)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=_band_specs(bsz, hgt, wdt, c, t, 2)
        + [full(3, 3, c, c), full(1, c), full(3, 3, c, c), full(1, c)],
        out_specs=pl.BlockSpec((1, t, wdt, c), lambda bi, i: (bi, i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"), vmem_limit_bytes=VMEM_LIMIT
        ),
        interpret=interpret,
    )(x, x, x, w1.astype(x.dtype), b1.reshape(1, -1).astype(jnp.float32),
      w2.astype(x.dtype), b2.reshape(1, -1).astype(jnp.float32))


def _cab_kernel(prev_ref, cur_ref, next_ref, s_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                out_ref, psum_ref, *, res_scale):
    """HAT CAB body: y2 = conv2(gelu(conv1(LN(x)))) on a row band, plus the
    per-band channel sums of y2 (the caller finishes the global-mean channel
    attention gate in XLA — it needs all bands)."""
    from jax.experimental import pallas as pl

    from studiosr_tpu.ops.pallas.swin_block import _erf, _layernorm

    i = pl.program_id(1)
    t = cur_ref.shape[1]
    x = _assemble_band(prev_ref, cur_ref, next_ref, i, pl.num_programs(1), 2)
    ln = _layernorm(
        x.astype(jnp.float32), s_ref[0].astype(jnp.float32), b_ref[0].astype(jnp.float32)
    ).astype(cur_ref.dtype)
    # Re-zero the out-of-image halo rows (LN of zeros is bias-shifted, the
    # true chain's conv padding is zero AFTER LN).
    rg0 = jax.lax.broadcasted_iota(jnp.int32, (t + 4, 1, 1), 0) + i * t - 2
    ln = jnp.where((rg0 >= 0) & (rg0 < pl.num_programs(1) * t), ln, jnp.zeros_like(ln))
    lnp = _col_pad(ln, 2)  # (t+4, W+4, C)

    h1 = _conv9(lnp, w1_ref, b1_ref[0], t + 2, lnp.shape[1] - 2)
    h1 = 0.5 * h1 * (1.0 + _erf(h1 * np.float32(1.0 / np.sqrt(2.0))))
    rg = jax.lax.broadcasted_iota(jnp.int32, (t + 2, 1, 1), 0) + i * t - 1
    ok_r = (rg >= 0) & (rg < pl.num_programs(1) * t)
    cg = jax.lax.broadcasted_iota(jnp.int32, (1, h1.shape[1], 1), 1) - 1
    ok_c = (cg >= 0) & (cg < h1.shape[1] - 2)
    h1 = jnp.where(ok_r & ok_c, h1, jnp.zeros_like(h1)).astype(cur_ref.dtype)
    y2 = _conv9(h1, w2_ref, b2_ref[0], t, h1.shape[1] - 2) * res_scale
    out_ref[0] = y2.astype(out_ref.dtype)
    # (8, C) broadcast: Pallas requires the last-two block dims be
    # (8k, lanes); row 0 is read back outside.
    psum_ref[0] = jnp.broadcast_to(jnp.sum(y2, axis=(0, 1))[None], (8, y2.shape[-1]))


@functools.partial(jax.jit, static_argnames=("res_scale", "band", "interpret"))
def fused_cab_body(
    x: jnp.ndarray,  # (B, H, W, C) — the block input (pre-LN)
    ln_scale, ln_bias,
    w1, b1,  # (3, 3, C, Cm)
    w2, b2,  # (3, 3, Cm, C)
    res_scale: float = 1.0,
    band: int = 4,  # 8 VMEM-OOMs at C=180 (the nine shifted conv slices
    # each materialize a relayout copy; 23.4M scoped > 16M)
    interpret: bool = False,
):
    """One-pass HAT CAB trunk (``studiosr/models/hat.py`` CAB): returns
    (y2, channel_sums) with y2 = res_scale * conv2(gelu(conv1(LN(x)))) and
    channel_sums = sum over H, W of y2 (feeds the squeeze-excite gate)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from studiosr_tpu.ops.pallas import engagement

    engagement.engaged("fused_cab_body")
    bsz, hgt, wdt, c = x.shape
    cm = w1.shape[-1]
    t = min(band, _row_band(hgt))
    while hgt % t:
        t //= 2
    grid = (bsz, hgt // t)
    full = lambda *shape: pl.BlockSpec(shape, lambda bi, i: (0,) * len(shape), memory_space=pltpu.VMEM)
    kernel = functools.partial(_cab_kernel, res_scale=res_scale)
    y2, psums = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=_band_specs(bsz, hgt, wdt, c, t, 2)
        + [full(1, c), full(1, c), full(3, 3, c, cm), full(1, cm), full(3, 3, cm, c), full(1, c)],
        out_specs=(
            pl.BlockSpec((1, t, wdt, c), lambda bi, i: (bi, i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, c), lambda bi, i: (bi, i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct((bsz, 8 * (hgt // t), c), jnp.float32),
        ),
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"), vmem_limit_bytes=VMEM_LIMIT
        ),
        interpret=interpret,
    )(x, x, x, ln_scale.reshape(1, c), ln_bias.reshape(1, c),
      w1.astype(x.dtype), b1.reshape(1, -1).astype(jnp.float32),
      w2.astype(x.dtype), b2.reshape(1, -1).astype(jnp.float32))
    return y2, jnp.sum(psums.reshape(bsz, hgt // t, 8, c)[:, :, 0], axis=1)
