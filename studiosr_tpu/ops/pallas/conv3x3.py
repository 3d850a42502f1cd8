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

ROW_BAND = 16  # band-8 won the micro (1.712 vs 1.762) but lost in context (1.3778 vs 1.3835 MP/s)
# The nine shifted conv slices put band-16 kernels at ~18-23 MB of Mosaic
# scoped stack; raise the budget past the 16 MB default (same escape jax's
# TPU flash attention uses) instead of shrinking bands (smaller bands cost
# halo re-reads).
VMEM_LIMIT = 64 * 1024 * 1024


def _act(y, kind):
    if kind == "relu":
        return jnp.maximum(y, 0.0)
    if kind and kind.startswith("lrelu"):
        # optional slope suffix: "lrelu" = torch default, "lrelu0.2" = SFB's
        slope = float(kind[5:]) if len(kind) > 5 else 0.01
        return jnp.where(y >= 0, y, slope * y)
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


def _conv9(x, w_ref, b, oh, ow, dx0=0):
    # Alignment discipline (measured, v5e): a dot whose lhs free width is not
    # a sublane multiple (e.g. 258) forces a relayout of the WHOLE operand at
    # EVERY tap (~96 us/tap at (12,258,180) — the round-3 CAB dissection), so
    # ``ow`` must be a multiple of 8; callers run intermediate stages at
    # padded widths and mask the junk columns. The dx column shifts are also
    # hoisted out of the tap loop: at most 3 slice copies once per conv
    # (offset-misaligned ones relayout), with dy row slices riding the
    # untiled axis free.
    cols = [x[:, dx0 + dx : dx0 + dx + ow, :] for dx in range(3)]
    acc = None
    for dy in range(3):
        for dx in range(3):
            t = jax.lax.dot_general(
                cols[dx][dy : dy + oh], w_ref[dy, dx],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = t if acc is None else acc + t
    return acc + b.astype(jnp.float32)


def prepare_conv3x3_weights(w, dtype):
    """Pre-lay a (3, 3, Cin, Cout) conv weight into fused_conv3x3's stacked
    operand layout (pass with ``prepped=True``). Same math as the in-trace
    prep; pre-laying removes the per-forward pad/transpose passes."""
    cin = w.shape[2]
    cp = ((cin + 127) // 128) * 128
    return _stack_weights(w, cp).astype(dtype)


def _stack_weights(w, cpad: int):
    """(3, 3, C, Cout) -> (3, 3*cpad, Cout): per-dx weights with the three dy
    taps stacked along a lane-padded K axis (see _conv3_stacked)."""
    c, cout = w.shape[2], w.shape[3]
    wp = jnp.pad(w.astype(jnp.float32), ((0, 0), (0, 0), (0, cpad - c), (0, 0)))
    # (dx, dy*cpad + c, cout)
    return wp.transpose(1, 0, 2, 3).reshape(3, 3 * cpad, cout)


def _conv3_stacked(x, w3_ref, b, oh, ow, dx0, cpad):
    """3x3 conv as THREE dots (one per dx) instead of nine: the dy taps ride
    a lane-stacked K axis. Per-dot overhead measured ~27 us on v5e even for
    aligned operands (round-3 CAB dissection), so 3 big dots beat 9 small.

    x: (rows, W', C) with C <= cpad (lane-padded inside); the three dy
    row-shifts are untiled-axis slices (free) and the lane concat is at
    cpad-multiples (128-aligned, Mosaic-legal). ``ow`` must be 8-aligned."""
    c = x.shape[-1]
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, cpad - c))) if cpad != c else x
    acc = None
    for dx in range(3):
        col = xp[:, dx0 + dx : dx0 + dx + ow, :]
        lhs = jnp.concatenate([col[dy : dy + oh] for dy in range(3)], axis=-1)
        t = jax.lax.dot_general(
            lhs, w3_ref[dx],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = t if acc is None else acc + t
    return acc + b.astype(jnp.float32)


def _conv_kernel(prev_ref, cur_ref, next_ref, w_ref, b_ref, out_ref, *, activation, residual, extra_ref=None):
    from jax.experimental import pallas as pl

    i = pl.program_id(1)
    t = cur_ref.shape[1]
    w_img = cur_ref.shape[2]
    cp = w_ref.shape[1] // 3
    x = _assemble_band(prev_ref, cur_ref, next_ref, i, pl.num_programs(1), 1)
    xp = _col_pad(x, 1)
    y = _act(_conv3_stacked(xp, w_ref, b_ref[0], t, w_img, 0, cp), activation)
    if residual:
        y = y + cur_ref[0].astype(jnp.float32)
    if extra_ref is not None:
        # Residual join folded into the conv pass: serving's `conv(x) + skip`
        # otherwise lowers to a standalone map-scale XLA add (one full
        # read+read+write pass — scripts/exp_hlo_audit.py found six of them
        # around the RSTB convs).
        y = y + extra_ref[0].astype(jnp.float32)
    out_ref[0] = y.astype(out_ref.dtype)


def _resblock_kernel(prev_ref, cur_ref, next_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref, *, res_scale, activation="relu"):
    from jax.experimental import pallas as pl

    i = pl.program_id(1)
    t = cur_ref.shape[1]
    w_img = cur_ref.shape[2]
    cp1 = w1_ref.shape[1] // 3
    cp2 = w2_ref.shape[1] // 3
    x = _assemble_band(prev_ref, cur_ref, next_ref, i, pl.num_programs(1), 2)
    xp = _col_pad(x, 8)  # (t+4, W+16, C): 8-col zero pads keep every stage's
    # dot width a sublane multiple (see _conv9 alignment discipline).
    # h1 cols [-4, W+4): xp index c+8 is image col c.
    h1 = _act(_conv3_stacked(xp, w1_ref, b1_ref[0], t + 2, w_img + 8, 3, cp1), activation)
    # Out-of-image h1 values must be zero for conv2's zero padding
    # (act(b1) may be nonzero at the zero-padded borders — mask explicitly).
    rg = jax.lax.broadcasted_iota(jnp.int32, (t + 2, 1, 1), 0) + i * t - 1
    ok_r = (rg >= 0) & (rg < pl.num_programs(1) * t)
    cg = jax.lax.broadcasted_iota(jnp.int32, (1, h1.shape[1], 1), 1) - 4
    ok_c = (cg >= 0) & (cg < w_img)
    h1 = jnp.where(ok_r & ok_c, h1, jnp.zeros_like(h1)).astype(cur_ref.dtype)
    # y cols [0, W): h1 index c+4 is image col c.
    y = _conv3_stacked(h1, w2_ref, b2_ref[0], t, w_img, 3, cp2)
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


def _xla_conv3(x, w, b):
    """Plain SAME 3x3 conv (the XLA fallback the fused kernels decline to)."""
    return (
        jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), (1, 1), [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        + b.astype(x.dtype)
    )


@functools.partial(jax.jit, static_argnames=("activation", "residual", "prepped", "interpret"))
def fused_conv3x3(
    x: jnp.ndarray,  # (B, H, W, Cin)
    w: jnp.ndarray,  # (3, 3, Cin, Cout), or stacked (3, 3*cp, Cout) if prepped
    b: jnp.ndarray,  # (Cout,)
    activation: Optional[str] = None,
    residual: bool = False,
    extra=None,  # optional (B, H, W, Cout) residual join added in-kernel
    prepped: bool = False,  # w already in prepare_conv3x3_weights layout
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
    cp = ((cin + 127) // 128) * 128
    if prepped:
        ws3 = w
        assert ws3.shape == (3, 3 * cp, cout), (ws3.shape, cp)
    else:
        ws3 = _stack_weights(w, cp).astype(x.dtype)
    full = lambda *shape: pl.BlockSpec(shape, lambda bi, i: (0,) * len(shape), memory_space=pltpu.VMEM)
    in_specs = _band_specs(bsz, hgt, wdt, cin, t, 1) + [full(3, 3 * cp, cout), full(1, cout)]
    operands = [x, x, x, ws3, b.reshape(1, -1).astype(jnp.float32)]
    if extra is not None:
        engagement.engaged("conv3x3_join_fold")
        in_specs.append(pl.BlockSpec((1, t, wdt, cout), lambda bi, i: (bi, i, 0, 0), memory_space=pltpu.VMEM))
        operands.append(extra)

        def kernel(p_ref, c_ref, n_ref, w_ref, b_ref, e_ref, o_ref):
            _conv_kernel(p_ref, c_ref, n_ref, w_ref, b_ref, o_ref,
                         activation=activation, residual=residual, extra_ref=e_ref)

    else:
        kernel = functools.partial(_conv_kernel, activation=activation, residual=residual)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, t, wdt, cout), lambda bi, i: (bi, i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, hgt, wdt, cout), x.dtype),
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"), vmem_limit_bytes=VMEM_LIMIT
        ),
        interpret=interpret,
    )(*operands)


@functools.partial(jax.jit, static_argnames=("res_scale", "band", "activation", "prepped", "interpret"))
def fused_resblock(
    x: jnp.ndarray,  # (B, H, W, C)
    w1, b1, w2, b2,
    res_scale: float = 1.0,
    band: int = 8,  # band 16 VMEM-OOMs in Mosaic's scoped stack (35 MB)
    activation: str = "relu",  # "lrelu0.2" for SwinFIR's SFB spatial branch
    prepped: bool = False,  # w1/w2 already in prepare_conv3x3_weights layout
    interpret: bool = False,
) -> jnp.ndarray:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from studiosr_tpu.ops.pallas import engagement

    bsz, hgt, wdt, c = x.shape
    t = min(band, _row_band(hgt))
    while hgt % t:
        t //= 2
    if hgt % 2 or t % 2:
        # _band_specs' 2-row halo blocks need hgt and the band both even:
        # t // halo == 0 degenerates the neighbor index maps to block 0 and
        # the kernel silently computes garbage at every band boundary.
        # Fall back to the two-pass streaming convs (handles prepped too).
        engagement.fallback("fused_resblock", f"odd height {hgt}: halo-2 band layout needs 2-row alignment")
        h1 = fused_conv3x3(x, w1, b1, activation=activation, prepped=prepped, interpret=interpret)
        y = fused_conv3x3(h1, w2, b2, prepped=prepped, interpret=interpret)
        return x + jnp.asarray(res_scale, x.dtype) * y
    engagement.engaged("fused_resblock")
    grid = (bsz, hgt // t)
    full = lambda *shape: pl.BlockSpec(shape, lambda bi, i: (0,) * len(shape), memory_space=pltpu.VMEM)
    kernel = functools.partial(_resblock_kernel, res_scale=res_scale, activation=activation)
    cp = ((c + 127) // 128) * 128
    if prepped:
        w1s, w2s = w1, w2
        assert w1s.shape == (3, 3 * cp, c), (w1s.shape, cp)
    else:
        w1s = _stack_weights(w1, cp).astype(x.dtype)
        w2s = _stack_weights(w2, cp).astype(x.dtype)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=_band_specs(bsz, hgt, wdt, c, t, 2)
        + [full(3, 3 * cp, c), full(1, c), full(3, 3 * cp, c), full(1, c)],
        out_specs=pl.BlockSpec((1, t, wdt, c), lambda bi, i: (bi, i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"), vmem_limit_bytes=VMEM_LIMIT
        ),
        interpret=interpret,
    )(x, x, x, w1s, b1.reshape(1, -1).astype(jnp.float32),
      w2s, b2.reshape(1, -1).astype(jnp.float32))


def _cab_kernel(prev_ref, cur_ref, next_ref, s_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                out_ref, psum_ref, *, res_scale, ablate=frozenset()):
    """HAT CAB body: y2 = conv2(gelu(conv1(LN(x)))) on a row band, plus the
    per-band channel sums of y2 (the caller finishes the global-mean channel
    attention gate in XLA — it needs all bands).

    ``ablate`` (timing-only, wrong math): subsets of {"ln", "conv1", "gelu",
    "conv2", "mask"} skip that stage (scripts/exp_cab_micro.py dissection)."""
    from jax.experimental import pallas as pl

    from studiosr_tpu.ops.pallas.swin_block import _erf, _layernorm

    i = pl.program_id(1)
    t = cur_ref.shape[1]
    x = _assemble_band(prev_ref, cur_ref, next_ref, i, pl.num_programs(1), 2)
    if "ln" in ablate:
        ln = x
    else:
        ln = _layernorm(
            x.astype(jnp.float32), s_ref[0].astype(jnp.float32), b_ref[0].astype(jnp.float32)
        ).astype(cur_ref.dtype)
    # Re-zero the out-of-image halo rows (LN of zeros is bias-shifted, the
    # true chain's conv padding is zero AFTER LN).
    if "mask" not in ablate:
        rg0 = jax.lax.broadcasted_iota(jnp.int32, (t + 4, 1, 1), 0) + i * t - 2
        ln = jnp.where((rg0 >= 0) & (rg0 < pl.num_programs(1) * t), ln, jnp.zeros_like(ln))
    w_img = cur_ref.shape[2]
    lnp = _col_pad(ln, 8)  # (t+4, W+16, C): aligned-width stages, see _conv9
    cp1 = w1_ref.shape[1] // 3
    cp2 = w2_ref.shape[1] // 3

    if "conv1" in ablate:
        # keep shapes: single-tap projection instead of the 3-dot conv
        h1 = jax.lax.dot_general(
            jnp.pad(lnp[1 : t + 3, 4 : 4 + w_img + 8, :], ((0, 0), (0, 0), (0, cp1 - lnp.shape[-1]))),
            w1_ref[1, cp1 : 2 * cp1],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    else:
        # h1 cols [-4, W+4): lnp index c+8 is image col c.
        h1 = _conv3_stacked(lnp, w1_ref, b1_ref[0], t + 2, w_img + 8, 3, cp1)
    if "gelu" not in ablate:
        h1 = 0.5 * h1 * (1.0 + _erf(h1 * np.float32(1.0 / np.sqrt(2.0))))
    if "mask" not in ablate:
        rg = jax.lax.broadcasted_iota(jnp.int32, (t + 2, 1, 1), 0) + i * t - 1
        ok_r = (rg >= 0) & (rg < pl.num_programs(1) * t)
        cg = jax.lax.broadcasted_iota(jnp.int32, (1, h1.shape[1], 1), 1) - 4
        ok_c = (cg >= 0) & (cg < w_img)
        h1 = jnp.where(ok_r & ok_c, h1, jnp.zeros_like(h1)).astype(cur_ref.dtype)
    else:
        h1 = h1.astype(cur_ref.dtype)
    if "conv2" in ablate:
        y2 = jax.lax.dot_general(
            jnp.pad(h1[1 : t + 1, 4 : 4 + w_img, :], ((0, 0), (0, 0), (0, cp2 - h1.shape[-1]))),
            w2_ref[1, cp2 : 2 * cp2],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * res_scale
    else:
        # y2 cols [0, W): h1 index c+4 is image col c.
        y2 = _conv3_stacked(h1, w2_ref, b2_ref[0], t, w_img, 3, cp2) * res_scale
    out_ref[0] = y2.astype(out_ref.dtype)
    # (8, C) broadcast: Pallas requires the last-two block dims be
    # (8k, lanes); row 0 is read back outside.
    psum_ref[0] = jnp.broadcast_to(jnp.sum(y2, axis=(0, 1))[None], (8, y2.shape[-1]))


def prepare_cab_weights(w1, w2, dtype):
    """Pre-lay fused_cab_body's two conv weights (pass via ``prep=``)."""
    return {"w1s": prepare_conv3x3_weights(w1, dtype), "w2s": prepare_conv3x3_weights(w2, dtype)}


@functools.partial(jax.jit, static_argnames=("res_scale", "band", "interpret", "ablate"))
def fused_cab_body(
    x: jnp.ndarray,  # (B, H, W, C) — the block input (pre-LN)
    ln_scale, ln_bias,
    w1, b1,  # (3, 3, C, Cm)
    w2, b2,  # (3, 3, Cm, C)
    res_scale: float = 1.0,
    band: int = 4,  # 8 VMEM-OOMs at C=180 (the nine shifted conv slices
    # each materialize a relayout copy; 23.4M scoped > 16M)
    interpret: bool = False,
    ablate: frozenset = frozenset(),  # timing-only stage skips
    prep=None,  # optional prepare_cab_weights dict
):
    """One-pass HAT CAB trunk (``studiosr/models/hat.py`` CAB): returns
    (y2, channel_sums) with y2 = res_scale * conv2(gelu(conv1(LN(x)))) and
    channel_sums = sum over H, W of y2 (feeds the squeeze-excite gate)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from studiosr_tpu.ops.pallas import engagement

    bsz, hgt, wdt, c = x.shape
    cm = w1.shape[-1]
    t = min(band, _row_band(hgt))
    while hgt % t:
        t //= 2
    if hgt % 2 or t % 2:
        # Same halo-2 alignment requirement as fused_resblock (above): odd
        # heights degenerate the neighbor blocks and corrupt band borders.
        from studiosr_tpu.ops.pallas.swin_block import _layernorm

        engagement.fallback("fused_cab_body", f"odd height {hgt}: halo-2 band layout needs 2-row alignment")
        ln = _layernorm(
            x.astype(jnp.float32), ln_scale.astype(jnp.float32), ln_bias.astype(jnp.float32)
        ).astype(x.dtype)
        h1 = _xla_conv3(ln, w1, b1)
        h1 = (0.5 * h1.astype(jnp.float32) * (1.0 + jax.lax.erf(h1.astype(jnp.float32) / np.sqrt(2.0)))).astype(x.dtype)
        y2 = (jnp.asarray(res_scale, jnp.float32) * _xla_conv3(h1, w2, b2).astype(jnp.float32)).astype(x.dtype)
        return y2, jnp.sum(y2.astype(jnp.float32), axis=(1, 2))
    engagement.engaged("fused_cab_body")
    grid = (bsz, hgt // t)
    full = lambda *shape: pl.BlockSpec(shape, lambda bi, i: (0,) * len(shape), memory_space=pltpu.VMEM)
    kernel = functools.partial(_cab_kernel, res_scale=res_scale, ablate=ablate)
    cp1 = ((c + 127) // 128) * 128
    cp2 = ((cm + 127) // 128) * 128
    if prep is not None:
        w1s, w2s = prep["w1s"], prep["w2s"]
        assert w1s.shape == (3, 3 * cp1, cm) and w2s.shape == (3, 3 * cp2, c)
    else:
        w1s = _stack_weights(w1, cp1).astype(x.dtype)  # (3, 3*cp1, cm)
        w2s = _stack_weights(w2, cp2).astype(x.dtype)  # (3, 3*cp2, c)
    y2, psums = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=_band_specs(bsz, hgt, wdt, c, t, 2)
        + [full(1, c), full(1, c), full(3, 3 * cp1, cm), full(1, cm), full(3, 3 * cp2, c), full(1, c)],
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
      w1s, b1.reshape(1, -1).astype(jnp.float32),
      w2s, b2.reshape(1, -1).astype(jnp.float32))
    return y2, jnp.sum(psums.reshape(bsz, hgt // t, 8, c)[:, :, 0], axis=1)
