"""Chained Swin block-pair kernel: two blocks per HBM round-trip.

QUARANTINED — measured SLOWER in context (v5e, bench.py SwinIR x4 bf16):
1.2875 MP/s vs 1.4751 with per-block whole-block kernels, i.e. the chained
pair costs ~2.33 ms vs 1.96 ms for two separate calls. The halved HBM
traffic is real, but a 2x-bigger program with "arbitrary" grid semantics
loses Mosaic's across-grid-step DMA/compute overlap — the same mechanism
that made stripes-per-program 2x slower in round 2 (CLAUDE.md). Parity was
fully validated (check_swin_chain.py: odd-window geometry, cyclic wrap,
entry-shift re-read, batch ring reset) before measuring.

The serving path is HBM-bandwidth-bound (STATUS.md): each whole-block kernel
(``ops/pallas/swin_block.fused_swin_block``) reads and writes the full
(H, W, C) map once per block, and block ``b``'s output is consumed *only* by
block ``b+1`` (SwinIR RSTBs have no per-block skip outside the block —
reference ``/root/reference/studiosr/models/swinir.py:194-213``; the residual
group skip joins after the conv). This kernel computes an
(unshifted, shifted) block pair per grid step and keeps the intermediate map
in a VMEM scratch ring across sequential grid steps, so the pair costs ONE
map read + ONE map write instead of two of each.

Mechanics (builds on the round-3 shift-fold machinery in
``_swin_block_kernel_shifted``):

* grid = (batch, n_stripes + 1), ``arbitrary`` dimension semantics so steps
  run in order and scratch carries across steps.
* step ``i < S`` computes block ``b`` on stripe ``i`` (optionally assembling
  its input from two wrapped half-stripe reads + an in-register column
  rotate, when the incoming map is in the rolled space left by a previous
  pair) and stores the result in a 2-slot ring; step 0 additionally pins its
  upper half for the cyclic wrap.
* step ``i > 0`` assembles the *rolled-space* stripe ``i-1`` of the
  intermediate map from ring slots (ring[i-1] lower half ++ ring[i] upper
  half; the final step substitutes the pinned stripe-0 half), rotates the
  columns in-register, and computes the shifted block ``b+1`` with its
  attention mask. The output is written in the rolled (-ws/2, -ws/2) space;
  callers track the space exactly as for ``read_shift`` (serving/swinir_fast).

Numerics are identical to the two-call path: the intermediate stripe is
cast to the map dtype (bf16) in the ring, exactly as the HBM round-trip
would. Validated against chained ``fused_swin_block`` calls in
tests/ops/test_swin_chain.py (interpret mode, odd-window geometry).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from studiosr_tpu.ops.pallas.swin_block import (
    _pad_head_weights,
    _pair_embed_bias,
    _select_chunk,
    _swin_block_body,
    shift_fold_supported,
)

__all__ = ["fused_swin_block_chain2", "chain_supported"]


def chain_supported(x_shape, heads: int, window_size: int) -> bool:
    """Same layout requirements as the shift fold: the in-register column
    rotate must span a full row, so one program must cover the whole stripe."""
    return shift_fold_supported(x_shape, heads, window_size)


def _chain2_kernel(
    refs,
    *,
    heads: int,
    window_size: int,
    dp: int,
    pairs: bool,
    nstripes: int,
    entry: bool,
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ws = window_size
    half = ws // 2
    idx = 2 if entry else 1
    wa = refs[idx : idx + 13]
    wb = refs[idx + 13 : idx + 26]
    mask_ref = refs[idx + 26]
    out_ref = refs[idx + 27]
    yring = refs[idx + 28]
    ypin = refs[idx + 29]

    i = pl.program_id(1)
    w = out_ref.shape[2]

    def block(wts, x, mask):
        return _swin_block_body(
            x,
            wts[0][0], wts[1][0], wts[2][...], wts[3][0], wts[4][...], wts[5][0],
            wts[6][...], mask,
            wts[7][0], wts[8][0], wts[9][...], wts[10][0], wts[11][...], wts[12][0],
            None, None, None, None,
            heads=heads, window_size=ws, dp=dp, pairs=pairs,
        )

    @pl.when(i < nstripes)
    def _():
        if entry:
            # Incoming map is in the rolled space: un-roll on the fly (two
            # wrapped half-stripe reads + in-register column rotate), same as
            # fused_swin_block's read_shift < 0.
            x = jnp.concatenate([refs[0][0], refs[1][0]], axis=0)
            x = pltpu.roll(x.astype(jnp.float32), half, 1).astype(out_ref.dtype)
        else:
            x = refs[0][0]
        y = block(wa, x, None).astype(out_ref.dtype)
        yring[i % 2] = y

        @pl.when(i == 0)
        def _():
            ypin[...] = y[:half]

    @pl.when(i > 0)
    def _():
        # Rolled-space stripe i-1 of the intermediate map: rows
        # [(i-1)*ws + half, i*ws + half) = Y_{i-1} lower half ++ Y_i upper
        # half; the wrap step (i == nstripes) takes Y_0's pinned upper half.
        top = yring[(i - 1) % 2][half:]
        ring_bot = yring[i % 2][:half]
        bot = jnp.where(i < nstripes, ring_bot, ypin[...])
        z = jnp.concatenate([top, bot], axis=0)
        z = pltpu.roll(z.astype(jnp.float32), w - half, 1).astype(out_ref.dtype)
        y2 = block(wb, z, mask_ref[...])
        out_ref[0] = y2.astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("heads", "window_size", "entry_shift", "interpret")
)
def fused_swin_block_chain2(
    x: jnp.ndarray,  # (B, H, W, C) map; aligned space, or rolled if entry_shift
    wa,  # 13-tuple for the unshifted block: (ln1 s, ln1 b, wqkv, bqkv, wproj,
    #      bproj, bias (heads,N,N), ln2 s, ln2 b, w1, b1, w2, b2)
    wb,  # 13-tuple for the shifted block (same layout)
    mask: jnp.ndarray,  # (nW, N, N) shift mask for the shifted block
    heads: int,
    window_size: int,
    entry_shift: bool = False,  # True when ``x`` is in the rolled space
    interpret: bool = False,
) -> Optional[jnp.ndarray]:
    """Two Swin blocks (unshifted then shifted, the RSTB alternation) in one
    HBM pass. Returns the map in the ROLLED (-ws/2, -ws/2) space — callers
    track the space as with ``read_shift`` — or ``None`` when the layout
    doesn't support the fold (gate on :func:`chain_supported`)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from studiosr_tpu.ops.pallas import engagement

    b, hgt, w, c = x.shape
    ws = window_size
    n = ws * ws
    nw_row = w // ws
    half = ws // 2

    if not chain_supported(x.shape, heads, ws):
        return engagement.fallback(
            "swin_chain2", f"layout mismatch: shape {x.shape}, ws={ws}"
        )
    chunk, use_pairs = _select_chunk(nw_row, heads, n)
    engagement.engaged("swin_chain2")

    nstripes = hgt // ws
    hb = 2 * nstripes  # half-stripe row blocks (entry-fold index maps)
    d = c // heads
    dp = ((d + 31) // 32) * 32
    s = heads * dp

    def prep(wts):
        (s1, b1, wqkv, bqkv, wproj, bproj, bias, s2, b2, w1, fb1, w2, fb2) = wts
        wqkv_pad, bqkv_pad, wproj_pad = _pad_head_weights(wqkv, bqkv, wproj, heads, d, dp)
        bias2 = _pair_embed_bias(bias, n) if use_pairs else bias
        hidden = w1.shape[1]
        specs = [
            _full(1, c), _full(1, c),
            _full(c, 3 * s), _full(1, 3 * s), _full(s, c), _full(1, c),
            _full(*bias2.shape),
            _full(1, c), _full(1, c),
            _full(c, hidden), _full(1, hidden), _full(hidden, c), _full(1, c),
        ]
        ops = [
            s1.reshape(1, c), b1.reshape(1, c),
            wqkv_pad, bqkv_pad.reshape(1, -1), wproj_pad, bproj.reshape(1, c),
            bias2,
            s2.reshape(1, c), b2.reshape(1, c),
            w1, fb1.reshape(1, hidden), w2, fb2.reshape(1, c),
        ]
        return specs, ops

    def _full(*shape):
        return pl.BlockSpec(shape, lambda bi, i: (0,) * len(shape), memory_space=pltpu.VMEM)

    specs_a, ops_a = prep(wa)
    specs_b, ops_b = prep(wb)

    if entry_shift:
        in_specs = [
            pl.BlockSpec((1, half, w, c), lambda bi, i: (bi, (2 * i - 1) % hb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, half, w, c), lambda bi, i: (bi, (2 * i) % hb, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        operands = [x, x]
    else:
        in_specs = [
            pl.BlockSpec((1, ws, w, c), lambda bi, i: (bi, i % nstripes, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        operands = [x]
    in_specs += specs_a + specs_b
    operands += ops_a + ops_b
    # Shifted-block mask for rolled stripe i-1 (unused garbage at step 0).
    in_specs.append(
        pl.BlockSpec((nw_row, n, n), lambda bi, i: ((i - 1) % nstripes, 0, 0),
                     memory_space=pltpu.VMEM)
    )
    operands.append(mask)

    kernel = functools.partial(
        lambda *refs, **kw: _chain2_kernel(refs, **kw),
        heads=heads, window_size=ws, dp=dp, pairs=use_pairs,
        nstripes=nstripes, entry=entry_shift,
    )
    compiler_params = None
    if not interpret:
        compiler_params = pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        )
    return pl.pallas_call(
        kernel,
        grid=(b, nstripes + 1),
        in_specs=in_specs,
        # Step 0 writes garbage to block (nstripes-1); step nstripes (the
        # wrap) overwrites it — steps run in order (arbitrary semantics).
        out_specs=pl.BlockSpec((1, ws, w, c), lambda bi, i: (bi, (i - 1) % nstripes, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, ws, w, c), x.dtype),
            pltpu.VMEM((half, w, c), x.dtype),
        ],
        compiler_params=compiler_params,
        interpret=interpret,
    )(*operands)
