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

__all__ = [
    "fused_window_attention_block",
    "fused_mlp_block",
    "fused_swin_block",
    "shift_fold_supported",
    "prepare_mask",
]

# Tunables for the per-program working set (see fused_window_attention_block).
MAX_CHUNK_WINDOWS = 34  # whole 33-window eval stripes in one program
# (chunk 33 measured 1.3833 vs 1.3725 MP/s at the bench shape, round 3)
SCORE_VMEM_BUDGET = 1_300_000  # bytes of f32 scores per head (ws16 -> 4 windows)
# Pair kernel: f32 scores + bf16 probs for ALL heads live at once.
PAIR_SCORE_VMEM_BUDGET = 9_000_000
# Measured-dead variants (LN via MXU matvecs: slower; heads-in-batch v5
# dots: neutral at ws=16) are quarantined under scripts/experiments/ with
# their STATUS.md measurements.


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


def _ln(x32, scale, bias):
    return _layernorm(x32, scale, bias)


def _select_pair_chunk(nw_row: int, heads: int, n: int) -> int:
    """Windows-per-program for the window-PAIR kernels (forward and
    backward — ops/pallas/attn_bwd.py uses this too, so both always pick
    the same chunking for a shape): the largest divisor of ``nw_row``
    whose padded-even pair count fits the pair VMEM budget. 0 = no fit.

    Pairing pays when 2N fills one MXU tile (ws=8 -> 128 rows); at ws>=12
    a single window already spans >=2 tiles and pairing only doubles the
    cross-window score waste and VMEM pressure. Odd divisors are fine —
    the kernel pads a zero dummy window (flip-padded eval maps have an
    ODD windows-per-row count, e.g. 33 at a 256 input)."""
    pair_max = max(2, PAIR_SCORE_VMEM_BUDGET // (heads * n * n * 8))
    chunk = 0
    if 2 * n <= 128:
        for cand in range(1, nw_row + 1):
            if nw_row % cand == 0 and cand + cand % 2 <= min(pair_max, MAX_CHUNK_WINDOWS):
                chunk = cand
    return chunk


def _select_chunk(nw_row: int, heads: int, n: int):
    """Windows-per-program choice shared by fused_swin_block,
    fused_window_attention_block and shift_fold_supported: the largest
    divisor of ``nw_row`` whose score block fits the pair / per-head VMEM
    budget. Returns (chunk, use_pairs); chunk == 0 means no layout fits."""
    chunk = _select_pair_chunk(nw_row, heads, n)
    if chunk:
        return chunk, True
    max_chunk = max(1, min(MAX_CHUNK_WINDOWS, (SCORE_VMEM_BUDGET // (n * n * 4))))
    chunk = 0
    for cand in range(1, nw_row + 1):
        if nw_row % cand == 0 and cand <= max_chunk:
            chunk = cand
    return chunk, False


def prepare_attention_weights(wqkv, bqkv, wproj, bias, heads: int, window_size: int, dtype):
    """Pre-lay the attention weights into the kernels' operand layout.

    The head padding / q-scale folding / pair bias embedding otherwise
    re-execute inside every traced forward — per the scan-body HLO audit
    they are NOT hoisted out of benchmark scan loops, and in per-image
    serving they run per call. Returns the dict consumed by
    ``fused_swin_block`` / ``fused_window_attention_block`` with
    ``prepped=True``; built by the SAME helper functions the wrappers use,
    so the math is identical.
    """
    c = wqkv.shape[0]
    n = window_size * window_size
    d = c // heads
    dp = ((d + 31) // 32) * 32
    use_pairs = 2 * n <= 128  # _select_pair_chunk always fits a chunk when this holds
    wqkv_pad, bqkv_pad, wproj_pad = _pad_head_weights(
        wqkv.astype(dtype), bqkv, wproj.astype(dtype), heads, d, dp
    )
    bias2 = _pair_embed_bias(bias, n) if use_pairs else bias
    return {
        "wqkv": wqkv_pad,
        "bqkv": bqkv_pad.reshape(1, -1),
        "wproj": wproj_pad,
        "bias2": bias2,
    }


def prepare_mask(mask_np, x_shape, heads: int, window_size: int, dtype):
    """Choose the mask operand layout matching the kernels' chunk selection
    for this shape. Returns ``(mask_jnp, mask_mode)`` to pass to
    :func:`fused_swin_block` / :func:`fused_window_attention_block`.

    ``mask_np`` must be the CONCRETE numpy mask (a trace-time constant —
    ops/windows.py:calculate_mask); the compression equality checks run in
    numpy, so a compressed layout is bit-identical by construction. The mask
    is cast to the map dtype (0/-100 are exact in bf16; the kernels upcast
    to f32 before adding to scores). Dense masks at HAT scale are a major
    hidden stream: 75.7 MB f32 per shifted block (scripts/exp_hlo_audit.py).
    """
    if mask_np is None:
        return None, "dense"
    mask_np = np.asarray(mask_np)
    b, hgt, w, c = x_shape
    ws = window_size
    n = ws * ws
    if hgt % ws == 0 and w % ws == 0:
        nw_row = w // ws
        chunk, _ = _select_chunk(nw_row, heads, n)
        if chunk:
            from studiosr_tpu.ops.windows import compress_mask

            mode, comp = compress_mask(mask_np, hgt // ws, nw_row, chunk)
            if mode is not None:
                return jnp.asarray(comp, dtype), mode
    return jnp.asarray(mask_np, dtype), "dense"


def _mask_index_map(mask_mode: str, chunk: int, n_rows: int, n_chunks: int):
    """Mask BlockSpec index map for a (bi, i, j) grid. Compressed modes map
    repeated content to a fixed block index so Mosaic's pipeline skips the
    re-fetch whenever consecutive grid steps address the same block."""
    if mask_mode == "rows2":
        # (2*chunk, N, N): interior-row block 0, last-row block 1.
        assert chunk > 0 and n_chunks == 1 and n_rows >= 2, (chunk, n_chunks, n_rows)
        return lambda bi, i, j: (i // (n_rows - 1), 0, 0)
    if mask_mode == "cls4":
        # (4*chunk, N, N): [interior, right, bottom, corner] row-parts.
        assert chunk > 0 and n_rows >= 2 and n_chunks >= 2, (chunk, n_rows, n_chunks)
        return lambda bi, i, j: (2 * (i // (n_rows - 1)) + j // (n_chunks - 1), 0, 0)
    assert mask_mode == "dense", mask_mode
    return lambda bi, i, j: (i * n_chunks + j, 0, 0)


def shift_fold_supported(x_shape, heads: int, window_size: int) -> bool:
    """True when fused_swin_block can fold the cyclic ±ws/2 shift into its
    reads (``read_shift``): needs even ws, window-multiple H/W, and a whole
    row-stripe per program (the in-register W-roll must span the full row)."""
    b, hgt, w, c = x_shape
    ws = window_size
    if ws % 2 or hgt % ws or w % ws:
        return False
    chunk, _ = _select_chunk(w // ws, heads, ws * ws)
    return chunk == w // ws and chunk > 0


def _attn_block_kernel_pairs(
    x_ref,  # (1, spp*ws, cw, C)
    ln_scale_ref,  # (1, C)
    ln_bias_ref,  # (1, C)
    wqkv_ref,  # (C, 3*heads*dp) head-padded, q pre-scaled
    bqkv_ref,  # (1, 3*heads*dp)
    wproj_ref,  # (heads*dp, C)
    bproj_ref,  # (1, C)
    bias2_ref,  # (heads, 2N, 2N) pair-embedded bias (off-diagonal -1e30)
    mask_ref,  # (spp*nw, N, N) or None
    dp_ref,  # (1, 1, 1) per-sample DropPath scale (already /keep) or None
    out_ref,  # (1, spp*ws, cw, C)
    *,
    heads: int,
    window_size: int,
    dp: int,
    spp: int = 1,
):
    """Window-pair variant: adjacent windows share one 2N-row score block and
    heads ride the dot batch dim, so the whole chunk's attention is TWO
    MXU-shaped batched dots — (heads*pairs, 2N, dp) x (heads*pairs, 2N, dp)^T
    and probs x V — instead of ``heads`` shallow (nw, N, dp) dots. Cross-window
    score entries are killed by the -1e30 off-diagonal folded into ``bias2``
    (exp underflows to exactly 0). 2N = 128 for ws=8: one full MXU tile per
    batch element. Measured vs the per-head kernel in STATUS.md."""
    ws = window_size
    nw = x_ref.shape[2] // ws
    for r in range(spp):
        mask = None if mask_ref is None else mask_ref[r * nw : (r + 1) * nw]
        y = _pairs_attn_stripe(
            x_ref[0, r * ws : (r + 1) * ws], ln_scale_ref[0], ln_bias_ref[0], wqkv_ref[...],
            bqkv_ref[0], wproj_ref[...], bproj_ref[0], bias2_ref[...], mask,
            heads=heads, window_size=window_size, dp=dp,
        )
        if dp_ref is not None:
            # stochastic-depth scaling of the residual delta in-kernel (the
            # XLA formulation costs ~3 full-map passes per block in training).
            x32 = x_ref[0, r * ws : (r + 1) * ws].astype(jnp.float32)
            y = x32 + dp_ref[0, 0, 0] * (y - x32)
        out_ref[0, r * ws : (r + 1) * ws] = y.astype(out_ref.dtype)


def _pairs_attn_stripe(x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj, bias2, mask, *, heads, window_size, dp):
    """Core of the pair kernel on stripe VALUES: (ws, cw, C) -> f32 (ws, cw, C)."""
    ws = window_size
    _, w, c = x.shape
    nw = w // ws
    n = ws * ws
    n2 = 2 * n
    # Odd window counts (e.g. the 33 windows/row of a flip-padded 256 input,
    # ops/windows.py pad_to_multiple_flip) get one zero dummy window so
    # pairing stays uniform; its rows are sliced off before the write.
    nw_pad = nw + (nw % 2)
    pairs = nw_pad // 2
    hp = heads * pairs
    s = heads * dp

    ln = _ln(x.astype(jnp.float32), ln_scale.astype(jnp.float32), ln_bias.astype(jnp.float32))

    ln_windows = ln.astype(x.dtype).reshape(ws, nw, ws, c).transpose(1, 0, 2, 3).reshape(nw * n, c)
    qkv = (
        jnp.dot(ln_windows, wqkv, preferred_element_type=jnp.float32) + bqkv.astype(jnp.float32)
    ).astype(x.dtype)  # (nw*N, 3*s)
    if nw_pad != nw:
        qkv = jnp.pad(qkv, ((0, n), (0, 0)))

    def stack_heads(offset):
        # (nw_pad*N, s) lane-sliced per head -> (heads*pairs, 2N, dp), batch-major head.
        return jnp.concatenate(
            [qkv[:, offset + h * dp : offset + (h + 1) * dp].reshape(pairs, n2, dp) for h in range(heads)],
            axis=0,
        )

    q = stack_heads(0)
    k = stack_heads(s)
    v = stack_heads(2 * s)

    scores = jax.lax.dot_general(
        q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # (heads*pairs, 2N, 2N)
    scores = scores.reshape(heads, pairs, n2, n2) + bias2.astype(jnp.float32)[:, None]
    if mask is not None:
        # Diag-embed (nw, N, N) -> (pairs, 2N, 2N): rows of even windows keep
        # their mask in the left lane half, odd windows in the right half.
        mask_flat = mask.astype(jnp.float32).reshape(nw * n, n)
        if nw_pad != nw:
            mask_flat = jnp.pad(mask_flat, ((0, n), (0, 0)))
        zeros = jnp.zeros_like(mask_flat)
        left = jnp.concatenate([mask_flat, zeros], axis=1)  # (nw_pad*N, 2N)
        right = jnp.concatenate([zeros, mask_flat], axis=1)
        row_par = (jax.lax.broadcasted_iota(jnp.int32, (nw_pad * n, 1), 0) // n) % 2
        mask2 = jnp.where(row_par == 0, left, right).reshape(pairs, n2, n2)
        scores = scores + mask2[None]
    scores = scores.reshape(hp, n2, n2)
    # No max-subtraction: softmax is shift-invariant, so skipping it changes
    # nothing numerically while saving a 2N-lane max reduction + broadcast
    # subtract per row; the clamp only engages where exp would overflow f32
    # (|logits| of trained SR models are orders of magnitude below 80).
    probs = jnp.exp(jnp.minimum(scores, 80.0))
    denom = jnp.sum(probs, axis=-1, keepdims=True)
    av = jax.lax.dot_general(
        probs.astype(x.dtype), v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (heads*pairs, 2N, dp)
    av = (av * (1.0 / denom)).astype(x.dtype)  # reciprocal on (hp,2N,1), multiply on (hp,2N,dp)

    attn = jnp.concatenate(
        [av[h * pairs : (h + 1) * pairs].reshape(nw_pad * n, dp)[: nw * n] for h in range(heads)], axis=1
    )  # (nw*N, heads*dp) — dummy-window rows dropped
    attn = attn.reshape(nw, ws, ws, s).transpose(1, 0, 2, 3).reshape(ws * w, s)
    proj = (
        jnp.dot(attn, wproj, preferred_element_type=jnp.float32)
        + bproj.astype(jnp.float32)
    )
    return x.astype(jnp.float32) + proj.reshape(ws, w, c)


def _mlp_rows(x, ln_scale, ln_bias, w1, b1, w2, b2):
    """MLP half on row VALUES: (rows, C) -> f32 (rows, C)."""
    x32 = x.astype(jnp.float32)
    ln = _ln(x32, ln_scale.astype(jnp.float32), ln_bias.astype(jnp.float32))
    h = jnp.dot(ln.astype(x.dtype), w1, preferred_element_type=jnp.float32) + b1.astype(jnp.float32)
    h = 0.5 * h * (1.0 + _erf(h * np.float32(1.0 / np.sqrt(2.0))))
    y = jnp.dot(h.astype(x.dtype), w2, preferred_element_type=jnp.float32) + b2.astype(jnp.float32)
    return x32 + y


def _swin_block_kernel_pairs(
    x_ref,  # (1, ws, cw, C)
    s1_ref, b1_ref,  # norm1 (1, C)
    wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,  # attention weights (head-padded)
    bias2_ref,  # (heads, 2N, 2N)
    s2_ref, b2_ref,  # norm2 (1, C)
    w1_ref, fb1_ref, w2_ref, fb2_ref,  # MLP weights
    mask_ref,  # (nw, N, N) or None
    extra_ref,  # (1, ws, cw, C) additive injection between the halves, or None
    escale_ref,  # (1, 1, C) per-sample channel scale applied to extra, or None
    dp1_ref,  # (1, 1) per-sample DropPath scale for the attention half, or None
    dp2_ref,  # (1, 1) ... for the MLP half, or None
    out_ref,  # (1, ws, cw, C)
    *,
    heads: int,
    window_size: int,
    dp: int,
    pairs: bool = True,
):
    """Whole Swin block (attention half + MLP half) in ONE pass over the
    stripe: the serving path is HBM-bandwidth-bound (~83 GB/s effective,
    STATUS.md round-2 findings), so halving the per-block map traffic
    (2 kernel read+writes -> 1) is worth more than any compute win. The
    attention core is the window-pair one for ws=8 shapes (bias2 is the
    pair-embedded bias) and the per-head v5 one otherwise (bias2 is the
    plain (heads, N, N) bias)."""
    y2 = _swin_block_body(
        x_ref[0],
        s1_ref[0], b1_ref[0], wqkv_ref[...], bqkv_ref[0], wproj_ref[...], bproj_ref[0],
        bias2_ref[...],
        None if mask_ref is None else mask_ref[...],
        s2_ref[0], b2_ref[0], w1_ref[...], fb1_ref[0], w2_ref[...], fb2_ref[0],
        None if extra_ref is None else extra_ref[0],
        None if escale_ref is None else escale_ref[0, 0],
        None if dp1_ref is None else dp1_ref[0, 0, 0],
        None if dp2_ref is None else dp2_ref[0, 0, 0],
        heads=heads, window_size=window_size, dp=dp, pairs=pairs,
    )
    out_ref[0] = y2.astype(out_ref.dtype)


def _swin_block_body(
    x, s1, b1, wqkv, bqkv, wproj, bproj, bias2, mask, s2, b2, w1, fb1, w2, fb2,
    extra, escale, dp1, dp2, *, heads, window_size, dp, pairs,
):
    """Whole-block computation on stripe VALUES: (ws, w, C) -> f32 (ws, w, C)."""
    ws = window_size
    _, w, c = x.shape
    core = _pairs_attn_stripe if pairs else _v5_attn_stripe
    y1 = core(
        x, s1, b1, wqkv, bqkv, wproj, bproj, bias2, mask,
        heads=heads, window_size=window_size, dp=dp,
    )
    if dp1 is not None:
        # stochastic-depth scaling of the residual DELTA (y1 = x + d1*attn):
        # exact because the core returns x + attn.
        x32 = x.astype(jnp.float32)
        y1 = x32 + dp1 * (y1 - x32)
    if extra is not None:
        # HAT's CAB branch joins between the attention and MLP halves
        # (models/hat.py: x = attn_res + conv_scale * CAB; then MLP). The
        # squeeze-excite gate (x conv_scale) rides along as a per-sample
        # channel scale so no separate elementwise pass touches the map.
        e32 = extra.astype(jnp.float32)
        if escale is not None:
            e32 = e32 * escale.astype(jnp.float32)
        y1 = y1 + e32
    y1 = y1.astype(x.dtype)
    y2 = _mlp_rows(y1.reshape(ws * w, c), s2, b2, w1, fb1, w2, fb2)
    if dp2 is not None:
        y132 = y1.reshape(ws * w, c).astype(jnp.float32)
        y2 = y132 + dp2 * (y2 - y132)
    return y2.reshape(ws, w, c)


def _swin_block_kernel_shifted(
    xa_ref,  # (1, ws//2, W, C) — upper half-stripe at the read offset
    xb_ref,  # (1, ws//2, W, C) — lower half-stripe (index maps wrap mod H)
    s1_ref, b1_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref, bias2_ref,
    s2_ref, b2_ref, w1_ref, fb1_ref, w2_ref, fb2_ref,
    mask_ref,  # (nw, N, N) or None
    out_ref,  # (1, ws, W, C)
    *,
    heads: int,
    window_size: int,
    dp: int,
    pairs: bool,
    rot: int,  # in-register W-rotate amount (W - s for +s reads, s for -s)
):
    """Whole Swin block with the cyclic ±ws/2 shift folded into the READ:
    the stripe at row offset is assembled from two half-height blocks
    (leading-dim blocks carry no alignment constraint; the index maps wrap
    with mod), and the column shift is an in-register sublane rotate. The
    XLA ``jnp.roll`` passes around shifted blocks disappear entirely; the
    output stays aligned in the shifted space and the *next* block reads it
    back at the opposite offset (serving/swinir_fast.py tracks the space)."""
    from jax.experimental.pallas import tpu as pltpu

    x = jnp.concatenate([xa_ref[0], xb_ref[0]], axis=0)
    # Mosaic's dynamic_rotate is 32-bit only; rotate in f32 (bf16->f32->bf16
    # is lossless, and the kernel computes LN in f32 anyway).
    x = pltpu.roll(x.astype(jnp.float32), rot, 1).astype(x.dtype)
    y2 = _swin_block_body(
        x,
        s1_ref[0], b1_ref[0], wqkv_ref[...], bqkv_ref[0], wproj_ref[...], bproj_ref[0],
        bias2_ref[...],
        None if mask_ref is None else mask_ref[...],
        s2_ref[0], b2_ref[0], w1_ref[...], fb1_ref[0], w2_ref[...], fb2_ref[0],
        None, None, None, None,
        heads=heads, window_size=window_size, dp=dp, pairs=pairs,
    )
    out_ref[0] = y2.astype(out_ref.dtype)


def _pair_embed_bias(bias: jnp.ndarray, n: int) -> jnp.ndarray:
    """(heads, N, N) -> (heads, 2N, 2N) with bias on both diagonal blocks and
    -1e30 off-diagonal (kills cross-window attention through the softmax)."""
    heads = bias.shape[0]
    neg = jnp.full((heads, n, n), -1e30, jnp.float32)
    b32 = bias.astype(jnp.float32)
    top = jnp.concatenate([b32, neg], axis=2)
    bot = jnp.concatenate([neg, b32], axis=2)
    return jnp.concatenate([top, bot], axis=1)


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
    mask = None if mask_ref is None else mask_ref[...]
    y = _v5_attn_stripe(
        x_ref[0], ln_scale_ref[0], ln_bias_ref[0], wqkv_ref[...], bqkv_ref[0], wproj_ref[...],
        bproj_ref[0], bias_ref[...], mask, heads=heads, window_size=window_size, dp=dp,
    )
    out_ref[0] = y.astype(out_ref.dtype)


def _v5_attn_stripe(x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj, bias, mask, *, heads, window_size, dp):
    """Per-head attention core on stripe VALUES: (ws, cw, C) -> f32 (ws, cw, C)."""
    ws = window_size
    _, w, c = x.shape
    nw = w // ws
    n = ws * ws
    s = heads * dp

    ln = _ln(x.astype(jnp.float32), ln_scale.astype(jnp.float32), ln_bias.astype(jnp.float32))

    # Stripe -> windows BEFORE the qkv projection: the relayouted tensor is C
    # wide instead of 3C (the matmul output needs no transpose).
    ln_windows = ln.astype(x.dtype).reshape(ws, nw, ws, c).transpose(1, 0, 2, 3).reshape(nw * n, c)
    qkv = (
        jnp.dot(ln_windows, wqkv, preferred_element_type=jnp.float32) + bqkv.astype(jnp.float32)
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
        scores = scores + bias[h][None].astype(jnp.float32)
        if mask is not None:
            scores = scores + mask.astype(jnp.float32)
        # softmax is shift-invariant: skip the max reduction, clamp only
        # where exp would overflow f32 (far above any trained SR logit).
        probs = jnp.exp(jnp.minimum(scores, 80.0))
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
        jnp.dot(attn, wproj, preferred_element_type=jnp.float32)
        + bproj.astype(jnp.float32)
    )
    return x.astype(jnp.float32) + proj.reshape(ws, w, c)


@functools.partial(jax.jit, static_argnames=("heads", "window_size", "mask_mode", "spp", "prepped", "interpret"))
def fused_window_attention_block(
    x: jnp.ndarray,  # (1, H, W, C), already cyclically shifted if needed
    ln_scale: jnp.ndarray,
    ln_bias: jnp.ndarray,
    wqkv: jnp.ndarray,
    bqkv: jnp.ndarray,
    wproj: jnp.ndarray,
    bproj: jnp.ndarray,
    bias: jnp.ndarray,  # (heads, N, N)
    mask: Optional[jnp.ndarray],  # (nW, N, N) or compressed (see prepare_mask)
    heads: int,
    window_size: int,
    drop_path=None,  # optional (B,) per-sample keep-scales (already /keep)
    mask_mode: str = "dense",
    spp: int = 1,  # stripes (window-rows) per program — perf experiments only
    prepped: bool = False,  # attn weights/bias already in kernel layout
    interpret: bool = False,
) -> jnp.ndarray:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, hgt, w, c = x.shape
    ws = window_size
    n = ws * ws
    nw_row = w // ws

    if hgt % ws or w % ws:
        # The grid only tiles window multiples; without this guard the
        # trailing rows/cols of the (full-shape) output are never written.
        from studiosr_tpu.ops.pallas import engagement

        return engagement.fallback("fused_window_attention_block", f"{hgt}x{w} not a multiple of ws={ws}")

    # Window-pair kernel when the pair layout fits, per-head kernel
    # otherwise — the shared selection in _select_chunk.
    chunk, use_pairs = _select_chunk(nw_row, heads, n)
    cw = chunk * ws  # chunk width in pixels

    if drop_path is not None and not use_pairs:
        raise NotImplementedError("drop_path folding requires the pair kernel")

    from studiosr_tpu.ops.pallas import engagement

    engagement.engaged("fused_window_attention_block")

    d = c // heads
    dp = ((d + 31) // 32) * 32
    s = heads * dp
    if prepped:
        wqkv_pad, bqkv_pad, wproj_pad = wqkv, bqkv, wproj
        assert wqkv_pad.shape == (c, 3 * s), wqkv_pad.shape
        assert bias.shape[1] == (2 * n if use_pairs else n), (bias.shape, use_pairs)
    else:
        wqkv_pad, bqkv_pad, wproj_pad = _pad_head_weights(wqkv, bqkv, wproj, heads, d, dp)

    # Stripes-per-program: folding several stripe rows into one program was
    # measured MUCH slower at TRAINING shapes (1.86 vs 0.84 s/step at spp=8
    # — Mosaic pipelines DMA against compute ACROSS grid steps); the serving
    # regime is re-measurable via the spp argument (scripts/exp_spp.py).
    # mask+spp>1 additionally needs one chunk per window row: a program's
    # spp*chunk mask block can only cover its windows contiguously when
    # chunk == nw_row (the dense index map is in spp*chunk block units).
    if spp != 1 and (
        (hgt // ws) % spp
        or not use_pairs
        or drop_path is not None
        # The spp>1 mask path supports only dense masks at one chunk per
        # window row (compressed modes' index maps are in per-row block
        # units); demote rather than trip the dense-only assert below.
        or (mask is not None and (chunk != nw_row or mask_mode != "dense"))
    ):
        spp = 1

    base_kernel = _attn_block_kernel_pairs if use_pairs else _attn_block_kernel
    if use_pairs and not prepped:
        bias = _pair_embed_bias(bias, n)
    extra_kw = {"spp": spp} if use_pairs else {}

    def kernel(*refs):
        # refs: x + 7 weight/bias refs, then [mask], [drop_path], out
        base = list(refs[:8])
        rest = list(refs[8:-1])
        mask_ref = rest.pop(0) if mask is not None else None
        args = base + [mask_ref]
        if use_pairs:
            args.append(rest.pop(0) if drop_path is not None else None)
        base_kernel(*args, refs[-1], heads=heads, window_size=ws, dp=dp, **extra_kw)

    grid = (b, hgt // (spp * ws), nw_row // chunk)
    full = lambda *shape: pl.BlockSpec(shape, lambda bi, i, j: (0,) * len(shape), memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((1, spp * ws, cw, c), lambda bi, i, j: (bi, i, j, 0), memory_space=pltpu.VMEM),
        full(1, c),
        full(1, c),
        full(c, 3 * s),
        full(1, 3 * s),
        full(s, c),
        full(1, c),
        full(*bias.shape),  # (heads, N, N) or pair-embedded (heads, 2N, 2N)
    ]
    operands = [x, ln_scale.reshape(1, c), ln_bias.reshape(1, c), wqkv_pad, bqkv_pad.reshape(1, -1),
                wproj_pad, bproj.reshape(1, c), bias]
    n_chunks = nw_row // chunk
    if mask is not None:
        # Shift mask is shared across the batch (same static image size).
        # With spp > 1 the row is one chunk, so a program's masks are the
        # contiguous spp*chunk windows starting at stripe i*spp.
        assert spp == 1 or mask_mode == "dense"
        if mask_mode != "dense":
            engagement.engaged(f"mask_{mask_mode}")
        in_specs.append(
            pl.BlockSpec(
                (spp * chunk, n, n),
                _mask_index_map(mask_mode, chunk, hgt // (spp * ws), n_chunks),
                memory_space=pltpu.VMEM,
            )
        )
        operands.append(mask)
    if drop_path is not None:
        in_specs.append(
            pl.BlockSpec((1, 1, 1), lambda bi, i, j: (bi, 0, 0), memory_space=pltpu.SMEM)
        )
        operands.append(drop_path.reshape(-1, 1, 1).astype(jnp.float32))

    compiler_params = None
    if not interpret:
        compiler_params = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
            vmem_limit_bytes=64 * 1024 * 1024,
        )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, spp * ws, cw, c), lambda bi, i, j: (bi, i, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=compiler_params,
        interpret=interpret,
    )(*operands)


@functools.partial(jax.jit, static_argnames=("heads", "window_size", "read_shift", "mask_mode", "prepped", "interpret"))
def fused_swin_block(
    x: jnp.ndarray,  # (B, H, W, C), already cyclically shifted if needed
    ln1_scale, ln1_bias,
    wqkv, bqkv, wproj, bproj,
    bias,  # (heads, N, N)
    mask,  # (nW, N, N) or None
    ln2_scale, ln2_bias,
    w1, b1, w2, b2,
    heads: int,
    window_size: int,
    extra=None,  # optional (B, H, W, C) added between the halves (HAT CAB)
    extra_scale=None,  # optional (B, C) per-sample channel scale for extra
    drop_path=None,  # optional (B, 2) per-sample keep-scales (already /keep)
    read_shift: int = 0,  # ±ws//2: fold the cyclic shift into the reads
    mask_mode: str = "dense",  # mask operand layout (see prepare_mask)
    prepped: bool = False,  # attn weights/bias already in kernel layout
    interpret: bool = False,
) -> Optional[jnp.ndarray]:
    """Whole Swin block — y = z + mlp(LN2(z)), z = x + attn(LN1(x)) — in one
    HBM pass (the map is read and written once instead of twice). Returns
    ``None`` when the window-pair layout does not apply (odd windows-per-row
    or ws > 8); callers fall back to the two-kernel path.

    ``read_shift=±ws//2`` READS the map at offset +read_shift, i.e. computes
    the block as if the input had first been ``jnp.roll``-ed by
    (-read_shift, -read_shift) on (H, W) — so the Swin shift
    ``jnp.roll(x, (-sh, -sh))`` is folded by passing ``read_shift=+sh``
    (the convention the parity test pins,
    tests/ops/test_fused_swin.py::test_fused_swin_block_read_shift_equals_rolled).
    Rows come from
    half-stripe blocks at the offset and columns from an in-register rotate,
    so the XLA roll passes around shifted blocks vanish. The output is
    aligned in the *rolled* space; callers track which space the map is in
    (serving/swinir_fast.py) and gate on :func:`shift_fold_supported`."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, hgt, w, c = x.shape
    ws = window_size
    n = ws * ws
    nw_row = w // ws

    chunk, use_pairs = _select_chunk(nw_row, heads, n)
    if chunk == 0 or hgt % ws or w % ws:
        from studiosr_tpu.ops.pallas import engagement

        return engagement.fallback(
            "fused_swin_block",
            f"layout mismatch: shape {x.shape}, ws={ws} (chunk={chunk})",
        )
    if read_shift:
        # Caller contract: gate on shift_fold_supported() first.
        if (
            abs(read_shift) != ws // 2 or ws % 2 or chunk != nw_row
            or extra is not None or drop_path is not None
        ):
            raise ValueError(
                f"read_shift={read_shift} unsupported here (ws={ws}, "
                f"chunk={chunk}/{nw_row}); gate on shift_fold_supported()"
            )
    from studiosr_tpu.ops.pallas import engagement

    engagement.engaged("fused_swin_block")
    if read_shift:
        engagement.engaged("swin_shift_fold")
    cw = chunk * ws
    grid = (b, hgt // ws, nw_row // chunk)

    d = c // heads
    dp = ((d + 31) // 32) * 32
    s = heads * dp
    hidden = w1.shape[1]
    if prepped:
        # Weights already in kernel layout (prepare_attention_weights).
        wqkv_pad, bqkv_pad, wproj_pad, bias2 = wqkv, bqkv, wproj, bias
        assert wqkv_pad.shape == (c, 3 * s) and bias2.shape[0] == heads, (wqkv_pad.shape, bias2.shape)
        assert bias2.shape[1] == (2 * n if use_pairs else n), (bias2.shape, use_pairs)
    else:
        wqkv_pad, bqkv_pad, wproj_pad = _pad_head_weights(wqkv, bqkv, wproj, heads, d, dp)
        bias2 = _pair_embed_bias(bias, n) if use_pairs else bias

    full = lambda *shape: pl.BlockSpec(shape, lambda bi, i, j: (0,) * len(shape), memory_space=pltpu.VMEM)
    weight_specs = [
        full(1, c), full(1, c),
        full(c, 3 * s), full(1, 3 * s), full(s, c), full(1, c),
        full(*bias2.shape),
        full(1, c), full(1, c),
        full(c, hidden), full(1, hidden), full(hidden, c), full(1, c),
    ]
    weight_operands = [
        ln1_scale.reshape(1, c), ln1_bias.reshape(1, c),
        wqkv_pad, bqkv_pad.reshape(1, -1), wproj_pad, bproj.reshape(1, c),
        bias2,
        ln2_scale.reshape(1, c), ln2_bias.reshape(1, c),
        w1, b1.reshape(1, hidden), w2, b2.reshape(1, c),
    ]
    if read_shift:
        half = ws // 2
        hb = 2 * (hgt // ws)  # number of half-height row blocks
        if read_shift > 0:
            ia = lambda bi, i, j: (bi, 2 * i + 1, 0, 0)
            ib = lambda bi, i, j: (bi, (2 * i + 2) % hb, 0, 0)
            rot = w - half
        else:
            ia = lambda bi, i, j: (bi, (2 * i - 1) % hb, 0, 0)
            ib = lambda bi, i, j: (bi, 2 * i, 0, 0)
            rot = half

        def kernel(*refs):
            # refs: xa, xb, 13 weight/bias refs, [mask], out
            mask_ref = refs[15] if mask is not None else None
            _swin_block_kernel_shifted(
                *refs[:15], mask_ref, refs[-1],
                heads=heads, window_size=ws, dp=dp, pairs=use_pairs, rot=rot,
            )

        in_specs = [
            pl.BlockSpec((1, half, cw, c), ia, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, half, cw, c), ib, memory_space=pltpu.VMEM),
        ] + weight_specs
        operands = [x, x] + weight_operands
    else:

        def kernel(*refs):
            # refs: x, 13 weight/bias refs, [mask], [extra], [extra_scale],
            # [drop_path x2], out
            base = list(refs[:14])
            rest = list(refs[14:-1])
            mask_ref = rest.pop(0) if mask is not None else None
            extra_ref = rest.pop(0) if extra is not None else None
            escale_ref = rest.pop(0) if extra_scale is not None else None
            dp1_ref = rest.pop(0) if drop_path is not None else None
            dp2_ref = rest.pop(0) if drop_path is not None else None
            _swin_block_kernel_pairs(
                *base, mask_ref, extra_ref, escale_ref, dp1_ref, dp2_ref, refs[-1],
                heads=heads, window_size=ws, dp=dp, pairs=use_pairs,
            )

        in_specs = [
            pl.BlockSpec((1, ws, cw, c), lambda bi, i, j: (bi, i, j, 0), memory_space=pltpu.VMEM),
        ] + weight_specs
        operands = [x] + weight_operands
    n_chunks = nw_row // chunk
    if mask is not None:
        if mask_mode != "dense":
            engagement.engaged(f"mask_{mask_mode}")
        in_specs.append(
            pl.BlockSpec(
                (chunk, n, n),
                _mask_index_map(mask_mode, chunk, hgt // ws, n_chunks),
                memory_space=pltpu.VMEM,
            )
        )
        operands.append(mask)
    if extra is not None:
        in_specs.append(
            pl.BlockSpec((1, ws, cw, c), lambda bi, i, j: (bi, i, j, 0), memory_space=pltpu.VMEM)
        )
        operands.append(extra)
    if extra_scale is not None:
        in_specs.append(
            pl.BlockSpec((1, 1, c), lambda bi, i, j: (bi, 0, 0), memory_space=pltpu.VMEM)
        )
        operands.append(extra_scale.reshape(-1, 1, c))
    if drop_path is not None:
        # (B, 1, 1) so the last-two block dims equal the array dims (the
        # Pallas block rule applies to SMEM operands too).
        dp2d = drop_path.reshape(-1, 2).astype(jnp.float32)
        for col in (0, 1):
            in_specs.append(
                pl.BlockSpec((1, 1, 1), lambda bi, i, j: (bi, 0, 0), memory_space=pltpu.SMEM)
            )
            operands.append(dp2d[:, col : col + 1].reshape(-1, 1, 1))

    compiler_params = None
    if not interpret:
        compiler_params = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
            vmem_limit_bytes=64 * 1024 * 1024,
        )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, ws, cw, c), lambda bi, i, j: (bi, i, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=compiler_params,
        interpret=interpret,
    )(*operands)


def _mlp_kernel(x_ref, ln_scale_ref, ln_bias_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref, *,
                dp_ref=None, extra_ref=None, escale_ref=None):
    x = x_ref[...]
    x32 = x.astype(jnp.float32)
    if extra_ref is not None:
        # HAT's CAB join (models/hat.py: x = attn_out + conv_scale * g * y2)
        # folded into the MLP pass: one +M read replaces a 3M XLA join pass.
        e32 = extra_ref[...].astype(jnp.float32)
        if escale_ref is not None:
            e32 = e32 * escale_ref[0].astype(jnp.float32)
        x32 = x32 + e32
        x = x32.astype(x.dtype)
    ln = _ln(x32, ln_scale_ref[0].astype(jnp.float32), ln_bias_ref[0].astype(jnp.float32))
    h = jnp.dot(ln.astype(x.dtype), w1_ref[...], preferred_element_type=jnp.float32) + b1_ref[0].astype(jnp.float32)
    h = 0.5 * h * (1.0 + _erf(h * np.float32(1.0 / np.sqrt(2.0))))
    y = jnp.dot(h.astype(x.dtype), w2_ref[...], preferred_element_type=jnp.float32) + b2_ref[0].astype(jnp.float32)
    if dp_ref is not None:
        y = dp_ref[0, 0, 0] * y  # stochastic-depth scale on the delta
    out_ref[...] = (x32 + y).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_rows", "rows_per_sample", "interpret"))
def fused_mlp_block(
    x: jnp.ndarray,  # (rows, C)
    ln_scale, ln_bias, w1, b1, w2, b2,
    block_rows: int = 1024,
    drop_path=None,  # optional (B,) per-sample keep-scales; needs rows_per_sample
    rows_per_sample: int = 0,
    extra=None,  # optional (rows, C) residual joined before LN (HAT CAB)
    extra_scale=None,  # optional (C,) per-channel scale on ``extra``
    interpret: bool = False,
) -> jnp.ndarray:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from studiosr_tpu.ops.pallas import engagement

    engagement.engaged("fused_mlp_block")
    rows, c = x.shape
    hidden = w1.shape[1]
    if drop_path is not None:
        # each grid block must stay within one sample
        assert rows_per_sample > 0 and rows % rows_per_sample == 0
        while rows_per_sample % block_rows:
            block_rows //= 2
    pad = (-rows) % block_rows
    xp = jnp.pad(x, ((0, pad), (0, 0))) if pad else x

    full = lambda *shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
    compiler_params = None
    if not interpret:
        compiler_params = pltpu.CompilerParams(dimension_semantics=("parallel",))
    in_specs = [
        pl.BlockSpec((block_rows, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        full(1, c), full(1, c), full(c, hidden), full(1, hidden), full(hidden, c), full(1, c),
    ]
    operands = [xp, ln_scale.reshape(1, c), ln_bias.reshape(1, c), w1, b1.reshape(1, hidden), w2, b2.reshape(1, c)]
    if drop_path is not None:
        bps = rows_per_sample // block_rows
        in_specs.append(pl.BlockSpec((1, 1, 1), lambda i: (i // bps, 0, 0), memory_space=pltpu.SMEM))
        operands.append(drop_path.reshape(-1, 1, 1).astype(jnp.float32))
    # extra_scale scales `extra` — without an extra operand there is nothing
    # to scale, and the kernel flag/operand lists would disagree (popping a
    # ref that was never appended). Fail loudly instead.
    assert extra_scale is None or extra is not None, "fused_mlp_block: extra_scale requires extra"
    if extra is not None:
        ep = jnp.pad(extra, ((0, pad), (0, 0))) if pad else extra
        in_specs.append(pl.BlockSpec((block_rows, c), lambda i: (i, 0), memory_space=pltpu.VMEM))
        operands.append(ep)
        if extra_scale is not None:
            in_specs.append(full(1, c))
            operands.append(extra_scale.reshape(1, c))

    has_dp, has_extra, has_escale = (
        drop_path is not None, extra is not None, extra_scale is not None,
    )
    if has_dp or has_extra:
        def mlp_kernel(*refs):
            base, rest = list(refs[:7]), list(refs[7:-1])
            kw = {}
            if has_dp:
                kw["dp_ref"] = rest.pop(0)
            if has_extra:
                kw["extra_ref"] = rest.pop(0)
            if has_escale:
                kw["escale_ref"] = rest.pop(0)
            _mlp_kernel(*base, refs[-1], **kw)
    else:
        mlp_kernel = _mlp_kernel
    out = pl.pallas_call(
        mlp_kernel,
        grid=((rows + pad) // block_rows,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block_rows, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(xp.shape, x.dtype),
        compiler_params=compiler_params,
        interpret=interpret,
    )(*operands)
    return out[:rows] if pad else out
