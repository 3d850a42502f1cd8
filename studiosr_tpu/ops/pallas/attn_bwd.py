"""Pallas backward kernel for the window-pair attention block.

The XLA backward (ops/attn_vjp._window_bwd_math) materializes the
(nW, heads, N, N) f32 probability/score cotangents in HBM — at the driver
training shape that is ~hundreds of MB per block, the same pathology the
forward kernels removed. This kernel recomputes the forward flash-style and
runs the whole backward chain in VMEM over the same stripe grid as the
forward pair kernel:

* grid (B, stripes, chunks); each program emits its dx stripe plus
  per-BATCH-sample partial weight/bias gradients accumulated across the
  stripe/chunk grid steps via output-block revisiting ("arbitrary"
  semantics on those dims) — summed over the batch in XLA;
* gradients are produced w.r.t. the head-padded, q-pre-scaled weight layout
  (ops/pallas/swin_block._pad_head_weights); the wrapper maps them back to
  the unpadded (C, 3C) torch layout;
* the pair-embedded bias cotangent is emitted as (heads, 2N, 2N) and folded
  to (heads, N, N) outside (the -1e30 off-diagonal entries receive exactly
  zero gradient because their probabilities are exactly zero).

Validated against jax.grad of the XLA math in tests/ops/test_attn_bwd.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from studiosr_tpu.ops.pallas.swin_block import (
    _layernorm,
    _pad_head_weights,
    _pair_embed_bias,
    _select_pair_chunk,
)

__all__ = ["pairs_attention_bwd", "v5_attention_bwd"]


def _bwd_kernel(
    x_ref, g_ref,
    s1_ref, b1_ref,
    wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
    bias2_ref,
    mask_ref,  # or None
    dp_ref,  # (1, 1, 1) or None
    dx_ref, dwqkv_ref, dbqkv_ref, dwproj_ref, dbproj_ref, ds_ref, db_ref, dbias2_ref,
    *,
    heads: int,
    window_size: int,
    dp: int,
):
    from jax.experimental import pallas as pl

    i = pl.program_id(1)
    j = pl.program_id(2)
    first = (i == 0) & (j == 0)

    ws = window_size
    _, _, w, c = x_ref.shape
    nw = w // ws
    n = ws * ws
    n2 = 2 * n
    nw_pad = nw + (nw % 2)
    pairs = nw_pad // 2
    hp = heads * pairs
    s = heads * dp
    dt = x_ref.dtype

    x = x_ref[0]
    g = g_ref[0]
    if dp_ref is not None:
        # out = x + d*(full - x): the branch cotangent is d*g; the (1-d)*g
        # residual part is added to dx at the end.
        g_branch = (dp_ref[0, 0, 0] * g.astype(jnp.float32)).astype(dt)
    else:
        g_branch = g

    # ---- forward recompute (mirrors _pairs_attn_stripe) ----
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + 1e-5)
    xhat = (x32 - mu) * inv
    ln = xhat * s1_ref[0].astype(jnp.float32) + b1_ref[0].astype(jnp.float32)

    ln_windows = ln.astype(dt).reshape(ws, nw, ws, c).transpose(1, 0, 2, 3).reshape(nw * n, c)
    qkv = (
        jnp.dot(ln_windows, wqkv_ref[...], preferred_element_type=jnp.float32) + bqkv_ref[0].astype(jnp.float32)
    ).astype(dt)
    if nw_pad != nw:
        qkv = jnp.pad(qkv, ((0, n), (0, 0)))

    def stack(t, off):
        return jnp.concatenate(
            [t[:, off + h * dp : off + (h + 1) * dp].reshape(pairs, n2, dp) for h in range(heads)], axis=0
        )

    q = stack(qkv, 0)
    k = stack(qkv, s)
    v = stack(qkv, 2 * s)

    scores = jax.lax.dot_general(
        q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ).reshape(heads, pairs, n2, n2) + bias2_ref[...].astype(jnp.float32)[:, None]
    if mask_ref is not None:
        mask_flat = mask_ref[...].astype(jnp.float32).reshape(nw * n, n)
        if nw_pad != nw:
            mask_flat = jnp.pad(mask_flat, ((0, n), (0, 0)))
        zeros = jnp.zeros_like(mask_flat)
        left = jnp.concatenate([mask_flat, zeros], axis=1)
        right = jnp.concatenate([zeros, mask_flat], axis=1)
        row_par = (jax.lax.broadcasted_iota(jnp.int32, (nw_pad * n, 1), 0) // n) % 2
        mask2 = jnp.where(row_par == 0, left, right).reshape(pairs, n2, n2)
        scores = scores + mask2[None]
    scores = scores.reshape(hp, n2, n2)
    e = jnp.exp(jnp.minimum(scores, 80.0))
    p = e * (1.0 / jnp.sum(e, axis=-1, keepdims=True))  # normalized probs, f32

    # attn rows (for dwproj) in stripe layout
    av = jax.lax.dot_general(
        p.astype(dt), v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(dt)  # (hp, 2N, dp)
    attn_rows = jnp.concatenate(
        [av[h * pairs : (h + 1) * pairs].reshape(nw_pad * n, dp)[: nw * n] for h in range(heads)], axis=1
    )  # (nw*N, s) window-major rows
    attn_stripe = attn_rows.reshape(nw, ws, ws, s).transpose(1, 0, 2, 3).reshape(ws * w, s)

    # ---- backward chain ----
    g_rows = g_branch.reshape(ws * w, c)  # stripe-raster rows
    # proj backward (stripe layout).
    dwproj_p = jax.lax.dot_general(
        attn_stripe, g_rows, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (s, c)
    dbproj_p = jnp.sum(g_branch.astype(jnp.float32), axis=(0, 1)).reshape(1, c)
    dattn = jnp.dot(g_rows, wproj_ref[...].T, preferred_element_type=jnp.float32).astype(dt)  # (ws*w, s)
    # stripe -> windows for the attention backward.
    dattn_w = dattn.reshape(ws, nw, ws, s).transpose(1, 0, 2, 3).reshape(nw * n, s)
    if nw_pad != nw:
        dattn_w = jnp.pad(dattn_w, ((0, n), (0, 0)))
    dav = stack(dattn_w, 0)  # (hp, 2N, dp)

    p_ = p.astype(dt)
    dv = jax.lax.dot_general(
        p_, dav, dimension_numbers=(((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # (hp, 2N, dp): sum over query rows
    dp_mat = jax.lax.dot_general(
        dav, v, dimension_numbers=(((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # (hp, 2N, 2N)
    dscores = p * (dp_mat - jnp.sum(dp_mat * p, axis=-1, keepdims=True))  # f32
    dbias2_p = jnp.sum(dscores.reshape(heads, pairs, n2, n2), axis=1)  # (heads, 2N, 2N)
    dsc = dscores.astype(dt)
    dq = jax.lax.dot_general(
        dsc, k, dimension_numbers=(((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # (hp, 2N, dp)
    dk = jax.lax.dot_general(
        dsc, q, dimension_numbers=(((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # (hp, 2N, dp)

    def unstack(t):
        return jnp.concatenate(
            [t[h * pairs : (h + 1) * pairs].reshape(nw_pad * n, dp)[: nw * n] for h in range(heads)], axis=1
        )

    dqkv = jnp.concatenate(
        [unstack(dq.astype(dt)), unstack(dk.astype(dt)), unstack(dv.astype(dt))], axis=1
    )  # (nw*N, 3s) window-major
    dwqkv_p = jax.lax.dot_general(
        ln_windows, dqkv, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (c, 3s)
    dbqkv_p = jnp.sum(dqkv.astype(jnp.float32), axis=0).reshape(1, 3 * s)
    dln_w = jnp.dot(dqkv, wqkv_ref[...].T, preferred_element_type=jnp.float32)  # (nw*N, c)
    # windows -> stripe.
    dln = dln_w.astype(dt).reshape(nw, ws, ws, c).transpose(1, 0, 2, 3).reshape(ws, w, c).astype(jnp.float32)

    ds_p = jnp.sum(dln * xhat, axis=(0, 1)).reshape(1, c)
    db_p = jnp.sum(dln, axis=(0, 1)).reshape(1, c)
    dxhat = dln * s1_ref[0].astype(jnp.float32)
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx = g_branch.astype(jnp.float32) + (dxhat - m1 - xhat * m2) * inv
    if dp_ref is not None:
        dx = dx + (1.0 - dp_ref[0, 0, 0]) * g.astype(jnp.float32)
    dx_ref[0] = dx.astype(dx_ref.dtype)

    # per-sample partial accumulation across the (i, j) grid steps.
    @pl.when(first)
    def _():
        dwqkv_ref[...] = jnp.zeros_like(dwqkv_ref)
        dbqkv_ref[...] = jnp.zeros_like(dbqkv_ref)
        dwproj_ref[...] = jnp.zeros_like(dwproj_ref)
        dbproj_ref[...] = jnp.zeros_like(dbproj_ref)
        ds_ref[...] = jnp.zeros_like(ds_ref)
        db_ref[...] = jnp.zeros_like(db_ref)
        dbias2_ref[...] = jnp.zeros_like(dbias2_ref)

    dwqkv_ref[...] += dwqkv_p
    dbqkv_ref[...] += dbqkv_p
    dwproj_ref[...] += dwproj_p
    dbproj_ref[...] += dbproj_p
    ds_ref[...] += ds_p
    db_ref[...] += db_p
    dbias2_ref[...] += dbias2_p


@functools.partial(jax.jit, static_argnames=("heads", "window_size", "interpret"))
def pairs_attention_bwd(
    x: jnp.ndarray,  # (B, H, W, C) — the block input (already rolled)
    g: jnp.ndarray,  # (B, H, W, C) — cotangent of the block output
    ln_scale, ln_bias, wqkv, bqkv, wproj, bproj,
    bias,  # (heads, N, N)
    mask,  # (nW, N, N) or None
    dp_scales,  # (B,) or None
    heads: int,
    window_size: int,
    interpret: bool = False,
):
    """Backward of ``x + d*(proj(window_attn(LN(x))) residual - x)`` on maps.
    Returns (dx, ds, db, dwqkv, dbqkv, dwproj, dbproj, dbias) in the
    UNPADDED torch weight layout, or ``None`` when the pair layout doesn't
    fit (caller falls back to the XLA math)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, hgt, w, c = x.shape
    ws = window_size
    n = ws * ws
    nw_row = w // ws
    from studiosr_tpu.ops.pallas import engagement

    chunk = 0
    if hgt % ws == 0 and w % ws == 0:
        # Same selection as the forward pair kernels (swin_block._select_pair_chunk)
        # so forward and backward always agree on the chunking for a shape.
        chunk = _select_pair_chunk(nw_row, heads, n)
    if chunk == 0:
        return engagement.fallback(
            "pairs_attention_bwd", f"layout mismatch: shape {x.shape}, ws={ws}"
        )
    engagement.engaged("pairs_attention_bwd")

    d = c // heads
    dpad = ((d + 31) // 32) * 32
    s = heads * dpad
    cw = chunk * ws
    wqkv_pad, bqkv_pad, wproj_pad = _pad_head_weights(wqkv, bqkv, wproj, heads, d, dpad)
    bias2 = _pair_embed_bias(bias, n)
    grid = (b, hgt // ws, nw_row // chunk)
    n_chunks = nw_row // chunk

    kernel = functools.partial(_bwd_kernel, heads=heads, window_size=ws, dp=dpad)

    def kern(*refs):
        base = list(refs[:9])
        rest = list(refs[9:-8])
        mask_ref = rest.pop(0) if mask is not None else None
        dp_ref = rest.pop(0) if dp_scales is not None else None
        kernel(*base, mask_ref, dp_ref, *refs[-8:])

    full = lambda *shape: pl.BlockSpec(shape, lambda bi, i, j: (0,) * len(shape), memory_space=pltpu.VMEM)
    blk = lambda: pl.BlockSpec((1, ws, cw, c), lambda bi, i, j: (bi, i, j, 0), memory_space=pltpu.VMEM)
    per_b = lambda *shape: pl.BlockSpec((1,) + shape, lambda bi, i, j: (bi,) + (0,) * len(shape), memory_space=pltpu.VMEM)
    in_specs = [
        blk(), blk(),
        full(1, c), full(1, c),
        full(c, 3 * s), full(1, 3 * s), full(s, c), full(1, c),
        full(heads, 2 * n, 2 * n),
    ]
    operands = [
        x, g, ln_scale.reshape(1, c), ln_bias.reshape(1, c),
        wqkv_pad, bqkv_pad.reshape(1, -1), wproj_pad, bproj.reshape(1, c), bias2,
    ]
    if mask is not None:
        in_specs.append(
            pl.BlockSpec((chunk, n, n), lambda bi, i, j: (i * n_chunks + j, 0, 0), memory_space=pltpu.VMEM)
        )
        operands.append(mask)
    if dp_scales is not None:
        in_specs.append(pl.BlockSpec((1, 1, 1), lambda bi, i, j: (bi, 0, 0), memory_space=pltpu.SMEM))
        operands.append(dp_scales.reshape(-1, 1, 1).astype(jnp.float32))

    out_specs = (
        blk(),
        per_b(c, 3 * s), per_b(1, 3 * s), per_b(s, c), per_b(1, c), per_b(1, c), per_b(1, c),
        per_b(heads, 2 * n, 2 * n),
    )
    out_shapes = (
        jax.ShapeDtypeStruct(x.shape, x.dtype),
        jax.ShapeDtypeStruct((b, c, 3 * s), jnp.float32),
        jax.ShapeDtypeStruct((b, 1, 3 * s), jnp.float32),
        jax.ShapeDtypeStruct((b, s, c), jnp.float32),
        jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
        jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
        jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
        jax.ShapeDtypeStruct((b, heads, 2 * n, 2 * n), jnp.float32),
    )
    compiler_params = None
    if not interpret:
        compiler_params = pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024,
        )
    dx, dwqkv_pb, dbqkv_pb, dwproj_pb, dbproj_pb, ds_pb, db_pb, dbias2_pb = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=compiler_params,
        interpret=interpret,
    )(*operands)

    # reduce over batch; map padded/scaled weight grads back to torch layout.
    dwqkv_pad_g = jnp.sum(dwqkv_pb, axis=0)  # (c, 3s)
    dbqkv_pad_g = jnp.sum(dbqkv_pb, axis=0)[0]
    dwproj_pad_g = jnp.sum(dwproj_pb, axis=0)  # (s, c)
    dbproj_g = jnp.sum(dbproj_pb, axis=0)[0]
    ds_g = jnp.sum(ds_pb, axis=0)[0]
    db_g = jnp.sum(db_pb, axis=0)[0]
    dbias2_g = jnp.sum(dbias2_pb, axis=0)  # (heads, 2N, 2N)
    dbias = dbias2_g[:, :n, :n] + dbias2_g[:, n:, n:]

    scale = float(d) ** -0.5

    def unpad_w(wp, sec_scale):
        # (c, heads*dpad) -> (c, heads*d); q grads regain the folded 1/sqrt(d)
        return (wp.reshape(c, heads, dpad)[:, :, :d] * sec_scale).reshape(c, heads * d)

    dwq = unpad_w(dwqkv_pad_g[:, :s], scale)
    dwk = unpad_w(dwqkv_pad_g[:, s : 2 * s], 1.0)
    dwv = unpad_w(dwqkv_pad_g[:, 2 * s :], 1.0)
    dwqkv_g = jnp.concatenate([dwq, dwk, dwv], axis=1)

    def unpad_b(bp, sec_scale):
        return (bp.reshape(heads, dpad)[:, :d] * sec_scale).reshape(heads * d)

    dbq = unpad_b(dbqkv_pad_g[:s], scale)
    dbk = unpad_b(dbqkv_pad_g[s : 2 * s], 1.0)
    dbv = unpad_b(dbqkv_pad_g[2 * s :], 1.0)
    dbqkv_g = jnp.concatenate([dbq, dbk, dbv])

    dwproj_g = dwproj_pad_g.reshape(heads, dpad, c)[:, :d].reshape(heads * d, c)

    return (
        dx,
        ds_g.astype(ln_scale.dtype), db_g.astype(ln_bias.dtype),
        dwqkv_g.astype(wqkv.dtype), dbqkv_g.astype(bqkv.dtype),
        dwproj_g.astype(wproj.dtype), dbproj_g.astype(bproj.dtype),
        dbias.astype(bias.dtype),
    )


# ---------------------------------------------------------------------------
# Non-pair (v5) backward for large windows (HAT's ws=16): same chain, windows
# ride the dot batch dim individually (a 256-token window already spans two
# MXU row tiles, so pairing would only waste cross-window score compute).
# ---------------------------------------------------------------------------


def _bwd_kernel_v5(
    x_ref, g_ref,
    s1_ref, b1_ref,
    wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
    bias_ref,
    mask_ref,  # or None
    dp_ref,  # (1, 1, 1) or None
    dx_ref, dwqkv_ref, dbqkv_ref, dwproj_ref, dbproj_ref, ds_ref, db_ref, dbias_ref,
    *,
    heads: int,
    window_size: int,
    dp: int,
):
    from jax.experimental import pallas as pl

    i = pl.program_id(1)
    j = pl.program_id(2)
    first = (i == 0) & (j == 0)

    ws = window_size
    _, _, w, c = x_ref.shape
    nw = w // ws
    n = ws * ws
    hn = heads * nw
    s = heads * dp
    dt = x_ref.dtype

    x = x_ref[0]
    g = g_ref[0]
    if dp_ref is not None:
        g_branch = (dp_ref[0, 0, 0] * g.astype(jnp.float32)).astype(dt)
    else:
        g_branch = g

    # ---- forward recompute (mirrors _v5_attn_stripe) ----
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + 1e-5)
    xhat = (x32 - mu) * inv
    ln = xhat * s1_ref[0].astype(jnp.float32) + b1_ref[0].astype(jnp.float32)

    ln_windows = ln.astype(dt).reshape(ws, nw, ws, c).transpose(1, 0, 2, 3).reshape(nw * n, c)
    qkv = (
        jnp.dot(ln_windows, wqkv_ref[...], preferred_element_type=jnp.float32) + bqkv_ref[0].astype(jnp.float32)
    ).astype(dt)

    def stack(t, off):
        return jnp.concatenate(
            [t[:, off + h * dp : off + (h + 1) * dp].reshape(nw, n, dp) for h in range(heads)], axis=0
        )

    q = stack(qkv, 0)
    k = stack(qkv, s)
    v = stack(qkv, 2 * s)

    scores = jax.lax.dot_general(
        q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ).reshape(heads, nw, n, n) + bias_ref[...].astype(jnp.float32)[:, None]
    if mask_ref is not None:
        scores = scores + mask_ref[...].astype(jnp.float32)[None]
    scores = scores.reshape(hn, n, n)
    e = jnp.exp(jnp.minimum(scores, 80.0))
    p = e * (1.0 / jnp.sum(e, axis=-1, keepdims=True))  # normalized probs, f32

    av = jax.lax.dot_general(
        p.astype(dt), v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(dt)  # (hn, N, dp)
    attn_rows = jnp.concatenate(
        [av[h * nw : (h + 1) * nw].reshape(nw * n, dp) for h in range(heads)], axis=1
    )  # (nw*N, s) window-major rows
    attn_stripe = attn_rows.reshape(nw, ws, ws, s).transpose(1, 0, 2, 3).reshape(ws * w, s)

    # ---- backward chain ----
    g_rows = g_branch.reshape(ws * w, c)
    dwproj_p = jax.lax.dot_general(
        attn_stripe, g_rows, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dbproj_p = jnp.sum(g_branch.astype(jnp.float32), axis=(0, 1)).reshape(1, c)
    dattn = jnp.dot(g_rows, wproj_ref[...].T, preferred_element_type=jnp.float32).astype(dt)
    dattn_w = dattn.reshape(ws, nw, ws, s).transpose(1, 0, 2, 3).reshape(nw * n, s)
    dav = stack(dattn_w, 0)  # (hn, N, dp)

    p_ = p.astype(dt)
    dv = jax.lax.dot_general(
        p_, dav, dimension_numbers=(((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    dp_mat = jax.lax.dot_general(
        dav, v, dimension_numbers=(((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    dscores = p * (dp_mat - jnp.sum(dp_mat * p, axis=-1, keepdims=True))
    dbias_p = jnp.sum(dscores.reshape(heads, nw, n, n), axis=1)  # (heads, N, N)
    dsc = dscores.astype(dt)
    dq = jax.lax.dot_general(
        dsc, k, dimension_numbers=(((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    dk = jax.lax.dot_general(
        dsc, q, dimension_numbers=(((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )

    def unstack(t):
        return jnp.concatenate(
            [t[h * nw : (h + 1) * nw].reshape(nw * n, dp) for h in range(heads)], axis=1
        )

    dqkv = jnp.concatenate(
        [unstack(dq.astype(dt)), unstack(dk.astype(dt)), unstack(dv.astype(dt))], axis=1
    )
    dwqkv_p = jax.lax.dot_general(
        ln_windows, dqkv, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dbqkv_p = jnp.sum(dqkv.astype(jnp.float32), axis=0).reshape(1, 3 * s)
    dln_w = jnp.dot(dqkv, wqkv_ref[...].T, preferred_element_type=jnp.float32)
    dln = dln_w.astype(dt).reshape(nw, ws, ws, c).transpose(1, 0, 2, 3).reshape(ws, w, c).astype(jnp.float32)

    ds_p = jnp.sum(dln * xhat, axis=(0, 1)).reshape(1, c)
    db_p = jnp.sum(dln, axis=(0, 1)).reshape(1, c)
    dxhat = dln * s1_ref[0].astype(jnp.float32)
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx = g_branch.astype(jnp.float32) + (dxhat - m1 - xhat * m2) * inv
    if dp_ref is not None:
        dx = dx + (1.0 - dp_ref[0, 0, 0]) * g.astype(jnp.float32)
    dx_ref[0] = dx.astype(dx_ref.dtype)

    @pl.when(first)
    def _():
        dwqkv_ref[...] = jnp.zeros_like(dwqkv_ref)
        dbqkv_ref[...] = jnp.zeros_like(dbqkv_ref)
        dwproj_ref[...] = jnp.zeros_like(dwproj_ref)
        dbproj_ref[...] = jnp.zeros_like(dbproj_ref)
        ds_ref[...] = jnp.zeros_like(ds_ref)
        db_ref[...] = jnp.zeros_like(db_ref)
        dbias_ref[...] = jnp.zeros_like(dbias_ref)

    dwqkv_ref[...] += dwqkv_p
    dbqkv_ref[...] += dbqkv_p
    dwproj_ref[...] += dwproj_p
    dbproj_ref[...] += dbproj_p
    ds_ref[...] += ds_p
    db_ref[...] += db_p
    dbias_ref[...] += dbias_p


@functools.partial(jax.jit, static_argnames=("heads", "window_size", "interpret"))
def v5_attention_bwd(
    x: jnp.ndarray,  # (B, H, W, C) — the block input (already rolled)
    g: jnp.ndarray,  # (B, H, W, C) — cotangent of the block output
    ln_scale, ln_bias, wqkv, bqkv, wproj, bproj,
    bias,  # (heads, N, N)
    mask,  # (nW, N, N) or None
    dp_scales,  # (B,) or None
    heads: int,
    window_size: int,
    interpret: bool = False,
):
    """Non-pair one-pass attention backward for ws >= 12 (HAT's ws=16). Same
    contract as :func:`pairs_attention_bwd`; returns None on layout
    mismatch (caller falls back to the XLA math)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from studiosr_tpu.ops.pallas import engagement
    from studiosr_tpu.ops.pallas.swin_block import SCORE_VMEM_BUDGET

    b, hgt, w, c = x.shape
    ws = window_size
    n = ws * ws
    nw_row = w // ws
    # f32 score block per program: heads * chunk * N^2 * 4 (+ dscores copy).
    max_chunk = max(1, SCORE_VMEM_BUDGET * 8 // (heads * n * n * 4))
    chunk = 0
    if hgt % ws == 0 and w % ws == 0 and c % heads == 0:
        for cand in range(1, nw_row + 1):
            if nw_row % cand == 0 and cand <= max_chunk:
                chunk = cand
    if chunk == 0:
        return engagement.fallback(
            "v5_attention_bwd", f"layout mismatch: shape {x.shape}, ws={ws}"
        )
    engagement.engaged("v5_attention_bwd")

    d = c // heads
    dpad = ((d + 31) // 32) * 32
    s = heads * dpad
    cw = chunk * ws
    wqkv_pad, bqkv_pad, wproj_pad = _pad_head_weights(wqkv, bqkv, wproj, heads, d, dpad)
    grid = (b, hgt // ws, nw_row // chunk)
    n_chunks = nw_row // chunk

    kernel = functools.partial(_bwd_kernel_v5, heads=heads, window_size=ws, dp=dpad)

    def kern(*refs):
        base = list(refs[:9])
        rest = list(refs[9:-8])
        mask_ref = rest.pop(0) if mask is not None else None
        dp_ref = rest.pop(0) if dp_scales is not None else None
        kernel(*base, mask_ref, dp_ref, *refs[-8:])

    full = lambda *shape: pl.BlockSpec(shape, lambda bi, i, j: (0,) * len(shape), memory_space=pltpu.VMEM)
    blk = lambda: pl.BlockSpec((1, ws, cw, c), lambda bi, i, j: (bi, i, j, 0), memory_space=pltpu.VMEM)
    per_b = lambda *shape: pl.BlockSpec((1,) + shape, lambda bi, i, j: (bi,) + (0,) * len(shape), memory_space=pltpu.VMEM)
    in_specs = [
        blk(), blk(),
        full(1, c), full(1, c),
        full(c, 3 * s), full(1, 3 * s), full(s, c), full(1, c),
        full(heads, n, n),
    ]
    operands = [
        x, g, ln_scale.reshape(1, c), ln_bias.reshape(1, c),
        wqkv_pad, bqkv_pad.reshape(1, -1), wproj_pad, bproj.reshape(1, c), bias,
    ]
    if mask is not None:
        in_specs.append(
            pl.BlockSpec((chunk, n, n), lambda bi, i, j: (i * n_chunks + j, 0, 0), memory_space=pltpu.VMEM)
        )
        operands.append(mask)
    if dp_scales is not None:
        in_specs.append(pl.BlockSpec((1, 1, 1), lambda bi, i, j: (bi, 0, 0), memory_space=pltpu.SMEM))
        operands.append(dp_scales.reshape(-1, 1, 1).astype(jnp.float32))

    out_specs = (
        blk(),
        per_b(c, 3 * s), per_b(1, 3 * s), per_b(s, c), per_b(1, c), per_b(1, c), per_b(1, c),
        per_b(heads, n, n),
    )
    out_shapes = (
        jax.ShapeDtypeStruct(x.shape, x.dtype),
        jax.ShapeDtypeStruct((b, c, 3 * s), jnp.float32),
        jax.ShapeDtypeStruct((b, 1, 3 * s), jnp.float32),
        jax.ShapeDtypeStruct((b, s, c), jnp.float32),
        jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
        jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
        jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
        jax.ShapeDtypeStruct((b, heads, n, n), jnp.float32),
    )
    compiler_params = None
    if not interpret:
        compiler_params = pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            vmem_limit_bytes=96 * 1024 * 1024,
        )
    dx, dwqkv_pb, dbqkv_pb, dwproj_pb, dbproj_pb, ds_pb, db_pb, dbias_pb = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=compiler_params,
        interpret=interpret,
    )(*operands)

    dwqkv_pad_g = jnp.sum(dwqkv_pb, axis=0)
    dbqkv_pad_g = jnp.sum(dbqkv_pb, axis=0)[0]
    dwproj_pad_g = jnp.sum(dwproj_pb, axis=0)
    dbproj_g = jnp.sum(dbproj_pb, axis=0)[0]
    ds_g = jnp.sum(ds_pb, axis=0)[0]
    db_g = jnp.sum(db_pb, axis=0)[0]
    dbias = jnp.sum(dbias_pb, axis=0)

    scale = float(d) ** -0.5

    def unpad_w(wp, sec_scale):
        return (wp.reshape(c, heads, dpad)[:, :, :d] * sec_scale).reshape(c, heads * d)

    dwq = unpad_w(dwqkv_pad_g[:, :s], scale)
    dwk = unpad_w(dwqkv_pad_g[:, s : 2 * s], 1.0)
    dwv = unpad_w(dwqkv_pad_g[:, 2 * s :], 1.0)
    dwqkv_g = jnp.concatenate([dwq, dwk, dwv], axis=1)

    def unpad_b(bp, sec_scale):
        return (bp.reshape(heads, dpad)[:, :d] * sec_scale).reshape(heads * d)

    dbq = unpad_b(dbqkv_pad_g[:s], scale)
    dbk = unpad_b(dbqkv_pad_g[s : 2 * s], 1.0)
    dbv = unpad_b(dbqkv_pad_g[2 * s :], 1.0)
    dbqkv_g = jnp.concatenate([dbq, dbk, dbv])

    dwproj_g = dwproj_pad_g.reshape(heads, dpad, c)[:, :d].reshape(heads * d, c)

    return (
        dx,
        ds_g.astype(ln_scale.dtype), db_g.astype(ln_bias.dtype),
        dwqkv_g.astype(wqkv.dtype), dbqkv_g.astype(bqkv.dtype),
        dwproj_g.astype(wproj.dtype), dbproj_g.astype(bproj.dtype),
        dbias.astype(bias.dtype),
    )
