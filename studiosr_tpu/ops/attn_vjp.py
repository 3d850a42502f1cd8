"""Differentiable fused window-attention block (custom VJP).

Training counterpart of ``fused_window_attention_block``:
``attention_block_vjp(x, s, b, wqkv, bqkv, wproj, bproj, bias, mask, ...)``
computes ``x + proj(window_attn(LN(x)))`` on (nW, N, C)-partitioned windows
with a hand-written backward:

* residuals: the input windows only; LN/qkv/scores/probs are recomputed in
  the backward kernel (flash-style);
* per-program partial gradients for the weights and the relative-position
  bias; partials are reduced in XLA. The bias gradient is emitted per (N, N)
  position and scatter-added into the (2ws-1)^2 table outside via
  ``segment_sum`` over the static relative-position index.

Operates on pre-partitioned windows (roll/partition/reverse are cheap XLA
ops with trivial autodiff); validated against jax.grad of the XLA reference
in tests/ops/test_attn_vjp.py. Completes the fused-training kernel pair
(round-2 roadmap item 1).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["attention_block_vjp", "attention_map_vjp"]

# Test hook: force the fused-kernel branch on the CPU backend (kernels run
# in interpret mode) so engagement and interpret-parity of the map-level
# fused path are observable in the CPU suite. Production never sets this.
FORCE_FUSED = False


def _ln_stats(x32, eps=1e-5):
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    return (x32 - mu) * inv, inv


def _split_heads(t, heads, d):
    nw, n, _ = t.shape
    return t.reshape(nw, n, heads, d).transpose(0, 2, 1, 3)  # (nw, heads, n, d)


def _merge_heads(t):
    nw, heads, n, d = t.shape
    return t.transpose(0, 2, 1, 3).reshape(nw, n, heads * d)


def _forward_math(x, s, b, wqkv, bqkv, wproj, bproj, bias, mask, heads):
    """XLA forward on (nW, N, C) windows; also the recompute used in bwd."""
    nw, n, c = x.shape
    d = c // heads
    x32 = x.astype(jnp.float32)
    xhat, inv = _ln_stats(x32)
    ln = xhat * s.astype(jnp.float32) + b.astype(jnp.float32)
    qkv = ln.astype(x.dtype) @ wqkv + bqkv.astype(jnp.float32)
    q = _split_heads(qkv[..., :c], heads, d) * (float(d) ** -0.5)
    k = _split_heads(qkv[..., c : 2 * c], heads, d)
    v = _split_heads(qkv[..., 2 * c :], heads, d)
    scores = jnp.einsum("whnd,whmd->whnm", q, k).astype(jnp.float32) + bias[None].astype(jnp.float32)
    if mask is not None:
        # windows are (B*nW_mask); the shift mask repeats across the batch.
        rep = x.shape[0] // mask.shape[0]
        m = jnp.tile(mask, (rep, 1, 1)) if rep > 1 else mask
        scores = scores + m[:, None].astype(jnp.float32)
    scores = scores - jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores)
    probs = e / jnp.sum(e, axis=-1, keepdims=True)
    av = jnp.einsum("whnm,whmd->whnd", probs.astype(v.dtype), v)
    attn = _merge_heads(av)
    out = x32 + (attn @ wproj + bproj.astype(jnp.float32))
    return out.astype(x.dtype), (xhat, inv, ln, q, k, v, probs, attn)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9,))
def attention_block_vjp(x, s, b, wqkv, bqkv, wproj, bproj, bias, mask, heads):
    out, _ = _forward_math(x, s, b, wqkv, bqkv, wproj, bproj, bias, mask, heads)
    return out


def _fwd(x, s, b, wqkv, bqkv, wproj, bproj, bias, mask, heads):
    out, _ = _forward_math(x, s, b, wqkv, bqkv, wproj, bproj, bias, mask, heads)
    return out, (x, s, b, wqkv, bqkv, wproj, bproj, bias, mask)


def _window_bwd_math(x, s, b, wqkv, bqkv, wproj, bproj, bias, mask, heads, g):
    """Backward of ``x + proj(window_attn(LN(x)))`` on (nW, N, C) windows,
    recomputing the forward intermediates flash-style. Returns grads for
    (x, s, b, wqkv, bqkv, wproj, bproj, bias)."""
    nw, n, c = x.shape
    d = c // heads
    scale = float(d) ** -0.5
    dt = x.dtype  # matmuls run in the compute dtype (bf16 under autocast),
    # accumulating f32 — the same precision plain autodiff of a bf16 forward
    # would use; reductions/softmax-backward stay f32.
    g32 = g.astype(jnp.float32)
    g_ = g.astype(dt)

    # Recompute forward intermediates (flash-style rematerialization).
    _, (xhat, inv, ln, q, k, v, probs, attn) = _forward_math(
        x, s, b, wqkv, bqkv, wproj, bproj, bias, mask, heads
    )

    # proj backward.
    dwproj = jnp.einsum("wnc,wnk->ck", attn.astype(dt), g_, preferred_element_type=jnp.float32)
    dbproj = jnp.sum(g32, axis=(0, 1))
    dattn = jnp.einsum("wnk,ck->wnc", g_, wproj.astype(dt), preferred_element_type=jnp.float32).astype(dt)
    dav = _split_heads(dattn, heads, d)  # (nw, heads, n, d)

    # attention backward.
    p32 = probs.astype(jnp.float32)
    dv = jnp.einsum("whnm,whnd->whmd", probs.astype(dt), dav, preferred_element_type=jnp.float32)
    dprobs = jnp.einsum("whnd,whmd->whnm", dav, v.astype(dt), preferred_element_type=jnp.float32)
    dscores = p32 * (dprobs - jnp.sum(dprobs * p32, axis=-1, keepdims=True))
    dbias = jnp.sum(dscores, axis=0)  # (heads, n, n); mask gets no grad
    dscores_ = dscores.astype(dt)
    # q in the recompute is pre-scaled: d(q_raw) picks up the scale; dk uses
    # the scaled q directly.
    dq = jnp.einsum("whnm,whmd->whnd", dscores_, k.astype(dt), preferred_element_type=jnp.float32) * scale
    dk = jnp.einsum("whnm,whnd->whmd", dscores_, q.astype(dt), preferred_element_type=jnp.float32)

    dqkv = jnp.concatenate(
        [_merge_heads(dq.astype(dt)), _merge_heads(dk.astype(dt)), _merge_heads(dv.astype(dt))], axis=-1
    )  # (nw, n, 3C)

    # qkv projection backward.
    dwqkv = jnp.einsum(
        "wnc,wnk->ck", ln.reshape(nw, n, c).astype(dt), dqkv, preferred_element_type=jnp.float32
    )
    dbqkv = jnp.sum(dqkv.astype(jnp.float32), axis=(0, 1))
    dln = jnp.einsum("wnk,ck->wnc", dqkv, wqkv.astype(dt), preferred_element_type=jnp.float32)

    # LayerNorm backward.
    ds = jnp.sum(dln * xhat, axis=(0, 1))
    db = jnp.sum(dln, axis=(0, 1))
    dxhat = dln * s.astype(jnp.float32)
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx = (g32 + (dxhat - m1 - xhat * m2) * inv).astype(x.dtype)

    return (
        dx,
        ds.astype(s.dtype),
        db.astype(b.dtype),
        dwqkv.astype(wqkv.dtype),
        dbqkv.astype(bqkv.dtype),
        dwproj.astype(wproj.dtype),
        dbproj.astype(bproj.dtype),
        dbias.astype(bias.dtype),
    )


def _bwd(heads, residuals, g):
    x, s, b, wqkv, bqkv, wproj, bproj, bias, mask = residuals
    grads = _window_bwd_math(x, s, b, wqkv, bqkv, wproj, bproj, bias, mask, heads, g)
    return grads + (None if mask is None else jnp.zeros_like(mask),)


attention_block_vjp.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# Map-level block: roll + window partition folded in, Pallas-fused forward.
# ---------------------------------------------------------------------------


def _map_forward_xla(x, s, b, wqkv, bqkv, wproj, bproj, bias, mask, shift, heads, ws):
    from studiosr_tpu.ops.windows import window_partition, window_reverse

    _, hgt, wdt, c = x.shape
    z = jnp.roll(x, (-shift, -shift), axis=(1, 2)) if shift else x
    windows = window_partition(z, ws).reshape(-1, ws * ws, c)
    out, _ = _forward_math(windows, s, b, wqkv, bqkv, wproj, bproj, bias, mask, heads)
    z = window_reverse(out.reshape(-1, ws, ws, c), ws, hgt, wdt)
    return jnp.roll(z, (shift, shift), axis=(1, 2)) if shift else z


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12))
def attention_map_vjp(x, s, b, wqkv, bqkv, wproj, bproj, bias, mask, dp_scales, shift, heads, ws):
    """``x + d1 * (proj(window_attn(LN(roll(x)))) rolled back - x)`` on
    (B, H, W, C) maps. The primal runs the fused Pallas serving kernel on
    TPU (identical math, VMEM-resident, with the per-sample stochastic-depth
    scale ``dp_scales`` (B,) folded in — ops/pallas/swin_block.py); the
    backward is the validated XLA window math with flash-style recompute and
    the scale applied analytically. ``mask`` and ``dp_scales`` get zero
    gradients; roll/partition are permutations so their transpose is the
    inverse roll/partition of the incoming cotangent.

    The primal delegates to ``_map_fwd`` so a NON-differentiated apply of a
    fused_train module (eval, metrics, dryrun) takes the same fused kernel
    path as ``value_and_grad`` — running the unfused XLA forward here both
    doubled eval-forward traffic on TPU and made grad/no-grad outputs
    diverge by the kernel-vs-XLA rounding delta."""
    return _map_fwd(x, s, b, wqkv, bqkv, wproj, bproj, bias, mask, dp_scales, shift, heads, ws)[0]


def _apply_dp(x, full, dp_scales):
    if dp_scales is None:
        return full
    d = dp_scales.reshape(-1, 1, 1, 1).astype(jnp.float32)
    x32 = x.astype(jnp.float32)
    return (x32 + d * (full.astype(jnp.float32) - x32)).astype(x.dtype)


def _map_fwd(x, s, b, wqkv, bqkv, wproj, bproj, bias, mask, dp_scales, shift, heads, ws):
    out = None
    on_cpu = jax.default_backend() == "cpu"
    if FORCE_FUSED or not on_cpu:
        from studiosr_tpu.ops.pallas.swin_block import fused_window_attention_block

        z0 = jnp.roll(x, (-shift, -shift), axis=(1, 2)) if shift else x
        try:
            z = fused_window_attention_block(
                z0, s, b, wqkv.astype(z0.dtype), bqkv, wproj.astype(z0.dtype), bproj, bias, mask,
                heads=heads, window_size=ws, drop_path=dp_scales, interpret=on_cpu,
            )
            if z is not None:
                out = jnp.roll(z, (shift, shift), axis=(1, 2)) if shift else z
        except NotImplementedError:
            # Non-pair layout (e.g. HAT's ws=16) can't fold drop_path into
            # the kernel: still run the fused forward, scale outside.
            z = fused_window_attention_block(
                z0, s, b, wqkv.astype(z0.dtype), bqkv, wproj.astype(z0.dtype), bproj, bias, mask,
                heads=heads, window_size=ws, interpret=on_cpu,
            )
            if z is not None:
                full = jnp.roll(z, (shift, shift), axis=(1, 2)) if shift else z
                out = _apply_dp(x, full, dp_scales)
    if out is None:
        full = _map_forward_xla(x, s, b, wqkv, bqkv, wproj, bproj, bias, mask, shift, heads, ws)
        out = _apply_dp(x, full, dp_scales)
    return out, (x, s, b, wqkv, bqkv, wproj, bproj, bias, mask, dp_scales)


def _map_bwd(shift, heads, ws, residuals, g):
    from studiosr_tpu.ops.windows import window_partition, window_reverse

    x, s, b, wqkv, bqkv, wproj, bproj, bias, mask, dp_scales = residuals
    _, hgt, wdt, c = x.shape
    g32 = g.astype(jnp.float32)

    if jax.default_backend() != "cpu":
        # One-pass Pallas backward (recompute + whole chain in VMEM): the
        # XLA math materializes the (nW, heads, N, N) cotangents in HBM.
        # Pairs layout for ws=8; the v5 per-window layout for ws>=12 (HAT).
        from studiosr_tpu.ops.pallas.attn_bwd import pairs_attention_bwd, v5_attention_bwd

        z = jnp.roll(x, (-shift, -shift), axis=(1, 2)) if shift else x
        gz = jnp.roll(g, (-shift, -shift), axis=(1, 2)) if shift else g
        res = pairs_attention_bwd(
            z, gz, s, b, wqkv, bqkv, wproj, bproj, bias, mask, dp_scales,
            heads=heads, window_size=ws,
        )
        if res is None:
            res = v5_attention_bwd(
                z, gz, s, b, wqkv, bqkv, wproj, bproj, bias, mask, dp_scales,
                heads=heads, window_size=ws,
            )
        if res is not None:
            dz, ds, db, dwqkv, dbqkv, dwproj, dbproj, dbias = res
            dx = jnp.roll(dz, (shift, shift), axis=(1, 2)) if shift else dz
            dmask = None if mask is None else jnp.zeros_like(mask)
            ddp = None if dp_scales is None else jnp.zeros_like(dp_scales)
            return (dx, ds, db, dwqkv, dbqkv, dwproj, dbproj, dbias, dmask, ddp)
    if dp_scales is not None:
        d = dp_scales.reshape(-1, 1, 1, 1).astype(jnp.float32)
        g_in = (d * g32).astype(x.dtype)
    else:
        g_in = g
    z = jnp.roll(x, (-shift, -shift), axis=(1, 2)) if shift else x
    gz = jnp.roll(g_in, (-shift, -shift), axis=(1, 2)) if shift else g_in
    zw = window_partition(z, ws).reshape(-1, ws * ws, c)
    gw = window_partition(gz, ws).reshape(-1, ws * ws, c)
    dzw, ds, db, dwqkv, dbqkv, dwproj, dbproj, dbias = _window_bwd_math(
        zw, s, b, wqkv, bqkv, wproj, bproj, bias, mask, heads, gw
    )
    dz = window_reverse(dzw.reshape(-1, ws, ws, c), ws, hgt, wdt)
    dx = jnp.roll(dz, (shift, shift), axis=(1, 2)) if shift else dz
    if dp_scales is not None:
        dx = (dx.astype(jnp.float32) + (1.0 - d) * g32).astype(x.dtype)
    dmask = None if mask is None else jnp.zeros_like(mask)
    ddp = None if dp_scales is None else jnp.zeros_like(dp_scales)
    return (dx, ds, db, dwqkv, dbqkv, dwproj, dbproj, dbias, dmask, ddp)


attention_map_vjp.defvjp(_map_fwd, _map_bwd)
