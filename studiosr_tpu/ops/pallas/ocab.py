"""Fused OCAB kernel (HAT's overlapping cross-attention block, Pallas TPU).

The XLA lowering of OCAB (``studiosr/models/hat.py:217-264``, ours in
serving/hat_fast.py::_ocab) materializes the unfolded overlapping kv windows
(~2.25x the map) AND the (nW, heads, 256, 576) f32 score tensor in HBM —
gigabytes of traffic per block at 256x256. This kernel computes the whole
block stripe-wise in VMEM:

* grid over window rows; each program assembles its ws-row stripe plus
  ``pad``-row halos (index-clamped halo-row operands, like conv3x3.py);
* LN + q projection once per stripe; the overlapping kv windows are
  (re)projected per window from the LN stripe — 2.25x redundant kv FLOPs on
  an idle MXU instead of 2.25x HBM traffic;
* out-of-image kv tokens are zeroed post-projection, matching the
  reference's zero-padded unfold exactly (zero k/v, NOT zero logits);
* per-window attention with heads on the dot batch dim; softmax without the
  max subtraction (shift-invariant; clamp guards f32 overflow);
* projection + residual + the trailing MLP (LN2/fc1/gelu/fc2) in the same
  pass.

Validated against the XLA _ocab path in tests/ops/test_ocab.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from studiosr_tpu.ops.pallas.swin_block import _layernorm, _mlp_rows, _pad_head_weights

__all__ = ["fused_ocab_block"]


def _stack_heads(t, heads, dp):
    """(rows, heads*dp) -> (heads, rows, dp)."""
    return jnp.concatenate([t[:, h * dp : (h + 1) * dp][None] for h in range(heads)], axis=0)


def _ocab_kernel(
    prev_ref, cur_ref, next_ref,
    s1_ref, b1_ref,
    wq_ref, bq_ref, wkv_ref, bkv_ref,
    wproj_ref, bproj_ref,
    bias_ref,  # (heads, ws*ws, owin*owin)
    s2_ref, b2_ref, w1_ref, fb1_ref, w2_ref, fb2_ref,
    out_ref,
    *,
    heads: int,
    ws: int,
    pad: int,
    dp: int,
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(1)
    _, _, w, c = cur_ref.shape
    owin = ws + 2 * pad
    nq = ws * ws
    nk = owin * owin
    s = heads * dp
    nw = w // ws
    n_rows = pl.num_programs(1) * ws

    def body(lnp_ref):
        s1 = s1_ref[0].astype(jnp.float32)
        b1 = b1_ref[0].astype(jnp.float32)
        dt = cur_ref.dtype
        # LN in row chunks straight into the col-padded scratch: a whole-
        # stripe f32 LN intermediate alone is ~9 MB of scoped VMEM.
        zpad = jnp.zeros((pad, pad, c), dt)
        lnp_ref[:pad, :pad] = zpad
        lnp_ref[:pad, pad + w :] = zpad
        lnp_ref[:pad, pad : pad + w] = _layernorm(prev_ref[0].astype(jnp.float32), s1, b1).astype(dt)
        lnp_ref[pad + ws :, :pad] = zpad
        lnp_ref[pad + ws :, pad + w :] = zpad
        lnp_ref[pad + ws :, pad : pad + w] = _layernorm(next_ref[0].astype(jnp.float32), s1, b1).astype(dt)
        half = ws // 2
        zmid = jnp.zeros((half, pad, c), dt)
        for r0 in (0, half):
            lnp_ref[pad + r0 : pad + r0 + half, :pad] = zmid
            lnp_ref[pad + r0 : pad + r0 + half, pad + w :] = zmid
            lnp_ref[pad + r0 : pad + r0 + half, pad : pad + w] = _layernorm(
                cur_ref[0, r0 : r0 + half].astype(jnp.float32), s1, b1
            ).astype(dt)

        # q is projected per window inside the loop (from the LN scratch) —
        # a whole-stripe q buffer alone costs ~1.6 MB of scoped VMEM.

        # kv token validity (row part; the reference's unfold reads a
        # zero-padded kv map, so out-of-image tokens must have kv == 0).
        r24 = jax.lax.broadcasted_iota(jnp.int32, (nk, 1), 0) // owin
        row_g = i * ws - pad + r24
        row_ok = (row_g >= 0) & (row_g < n_rows)
        c24 = jax.lax.broadcasted_iota(jnp.int32, (nk, 1), 0) % owin

        def window(j, carry):
            js = pl.multiple_of(j * ws, 8)
            kv_in = lnp_ref[:, pl.ds(js, owin), :].reshape(nk, c)
            kv = (
                jnp.dot(kv_in, wkv_ref[...], preferred_element_type=jnp.float32)
                + bkv_ref[0].astype(jnp.float32)
            ).astype(dt)
            col_g = j * ws - pad + c24
            ok = row_ok & (col_g >= 0) & (col_g < w)
            kv = jnp.where(ok, kv, jnp.zeros_like(kv))
            # q's scratch columns sit at pad + j*ws (misaligned by pad mod 8,
            # which Mosaic rejects for dynamic starts); recompute the LN on
            # the window's own aligned slice of cur_ref instead (tiny).
            q_ln = _layernorm(
                cur_ref[0, :, pl.ds(js, ws), :].astype(jnp.float32), s1, b1
            ).astype(dt).reshape(nq, c)
            qw = (
                jnp.dot(q_ln, wq_ref[...], preferred_element_type=jnp.float32)
                + bq_ref[0].astype(jnp.float32)
            ).astype(dt)
            outs = []
            for h in range(heads):
                k_h = kv[:, h * dp : (h + 1) * dp]
                v_h = kv[:, s + h * dp : s + (h + 1) * dp]
                q_h = qw[:, h * dp : (h + 1) * dp]
                scores = jax.lax.dot_general(
                    q_h, k_h, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (nq, nk)
                scores = scores + bias_ref[h].astype(jnp.float32)
                probs = jnp.exp(jnp.minimum(scores, 80.0))
                denom = jnp.sum(probs, axis=-1, keepdims=True)
                av = jax.lax.dot_general(
                    probs.astype(dt), v_h, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                outs.append((av * (1.0 / denom)).astype(dt))
            merged = jnp.concatenate(outs, axis=1)  # (nq, s)
            proj = (
                jnp.dot(merged, wproj_ref[...], preferred_element_type=jnp.float32)
                + bproj_ref[0].astype(jnp.float32)
            )
            xw = cur_ref[0, :, pl.ds(js, ws), :].reshape(nq, c).astype(jnp.float32)
            y = (xw + proj).astype(dt)
            z = _mlp_rows(y, s2_ref[0], b2_ref[0], w1_ref[...], fb1_ref[0], w2_ref[...], fb2_ref[0])
            out_ref[0, :, pl.ds(js, ws), :] = z.reshape(ws, ws, c).astype(out_ref.dtype)
            return carry

        jax.lax.fori_loop(0, nw, window, 0)

    pl.run_scoped(
        body,
        lnp_ref=pltpu.VMEM((ws + 2 * pad, w + 2 * pad, c), cur_ref.dtype),
    )


def prepare_ocab_weights(wqkv, bqkv, wproj, bias, heads: int, dtype):
    """Pre-lay the OCAB qkv/proj weights + rel-pos bias into the kernel's
    operand layout (pass via ``prep=``); same helpers as the in-trace path."""
    c = wqkv.shape[0]
    d = c // heads
    dp = ((d + 31) // 32) * 32
    s_ = heads * dp
    wqkv_pad, bqkv_pad, wproj_pad = _pad_head_weights(
        wqkv.astype(dtype), bqkv, wproj.astype(dtype), heads, d, dp
    )
    return {
        "wq": wqkv_pad[:, :s_], "bq": bqkv_pad[:s_],
        "wkv": wqkv_pad[:, s_:], "bkv": bqkv_pad[s_:],
        "wproj": wproj_pad, "bias": bias.astype(dtype),
    }


@functools.partial(jax.jit, static_argnames=("heads", "ws", "overlap_ratio", "interpret"))
def fused_ocab_block(
    x: jnp.ndarray,  # (B, H, W, C)
    ln1_scale, ln1_bias,
    wqkv, bqkv,  # (C, 3C), (3C,)
    wproj, bproj,
    bias,  # (heads, ws*ws, owin*owin)
    ln2_scale, ln2_bias,
    w1, b1, w2, b2,
    heads: int,
    ws: int,
    overlap_ratio: float,
    interpret: bool = False,
    prep=None,  # optional prepare_ocab_weights dict
):
    """Whole OCAB block (cross-attention + MLP) in one HBM pass. Returns
    ``None`` when the layout doesn't fit (caller falls back to XLA)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from studiosr_tpu.ops.pallas import engagement

    b, hgt, w, c = x.shape
    owin = int(ws * overlap_ratio) + ws
    pad = (owin - ws) // 2
    # ws % 8: the kernel's dynamic kv/q/out column starts are asserted
    # 8-aligned via pl.multiple_of(j * ws, 8); admitting a non-multiple ws
    # would make that hint false (wrong DMAs on TPU — Mosaic alignment rule).
    # owin % 8: the kv slice SIZE (pl.ds(js, owin)) must also be 8-aligned
    # (e.g. ws=8, overlap 0.5 -> owin=12 passes every other check but
    # violates the Mosaic spatial-slice-size rule on hardware; CPU interpret
    # mode decomposes the kernel and cannot catch it).
    if hgt % ws or w % ws or pad == 0 or ws % pad or c % heads or ws % 8 or owin % 8:
        return engagement.fallback(
            "fused_ocab_block",
            f"layout mismatch: shape {x.shape}, ws={ws}, pad={pad}, heads={heads}",
        )
    engagement.engaged("fused_ocab_block")

    d = c // heads
    dp = ((d + 31) // 32) * 32
    s = heads * dp
    if prep is not None:
        wq, bq, wkv, bkv = prep["wq"], prep["bq"], prep["wkv"], prep["bkv"]
        wproj_pad, bias_t = prep["wproj"], prep["bias"]
        assert wq.shape == (c, s) and wkv.shape == (c, 2 * s), (wq.shape, wkv.shape)
    else:
        wqkv_pad, bqkv_pad, wproj_pad = _pad_head_weights(wqkv, bqkv, wproj, heads, d, dp)
        wq, bq = wqkv_pad[:, :s], bqkv_pad[:s]
        wkv, bkv = wqkv_pad[:, s:], bqkv_pad[s:]
        # bias in the compute dtype: exact in f32 mode; bf16 noise in bf16
        # mode (consistent with the rest of the bf16 path).
        bias_t = bias.astype(x.dtype)
    hidden = w1.shape[1]

    n_hb = hgt // pad
    r = ws // pad
    clamp = lambda v: jnp.clip(v, 0, n_hb - 1)
    in_specs = [
        pl.BlockSpec((1, pad, w, c), lambda bi, i: (bi, clamp(i * r - 1), 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, ws, w, c), lambda bi, i: (bi, i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, pad, w, c), lambda bi, i: (bi, clamp((i + 1) * r), 0, 0), memory_space=pltpu.VMEM),
    ]
    full = lambda *shape: pl.BlockSpec(shape, lambda bi, i: (0,) * len(shape), memory_space=pltpu.VMEM)
    in_specs += [
        full(1, c), full(1, c),
        full(c, s), full(1, s), full(c, 2 * s), full(1, 2 * s),
        full(s, c), full(1, c),
        full(heads, ws * ws, owin * owin),
        full(1, c), full(1, c), full(c, hidden), full(1, hidden), full(hidden, c), full(1, c),
    ]
    kernel = functools.partial(_ocab_kernel, heads=heads, ws=ws, pad=pad, dp=dp)
    return pl.pallas_call(
        kernel,
        grid=(b, hgt // ws),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, ws, w, c), lambda bi, i: (bi, i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            # the working set is ~17.4 MB; raise the scoped budget above the
            # 16 MB default (the same escape jax's TPU flash-attention uses)
            vmem_limit_bytes=32 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        x, x, x,
        ln1_scale.reshape(1, c), ln1_bias.reshape(1, c),
        wq, bq.reshape(1, -1), wkv, bkv.reshape(1, -1),
        wproj_pad, bproj.reshape(1, c),
        bias_t,
        ln2_scale.reshape(1, c), ln2_bias.reshape(1, c),
        w1.astype(x.dtype), b1.reshape(1, -1), w2.astype(x.dtype), b2.reshape(1, -1),
    )
