"""Differentiable fused MLP block (custom VJP) — fused-training seed.

The inference kernels in swin_block.py are not differentiable (pallas_call
has no automatic VJP). This module provides the training counterpart for the
MLP half — ``mlp_block_vjp(x, s, b, w1, b1, w2, b2)`` computes
``x + fc2(gelu(fc1(LN(x))))`` with a hand-written backward:

* residuals: only the input ``x`` (flash-style; LN/h1/g1 are recomputed in
  the backward kernel — the same memory/FLOP trade as ``jax.checkpoint``);
* the backward kernel emits ``dx`` blocks plus per-program *partial* weight
  gradients; the partials are summed outside in XLA (avoids cross-program
  accumulation, which would serialize the grid).

Gradients are validated against ``jax.grad`` of the XLA reference in
tests/ops/test_mlp_vjp.py. This establishes the pattern for the attention
block's VJP (round-2 roadmap item 1).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from studiosr_tpu.ops.pallas.swin_block import _erf

__all__ = ["mlp_block_vjp", "mlp_block_dp_vjp"]

# Test hook: force the fused-kernel branch on the CPU backend (interpret
# mode) so engagement/parity of the fused primal is observable in the CPU
# suite. Production never sets this.
FORCE_FUSED = False

_INV_SQRT2 = float(1.0 / np.sqrt(2.0))
_INV_SQRT2PI = float(1.0 / np.sqrt(2.0 * np.pi))


def _ln_stats(x32, eps=1e-5):
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    return (x32 - mu) * inv, inv


def _reference_forward(x, s, b, w1, b1, w2, b2):
    """Pure-XLA reference (also used as the forward when not on TPU)."""
    x32 = x.astype(jnp.float32)
    xhat, _ = _ln_stats(x32)
    ln = xhat * s.astype(jnp.float32) + b.astype(jnp.float32)
    h1 = ln.astype(x.dtype) @ w1 + b1.astype(jnp.float32)
    g1 = 0.5 * h1 * (1.0 + _erf(h1 * _INV_SQRT2))
    y = x32 + (g1.astype(x.dtype) @ w2 + b2.astype(jnp.float32))
    return y.astype(x.dtype)


def _bwd_kernel(x_ref, g_ref, s_ref, b_ref, w1_ref, b1_ref, w2_ref,
                dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref, ds_ref, db_ref,
                *, chunk=1):
    x = x_ref[...]
    g = g_ref[...].astype(jnp.float32)
    s = s_ref[0].astype(jnp.float32)
    b = b_ref[0].astype(jnp.float32)

    # Recompute the forward intermediates (flash-style).
    x32 = x.astype(jnp.float32)
    xhat, inv = _ln_stats(x32)
    ln = (xhat * s + b).astype(x.dtype)
    h1 = jnp.dot(ln, w1_ref[...], preferred_element_type=jnp.float32) + b1_ref[0].astype(jnp.float32)
    phi = jnp.exp(-0.5 * h1 * h1) * _INV_SQRT2PI
    cdf = 0.5 * (1.0 + _erf(h1 * _INV_SQRT2))
    g1 = h1 * cdf

    # Backward chain.
    dg1 = jnp.dot(g.astype(x.dtype), w2_ref[...].T.astype(x.dtype), preferred_element_type=jnp.float32)
    dh1 = dg1 * (cdf + h1 * phi)
    dln = jnp.dot(dh1.astype(x.dtype), w1_ref[...].T.astype(x.dtype), preferred_element_type=jnp.float32)

    # LN backward.
    dxhat = dln * s
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx_ln = (dxhat - m1 - xhat * m2) * inv

    dx_ref[...] = (g + dx_ln).astype(dx_ref.dtype)

    # Partial weight grads. With ``chunk`` > 0 the grid is sequential and
    # programs [k*chunk, (k+1)*chunk) accumulate into partial block k —
    # CONSECUTIVE revisits of each output block, which is what the Pallas
    # TPU output-revisiting contract guarantees (an interleaved i % n_acc
    # map leaves the re-opened block's contents undefined). Bounded partial
    # count instead of one per program — the per-program form kept
    # ~20 x 63 MB of HLO temps live in the HAT training graph (OOM).
    vals = (
        jax.lax.dot_general(
            ln, dh1.astype(x.dtype), (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ),
        jnp.sum(dh1, axis=0, keepdims=True),
        jax.lax.dot_general(
            g1.astype(x.dtype), g.astype(x.dtype), (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ),
        jnp.sum(g, axis=0, keepdims=True),
        jnp.sum(dln * xhat, axis=0, keepdims=True),
        jnp.sum(dln, axis=0, keepdims=True),
    )
    refs = (dw1_ref, db1_ref, dw2_ref, db2_ref, ds_ref, db_ref)
    if chunk > 1:
        from jax.experimental import pallas as pl

        i = pl.program_id(0)

        @pl.when(i % chunk == 0)
        def _init():
            for ref, val in zip(refs, vals):
                ref[0] = val

        @pl.when(i % chunk != 0)
        def _accum():
            for ref, val in zip(refs, vals):
                ref[0] = ref[0] + val
    else:
        for ref, val in zip(refs, vals):
            ref[0] = val


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def mlp_block_vjp(x, s, b, w1, b1, w2, b2):
    # Delegate to _fwd so non-differentiated applies (eval/metrics) take the
    # same fused-kernel path as value_and_grad (see attention_map_vjp).
    return _fwd(x, s, b, w1, b1, w2, b2)[0]


def _fwd(x, s, b, w1, b1, w2, b2):
    on_cpu = jax.default_backend() == "cpu"
    if on_cpu and not FORCE_FUSED:
        out = _reference_forward(x, s, b, w1, b1, w2, b2)
    else:
        # Identical math, single VMEM-resident pass (ops/pallas/swin_block.py).
        from studiosr_tpu.ops.pallas.swin_block import fused_mlp_block

        out = fused_mlp_block(
            x, s, b, w1.astype(x.dtype), b1, w2.astype(x.dtype), b2, interpret=on_cpu
        )
    return out, (x, s, b, w1, b1, w2, b2)


def _bwd(residuals, g):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    x, s, b, w1, b1, w2, b2 = residuals
    rows, c = x.shape
    hidden = w1.shape[1]
    block_rows = 512
    pad = (-rows) % block_rows
    xp = jnp.pad(x, ((0, pad), (0, 0))) if pad else x
    gp = jnp.pad(g, ((0, pad), (0, 0))) if pad else g
    n_blocks = (rows + pad) // block_rows

    full = lambda *shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
    interpret = jax.default_backend() == "cpu"
    # Sequential grid + revisited partial blocks: a bounded number of
    # partials regardless of row count (per-program partials OOM'd the HAT
    # training graph). Programs [k*chunk, (k+1)*chunk) map to partial block
    # k so every block's revisits are CONSECUTIVE — the only revisit pattern
    # the Pallas TPU contract defines (i % n_acc interleaving is UB).
    chunk = -(-n_blocks // 8)  # ceil: at most 8 partial blocks
    n_acc = -(-n_blocks // chunk)  # actually-used partial blocks
    out_shapes = (
        jax.ShapeDtypeStruct(xp.shape, x.dtype),
        jax.ShapeDtypeStruct((n_acc, c, hidden), jnp.float32),
        jax.ShapeDtypeStruct((n_acc, 1, hidden), jnp.float32),
        jax.ShapeDtypeStruct((n_acc, hidden, c), jnp.float32),
        jax.ShapeDtypeStruct((n_acc, 1, c), jnp.float32),
        jax.ShapeDtypeStruct((n_acc, 1, c), jnp.float32),
        jax.ShapeDtypeStruct((n_acc, 1, c), jnp.float32),
    )
    acc_spec = lambda *shape: pl.BlockSpec((1,) + shape, lambda i: (i // chunk, 0, 0), memory_space=pltpu.VMEM)
    out_specs = (
        pl.BlockSpec((block_rows, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        acc_spec(c, hidden),
        acc_spec(1, hidden),
        acc_spec(hidden, c),
        acc_spec(1, c),
        acc_spec(1, c),
        acc_spec(1, c),
    )
    dx, dw1p, db1p, dw2p, db2p, dsp, dbp = pl.pallas_call(
        functools.partial(_bwd_kernel, chunk=chunk),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((block_rows, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            full(1, c),
            full(1, c),
            full(c, hidden),
            full(1, hidden),
            full(hidden, c),
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=None if interpret else pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(xp, gp, s.reshape(1, c), b.reshape(1, c), w1, b1.reshape(1, hidden), w2)

    dx = dx[:rows] if pad else dx
    return (
        dx,
        dsp.sum(axis=0)[0].astype(s.dtype),
        dbp.sum(axis=0)[0].astype(b.dtype),
        dw1p.sum(axis=0).astype(w1.dtype),
        db1p.sum(axis=0)[0].astype(b1.dtype),
        dw2p.sum(axis=0).astype(w2.dtype),
        db2p.sum(axis=0)[0].astype(b2.dtype),
    )


mlp_block_vjp.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# DropPath-folding variant: y = x + d * (fc2(gelu(fc1(LN(x))))), d per sample.
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(8,))
def mlp_block_dp_vjp(x, s, b, w1, b1, w2, b2, dp_scales, rows_per_sample):
    """``mlp_block_vjp`` with the per-sample stochastic-depth scale folded
    into the kernel (the XLA formulation costs ~3 full-map passes per block
    in training). ``dp_scales`` (B,) are already divided by keep and get a
    zero gradient; ``rows_per_sample`` maps flat rows to samples."""
    return _dp_fwd(x, s, b, w1, b1, w2, b2, dp_scales, rows_per_sample)[0]


def _row_scales(dp_scales, rows, rows_per_sample):
    d = jnp.repeat(dp_scales.astype(jnp.float32), rows_per_sample)
    return d.reshape(rows, 1)


def _dp_fwd(x, s, b, w1, b1, w2, b2, dp_scales, rows_per_sample):
    if jax.default_backend() == "cpu":
        d = _row_scales(dp_scales, x.shape[0], rows_per_sample)
        full = _reference_forward(x, s, b, w1, b1, w2, b2)
        x32 = x.astype(jnp.float32)
        out = (x32 + d * (full.astype(jnp.float32) - x32)).astype(x.dtype)
    else:
        from studiosr_tpu.ops.pallas.swin_block import fused_mlp_block

        out = fused_mlp_block(
            x, s, b, w1.astype(x.dtype), b1, w2.astype(x.dtype), b2,
            drop_path=dp_scales, rows_per_sample=rows_per_sample,
        )
    return out, (x, s, b, w1, b1, w2, b2, dp_scales)


def _dp_bwd(rows_per_sample, residuals, g):
    x, s, b, w1, b1, w2, b2, dp_scales = residuals
    d = _row_scales(dp_scales, x.shape[0], rows_per_sample)
    g32 = g.astype(jnp.float32)
    g_in = (d * g32).astype(x.dtype)
    dx_p, ds, db, dw1, db1_, dw2, db2_ = _bwd((x, s, b, w1, b1, w2, b2), g_in)
    dx = (dx_p.astype(jnp.float32) + (1.0 - d) * g32).astype(x.dtype)
    return (dx, ds, db, dw1, db1_, dw2, db2_, jnp.zeros_like(dp_scales))


mlp_block_dp_vjp.defvjp(_dp_fwd, _dp_bwd)
