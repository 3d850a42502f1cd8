"""Pallas kernels for OCAB's rectangular cross-attention core (training).

HAT's overlapping cross-attention (reference ``hat.py:198-293``) attends 256
query tokens to 576 overlapping key/value tokens per window. Under training,
the f32 score tensor is (B*nW, heads, 256, 576) — ~1.7 GB at the driver
training shape — so the module computed it as a checkpointed scan over window
chunks (models/hat.py OCAB). The session-10 ablation measured that path at
~0.257 s/step of HAT's 0.911 s fused train step (scripts/exp_hat_train_ablate.py):
each chunk still materializes its (32, 6, 256, 576) f32 scores in HBM, twice
(forward + backward recompute).

These kernels keep the scores in VMEM instead: one window per grid step
(small programs + deep grids — the measured-right shape on this backend),
heads riding the single legal dot batch dimension. The backward recomputes
the forward flash-style and emits dq/dk/dv per window plus the dbias
accumulated across the sequential grid in a resident VMEM block (block index
constant => Mosaic never re-DMAs it between steps).

Layout notes (Mosaic rules, CLAUDE.md):
  * head dim d (30 for HAT) is zero-padded to a 32-lane multiple on the
    operand side; zero columns contribute exactly nothing to scores/grads;
  * all dot free widths (256, 576, 32) are 8-aligned — no relayouts;
  * dots accumulate f32 (preferred_element_type) and cast back.

Gradient-validated against jax.grad of the XLA math in
``tests/ops/test_oca_vjp.py`` (interpret mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["oca_core_fwd", "oca_core_bwd", "oca_supported"]

# f32 VMEM the backward needs per program: scores, p, dp_mat, dscores, dbias.
_BWD_F32_BUFFERS = 5
_VMEM_BUDGET = 48 * 1024 * 1024


def oca_supported(heads: int, nq: int, nk: int) -> bool:
    """Static layout check: True when the kernels can run this geometry."""
    if nq % 8 or nk % 8:
        return False
    return _BWD_F32_BUFFERS * heads * nq * nk * 4 <= _VMEM_BUDGET


def _pad_d(t: jnp.ndarray, dpad: int) -> jnp.ndarray:
    d = t.shape[-1]
    if d == dpad:
        return t
    return jnp.pad(t, ((0, 0),) * (t.ndim - 1) + ((0, dpad - d),))


def _fwd_kernel(q_ref, k_ref, v_ref, bias_ref, out_ref):
    q = q_ref[0]  # (heads, nq, dp)
    k = k_ref[0]  # (heads, nk, dp)
    v = v_ref[0]
    dt = q.dtype
    scores = jax.lax.dot_general(
        q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ) + bias_ref[...].astype(jnp.float32)
    e = jnp.exp(jnp.minimum(scores, 80.0))
    p = e * (1.0 / jnp.sum(e, axis=-1, keepdims=True))
    out = jax.lax.dot_general(
        p.astype(dt), v, dimension_numbers=(((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    out_ref[0] = out.astype(out_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, bias_ref, g_ref, dq_ref, dk_ref, dv_ref, dbias_ref):
    from jax.experimental import pallas as pl

    i = pl.program_id(0)
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    g = g_ref[0]  # (heads, nq, dp)
    dt = q.dtype

    # forward recompute (scores never leave VMEM)
    scores = jax.lax.dot_general(
        q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ) + bias_ref[...].astype(jnp.float32)
    e = jnp.exp(jnp.minimum(scores, 80.0))
    p = e * (1.0 / jnp.sum(e, axis=-1, keepdims=True))  # (heads, nq, nk) f32

    dv = jax.lax.dot_general(
        p.astype(dt), g, dimension_numbers=(((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # (heads, nk, dp)
    dp_mat = jax.lax.dot_general(
        g, v, dimension_numbers=(((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # (heads, nq, nk)
    dscores = p * (dp_mat - jnp.sum(dp_mat * p, axis=-1, keepdims=True))
    dsc = dscores.astype(dt)
    dq = jax.lax.dot_general(
        dsc, k, dimension_numbers=(((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # (heads, nq, dp)
    dk = jax.lax.dot_general(
        dsc, q, dimension_numbers=(((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # (heads, nk, dp)

    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)

    @pl.when(i == 0)
    def _():
        dbias_ref[...] = jnp.zeros_like(dbias_ref)

    dbias_ref[...] += dscores


@functools.partial(jax.jit, static_argnames=("interpret",))
def oca_core_fwd(q, k, v, bias, interpret: bool = False):
    """softmax(q @ k^T + bias) @ v for rectangular windows.

    ``q``: (bw, heads, nq, d) pre-scaled; ``k``/``v``: (bw, heads, nk, d);
    ``bias``: (heads, nq, nk). Returns (bw, heads, nq, d) in q.dtype, or
    ``None`` when the layout is unsupported (caller falls back)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from studiosr_tpu.ops.pallas import engagement

    bw, heads, nq, d = q.shape
    nk = k.shape[2]
    if not oca_supported(heads, nq, nk):
        return engagement.fallback("oca_core_fwd", f"layout mismatch: nq={nq}, nk={nk}, heads={heads}")
    engagement.engaged("oca_core_fwd")

    dpad = ((d + 31) // 32) * 32
    qp, kp, vp = _pad_d(q, dpad), _pad_d(k, dpad), _pad_d(v, dpad)

    blk = lambda n: pl.BlockSpec((1, heads, n, dpad), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)
    full = pl.BlockSpec((heads, nq, nk), lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
    compiler_params = None
    if not interpret:
        compiler_params = pltpu.CompilerParams(
            dimension_semantics=("arbitrary",), vmem_limit_bytes=64 * 1024 * 1024
        )
    out = pl.pallas_call(
        _fwd_kernel,
        grid=(bw,),
        in_specs=[blk(nq), blk(nk), blk(nk), full],
        out_specs=blk(nq),
        out_shape=jax.ShapeDtypeStruct((bw, heads, nq, dpad), q.dtype),
        compiler_params=compiler_params,
        interpret=interpret,
    )(qp, kp, vp, bias.astype(jnp.float32))
    return out[..., :d]


@functools.partial(jax.jit, static_argnames=("interpret",))
def oca_core_bwd(q, k, v, bias, g, interpret: bool = False):
    """Backward of :func:`oca_core_fwd`: returns (dq, dk, dv, dbias) or
    ``None`` when the layout is unsupported (caller falls back to XLA)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from studiosr_tpu.ops.pallas import engagement

    bw, heads, nq, d = q.shape
    nk = k.shape[2]
    if not oca_supported(heads, nq, nk):
        return engagement.fallback("oca_core_bwd", f"layout mismatch: nq={nq}, nk={nk}, heads={heads}")
    engagement.engaged("oca_core_bwd")

    dpad = ((d + 31) // 32) * 32
    qp, kp, vp, gp = _pad_d(q, dpad), _pad_d(k, dpad), _pad_d(v, dpad), _pad_d(g, dpad)

    blk = lambda n: pl.BlockSpec((1, heads, n, dpad), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)
    full = pl.BlockSpec((heads, nq, nk), lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
    compiler_params = None
    if not interpret:
        compiler_params = pltpu.CompilerParams(
            dimension_semantics=("arbitrary",), vmem_limit_bytes=64 * 1024 * 1024
        )
    dq, dk, dv, dbias = pl.pallas_call(
        _bwd_kernel,
        grid=(bw,),
        in_specs=[blk(nq), blk(nk), blk(nk), full, blk(nq)],
        out_specs=(blk(nq), blk(nk), blk(nk), full),
        out_shape=(
            jax.ShapeDtypeStruct((bw, heads, nq, dpad), q.dtype),
            jax.ShapeDtypeStruct((bw, heads, nk, dpad), k.dtype),
            jax.ShapeDtypeStruct((bw, heads, nk, dpad), v.dtype),
            jax.ShapeDtypeStruct((heads, nq, nk), jnp.float32),
        ),
        compiler_params=compiler_params,
        interpret=interpret,
    )(qp, kp, vp, bias.astype(jnp.float32), gp)
    return dq[..., :d], dk[..., :d], dv[..., :d], dbias.astype(bias.dtype)
