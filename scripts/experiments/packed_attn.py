"""Packed window attention: MXU-aligned block-diagonal pairing (kernel v3).

Window attention shapes are intrinsically MXU-hostile (64 tokens, head dim
30 vs the 128x128 systolic array). This kernel restores alignment by packing
TWO (window, head) units into each matmul as a block-diagonal problem:

  Q2 = [Q_a; Q_b] (128, dp)   K2 = [K_a; K_b]   ->  S = Q2 @ K2^T (128, 128)

The off-diagonal 64x64 quadrants are cross-unit garbage, killed by a -30000
additive before softmax, so the AV product yields exactly the two units'
outputs stacked. Pairing is (window w, head 2i) with (w, head 2i+1), i.e.
adjacent units in the (nW*heads, 64, dp) layout — so the packing reshape
(U, 64, dp) -> (U/2, 128, dp) is free (same bytes).

Head dim is padded to dp=32 on the weight side by the caller (zero lanes
contribute nothing to QK^T and produce zero output lanes, sliced off after).

The kernel does only scores+bias+mask+softmax+AV with everything VMEM
resident; LN/qkv/proj stay in XLA where they are already MXU-efficient.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["packed_window_attention", "pack_head_weights"]


def pack_head_weights(kernel: jnp.ndarray, bias: jnp.ndarray, heads: int, dp: int = 32, scale: float = 1.0):
    """(C, heads*d) dense weights -> (C, heads*dp) zero-padded per head,
    optionally pre-scaled (fold 1/sqrt(d) into the q weights)."""
    c, hd = kernel.shape
    d = hd // heads
    k = kernel.reshape(c, heads, d) * scale
    b = bias.reshape(heads, d) * scale
    k = jnp.pad(k, ((0, 0), (0, 0), (0, dp - d)))
    b = jnp.pad(b, ((0, 0), (0, dp - d)))
    return k.reshape(c, heads * dp), b.reshape(heads * dp)


def _kernel(q_ref, k_ref, v_ref, bias_ref, mask_ref, out_ref, *, heads: int):
    # q/k/v: (P, 128, dp); bias: (heads//2, 128, 128); mask: (Wn, 64, 64)|None
    p = q_ref.shape[0]
    hp = heads // 2
    wn = p // hp

    q = q_ref[...]
    k = k_ref[...]
    v = v_ref[...]

    scores = jax.lax.dot_general(
        q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # (P, 128, 128)
    scores = scores.reshape(wn, hp, 128, 128) + bias_ref[...][None].astype(jnp.float32)
    if mask_ref is not None:
        m = mask_ref[...].astype(jnp.float32)  # (Wn, 64, 64)
        mdiag = jnp.pad(m, ((0, 0), (0, 64), (0, 64))) + jnp.pad(m, ((0, 0), (64, 0), (64, 0)))
        scores = scores + mdiag[:, None]
    scores = scores.reshape(p, 128, 128)

    scores = scores - jnp.max(scores, axis=-1, keepdims=True)
    probs = jnp.exp(scores)
    probs = probs / jnp.sum(probs, axis=-1, keepdims=True)

    out = jax.lax.dot_general(
        probs.astype(v.dtype), v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    out_ref[...] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("heads", "windows_per_block", "interpret"))
def packed_window_attention(
    q: jnp.ndarray,  # (U, 64, dp), U = nW * heads, q pre-scaled
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias_pack: jnp.ndarray,  # (heads//2, 128, 128): block-diag bias + off-diag -30000
    mask: Optional[jnp.ndarray],  # (nW, 64, 64) or None
    heads: int,
    windows_per_block: int = 11,
    interpret: bool = False,
) -> jnp.ndarray:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    u, n, dp = q.shape
    assert heads % 2 == 0 and n == 64
    hp = heads // 2
    n_windows = u // heads

    wn = windows_per_block
    while n_windows % wn:
        wn -= 1
    p = wn * hp  # pairs per program

    q2 = q.reshape(u // 2, 128, dp)
    k2 = k.reshape(u // 2, 128, dp)
    v2 = v.reshape(u // 2, 128, dp)

    grid = (n_windows // wn,)
    in_specs = [
        pl.BlockSpec((p, 128, dp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((p, 128, dp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((p, 128, dp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((hp, 128, 128), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
    ]
    operands = [q2, k2, v2, bias_pack]
    if mask is not None:
        in_specs.append(pl.BlockSpec((wn, 64, 64), lambda i: (i, 0, 0), memory_space=pltpu.VMEM))
        operands.append(mask)
        kernel = functools.partial(_kernel, heads=heads)
    else:
        def kernel(q_ref, k_ref, v_ref, bias_ref, out_ref):
            _kernel(q_ref, k_ref, v_ref, bias_ref, None, out_ref, heads=heads)

    compiler_params = None
    if not interpret:
        compiler_params = pltpu.CompilerParams(dimension_semantics=("parallel",))

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((p, 128, dp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(q2.shape, q.dtype),
        compiler_params=compiler_params,
        interpret=interpret,
    )(*operands)
    return out.reshape(u, n, dp)


def make_bias_pack(bias: jnp.ndarray, neg: float = -30000.0) -> jnp.ndarray:
    """(heads, 64, 64) rel-pos bias -> (heads//2, 128, 128) block-diag pack."""
    heads = bias.shape[0]
    hp = heads // 2
    b = bias.reshape(hp, 2, 64, 64).astype(jnp.float32)
    top = jnp.concatenate([b[:, 0], jnp.full((hp, 64, 64), neg, jnp.float32)], axis=-1)
    bot = jnp.concatenate([jnp.full((hp, 64, 64), neg, jnp.float32), b[:, 1]], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)  # (hp, 128, 128)
