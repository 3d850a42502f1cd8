"""Fused window-attention Pallas TPU kernel.

The replacement for the reference's unfused matmul chain
(``swinir.py:80-105``): for each block of windows, QK^T, relative-position
bias, shift mask, softmax, and AV all execute with the score matrix resident
in VMEM — the (B*heads, N, N) attention tensor never round-trips through HBM
(the XLA path materializes it between the two batched matmuls).

Layout: operands arrive as (B, heads, N, d) from the models and are consumed
in place — each grid program picks one head and a contiguous block of windows
via its BlockSpec index map (no staging transposes). The shift mask
(nW, N, N) is indexed directly by the window block — supported when the
window axis equals the batch axis (batch size 1, the SR inference case);
other configurations fall back to the XLA path.

Correctness is validated against the XLA attention core in
``tests/ops/test_pallas_attention.py`` (interpret mode on CPU, compiled on
TPU).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["window_attention_pallas"]


def _kernel(q_ref, k_ref, v_ref, bias_ref, mask_ref, out_ref):
    q = q_ref[:, 0].astype(jnp.float32)  # (BW, N, d)
    k = k_ref[:, 0].astype(jnp.float32)
    v = v_ref[:, 0]

    scores = jax.lax.dot_general(
        q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # (BW, N, N)
    scores = scores + bias_ref[0][None].astype(jnp.float32)
    if mask_ref is not None:
        scores = scores + mask_ref[...].astype(jnp.float32)

    # Max-subtract softmax kept deliberately: the softmax-skip +
    # normalize-after-AV variant (the swin_block kernel's win) pushed this
    # kernel's scoped VMEM to 16.04 MB (OOM) and, with vmem_limit_bytes=64MB,
    # measured SLOWER in context (MaxSR 109.3 vs 103.9 ms) — the bigger
    # scoped allocation loses more pipelining overlap than the skipped
    # reductions save at these (BW, 256, 256) score shapes.
    scores = scores - jnp.max(scores, axis=-1, keepdims=True)
    probs = jnp.exp(scores)
    probs = probs / jnp.sum(probs, axis=-1, keepdims=True)

    out = jax.lax.dot_general(
        probs.astype(v.dtype), v, dimension_numbers=(((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    out_ref[:, 0] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_windows", "interpret"))
def _window_attention_impl(q, k, v, bias, mask, block_windows: int, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, n, d = q.shape
    m = k.shape[2]

    # The head is picked by the grid's BlockSpec index maps straight from the
    # natural (B, h, N, d) layout — the previous (h, B, N, d) staging cost
    # four full XLA transpose passes per call (measured ~half the in-context
    # attention time on MaxSR's 8.4 MB operands).
    bw = block_windows
    pad_b = (-b) % bw
    if pad_b:
        q = jnp.pad(q, ((0, pad_b), (0, 0), (0, 0), (0, 0)))
        k = jnp.pad(k, ((0, pad_b), (0, 0), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, pad_b), (0, 0), (0, 0), (0, 0)))
        if mask is not None:
            mask = jnp.pad(mask, ((0, pad_b), (0, 0), (0, 0)))
    bp = b + pad_b

    grid = (h, bp // bw)
    in_specs = [
        pl.BlockSpec((bw, 1, n, d), lambda i, j: (j, i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((bw, 1, m, d), lambda i, j: (j, i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((bw, 1, m, d), lambda i, j: (j, i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n, m), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
    ]
    operands = [q, k, v, bias]
    if mask is not None:
        in_specs.append(pl.BlockSpec((bw, n, m), lambda i, j: (j, 0, 0), memory_space=pltpu.VMEM))
        operands.append(mask)
        kernel = _kernel
    else:

        def kernel(q_ref, k_ref, v_ref, bias_ref, out_ref):
            _kernel(q_ref, k_ref, v_ref, bias_ref, None, out_ref)

    flops = 2 * h * bp * n * m * d * 2
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bw, 1, n, d), lambda i, j: (j, i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, h, n, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=(q.size + k.size + v.size) * 4, transcendentals=h * bp * n * m
        ),
        interpret=interpret,
    )(*operands)

    return out[:b]


def window_attention_pallas(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    mask: Optional[jnp.ndarray] = None,
    block_windows: int = 16,
    interpret: Optional[bool] = None,
):
    """Fused attention over (B, heads, N, d); returns None for unsupported
    configs (caller falls back to XLA)."""
    from studiosr_tpu.ops.pallas import engagement

    b, h, n, d = q.shape
    m = k.shape[2]
    if bias is None:
        # Bias-free attention (MaxSR adaptive mode): a zero bias costs one
        # (h, N, M) constant and keeps the single kernel body.
        bias = jnp.zeros((h, n, m), jnp.float32)
    if mask is not None and mask.shape[0] != b:
        # window axis must equal batch axis (batch size 1)
        return engagement.fallback(
            "window_attention_pallas", f"mask windows {mask.shape[0]} != batch {b}"
        )
    if n > 1024 or m > 1024:
        return engagement.fallback("window_attention_pallas", f"N too large: {n}x{m}")
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    block_windows = min(block_windows, b)
    engagement.engaged("window_attention_pallas")
    return _window_attention_impl(q, k, v, bias, mask, block_windows, interpret)
