"""Windowed multi-head attention core.

The hot op of SwinIR/SwinFIR/HAT (reference ``swinir.py:80-105``,
``hat.py:85-111``): per-window QK^T + relative-position bias + shift mask +
softmax + AV. Two backends:

* ``xla`` (default): batched einsums — XLA fuses bias/mask/softmax into the
  matmul epilogue and batches all windows onto the MXU;
* ``pallas``: fused VMEM-resident kernel (ops/pallas/window_attn.py) that
  keeps scores on-chip for large window counts — enable via
  :func:`set_attention_backend` ("pallas") once validated per shape.

Inputs follow (windows, heads, tokens, head_dim) layout; ``bias`` is
(heads, N, M) and ``mask`` (nW, N, M) with the window axis folded into the
batch axis as ``B = batch * nW`` (row-major windows), matching the reference
semantics.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["attention_core", "set_attention_backend", "get_attention_backend"]

_BACKEND = "xla"


def set_attention_backend(name: str) -> None:
    global _BACKEND
    assert name in ("xla", "pallas")
    _BACKEND = name


def get_attention_backend() -> str:
    return _BACKEND


def attention_core(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """softmax(q @ k^T + bias + mask) @ v over (B, heads, N, d) operands.

    ``q`` must already carry the 1/sqrt(d) scale (reference applies it to q,
    ``swinir.py:84``).
    """
    if _BACKEND == "pallas":
        from studiosr_tpu.ops.pallas.window_attn import window_attention_pallas

        out = window_attention_pallas(q, k, v, bias=bias, mask=mask)
        if out is not None:
            return out
        # Unsupported shape -> fall through to XLA.

    attn = jnp.einsum("bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32)
    if bias is not None:
        attn = attn + bias[None].astype(attn.dtype)
    if mask is not None:
        nw = mask.shape[0]
        b = attn.shape[0] // nw
        attn = attn.reshape(b, nw, *attn.shape[1:]) + mask[None, :, None].astype(attn.dtype)
        attn = attn.reshape(-1, *attn.shape[2:])
    attn = jax.nn.softmax(attn, axis=-1)
    return jnp.einsum("bhnm,bhmd->bhnd", attn.astype(v.dtype), v)
