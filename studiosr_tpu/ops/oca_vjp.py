"""Custom VJP for OCAB's rectangular cross-attention core (training path).

Routes HAT's overlapping cross-attention (reference ``hat.py:198-293``)
through the Pallas kernels in :mod:`studiosr_tpu.ops.pallas.oca_core` so the
(bw, heads, 256, 576) f32 score tensor never materializes in HBM in either
direction. When the kernels decline the layout, both directions fall back to
a window-chunked XLA scan (the same memory-bounded shape the OCAB module
used before this VJP existed).

``q`` must already carry the 1/sqrt(d) scale, matching
:func:`studiosr_tpu.ops.attention.attention_core`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from studiosr_tpu.ops.pallas.oca_core import oca_core_bwd, oca_core_fwd, oca_supported

__all__ = ["oca_attention", "oca_supported"]

_CHUNK = 32  # windows per XLA-fallback scan step (bounds the f32 score chunk)


def _core_math(q, k, v, bias):
    attn = jnp.einsum("bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(attn + bias[None].astype(attn.dtype), axis=-1)
    return jnp.einsum("bhnm,bhmd->bhnd", attn.astype(v.dtype), v)


def _core_math_chunked(q, k, v, bias):
    bw = q.shape[0]
    ck = max((m for m in range(1, _CHUNK + 1) if bw % m == 0))
    if ck == bw:
        return _core_math(q, k, v, bias)
    core = jax.checkpoint(lambda qc, kc, vc: _core_math(qc, kc, vc, bias))

    def body(_, args):
        return None, core(*args)

    shape = (bw // ck, ck) + q.shape[1:-2]
    _, out = jax.lax.scan(
        body, None,
        (q.reshape(*shape, *q.shape[-2:]), k.reshape(*shape, *k.shape[-2:]), v.reshape(*shape, *v.shape[-2:])),
    )
    return out.reshape(q.shape)


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


@jax.custom_vjp
def oca_attention(q, k, v, bias):
    """softmax(q @ k^T + bias) @ v over (bw, heads, nq|nk, d) operands."""
    out = oca_core_fwd(q, k, v, bias, interpret=_interpret())
    if out is None:
        out = _core_math_chunked(q, k, v, bias)
    return out


def _vjp_fwd(q, k, v, bias):
    return oca_attention(q, k, v, bias), (q, k, v, bias)


def _vjp_bwd(res, g):
    q, k, v, bias = res
    grads = oca_core_bwd(q, k, v, bias, g, interpret=_interpret())
    if grads is None:
        _, pull = jax.vjp(_core_math_chunked, q, k, v, bias)
        grads = pull(g.astype(v.dtype))
    return grads


oca_attention.defvjp(_vjp_fwd, _vjp_bwd)
