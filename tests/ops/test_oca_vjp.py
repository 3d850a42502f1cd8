"""OCA rectangular attention core: Pallas fwd/bwd vs jax.grad of the XLA math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from studiosr_tpu.ops.oca_vjp import _core_math, oca_attention
from studiosr_tpu.ops.pallas.oca_core import oca_core_bwd, oca_core_fwd, oca_supported


def _operands(bw=6, heads=2, nq=64, nk=144, d=30, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((bw, heads, nq, d)) * 0.2, dtype)
    k = jnp.asarray(rng.standard_normal((bw, heads, nk, d)) * 0.2, dtype)
    v = jnp.asarray(rng.standard_normal((bw, heads, nk, d)) * 0.5, dtype)
    bias = jnp.asarray(rng.standard_normal((heads, nq, nk)) * 0.05, jnp.float32)
    g = jnp.asarray(rng.standard_normal((bw, heads, nq, d)), dtype)
    return q, k, v, bias, g


def test_oca_core_fwd_matches_math():
    q, k, v, bias, _ = _operands()
    got = oca_core_fwd(q, k, v, bias, interpret=True)
    assert got is not None
    want = _core_math(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4)


def test_oca_core_bwd_matches_autodiff():
    q, k, v, bias, g = _operands(seed=1)

    def f(q, k, v, bias):
        return jnp.sum(_core_math(q, k, v, bias) * g)

    want = jax.grad(f, argnums=(0, 1, 2, 3))(q, k, v, bias)
    got = oca_core_bwd(q, k, v, bias, g, interpret=True)
    assert got is not None
    for name, a, e in zip(["dq", "dk", "dv", "dbias"], got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e), atol=3e-4, rtol=2e-3, err_msg=name)


def test_oca_attention_custom_vjp_end_to_end():
    """The public wrapper: value + grads through jax.grad, kernel path."""
    q, k, v, bias, g = _operands(seed=2)

    def f_ref(q, k, v, bias):
        return jnp.sum(_core_math(q, k, v, bias) * g)

    def f_vjp(q, k, v, bias):
        return jnp.sum(oca_attention(q, k, v, bias) * g)

    want = jax.grad(f_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
    got = jax.grad(f_vjp, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for name, a, e in zip(["dq", "dk", "dv", "dbias"], got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e), atol=3e-4, rtol=2e-3, err_msg=name)


def test_oca_attention_fallback_path_grads():
    """Unsupported layout (nk not 8-aligned) takes the chunked-scan fallback;
    grads must still match the plain math."""
    q, k, v, bias, g = _operands(bw=4, nq=16, nk=36, d=8, seed=3)
    assert not oca_supported(2, 16, 36)

    def f_ref(q, k, v, bias):
        return jnp.sum(_core_math(q, k, v, bias) * g)

    def f_vjp(q, k, v, bias):
        return jnp.sum(oca_attention(q, k, v, bias) * g)

    want = jax.grad(f_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
    got = jax.grad(f_vjp, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for name, a, e in zip(["dq", "dk", "dv", "dbias"], got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e), atol=3e-4, rtol=2e-3, err_msg=name)


def test_oca_kernels_engage_at_hat_training_geometry():
    """ws=16, overlap 0.5 (nq=256, nk=576, heads=6, d=30) — the driver
    training geometry — must take the kernel path at trace time."""
    from studiosr_tpu.ops.pallas import engagement

    q, k, v, bias, g = _operands(bw=2, heads=6, nq=256, nk=576, d=30, seed=4)
    engagement.reset()
    jax.clear_caches()

    def f(q, k, v, bias):
        return jnp.sum(oca_attention(q, k, v, bias) * g)

    jax.eval_shape(jax.grad(f, argnums=(0, 1, 2, 3)), q, k, v, bias)
    counts = engagement.counters()
    assert counts.get("oca_core_fwd", {}).get("engaged", 0) >= 1, counts
    assert counts.get("oca_core_bwd", {}).get("engaged", 0) >= 1, counts
