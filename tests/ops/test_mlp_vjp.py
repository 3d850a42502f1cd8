"""Custom-VJP fused MLP block: gradients vs jax.grad of the XLA reference."""

import numpy as np
import pytest


def _reference(x, s, b, w1, b1, w2, b2):
    import jax
    import jax.numpy as jnp

    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
    ln = (x32 - mu) * jax.lax.rsqrt(var + 1e-5) * s + b
    h1 = ln @ w1 + b1
    g1 = jax.nn.gelu(h1, approximate=False)
    return (x32 + g1 @ w2 + b2).astype(x.dtype)


def test_mlp_vjp_matches_autodiff():
    import jax
    import jax.numpy as jnp

    from studiosr_tpu.ops.pallas.mlp_vjp import mlp_block_vjp

    rng = np.random.default_rng(0)
    rows, c, hidden = 300, 16, 32
    x = jnp.asarray(rng.standard_normal((rows, c)), jnp.float32)
    s = jnp.asarray(rng.standard_normal(c), jnp.float32)
    b = jnp.asarray(rng.standard_normal(c), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((c, hidden)) * 0.2, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal(hidden) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((hidden, c)) * 0.2, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32)
    cot = jnp.asarray(rng.standard_normal((rows, c)), jnp.float32)

    args = (x, s, b, w1, b1, w2, b2)

    # Forward parity.
    np.testing.assert_allclose(
        np.asarray(mlp_block_vjp(*args)), np.asarray(_reference(*args)), atol=2e-5, rtol=1e-4
    )

    def loss_custom(*a):
        return jnp.sum(mlp_block_vjp(*a) * cot)

    def loss_ref(*a):
        return jnp.sum(_reference(*a) * cot)

    grads_custom = jax.grad(loss_custom, argnums=tuple(range(7)))(*args)
    grads_ref = jax.grad(loss_ref, argnums=tuple(range(7)))(*args)
    names = ["dx", "ds", "db", "dw1", "db1", "dw2", "db2"]
    for name, gc, gr in zip(names, grads_custom, grads_ref):
        np.testing.assert_allclose(np.asarray(gc), np.asarray(gr), atol=5e-4, rtol=1e-3, err_msg=name)


def test_mlp_vjp_accumulated_partials():
    """rows > 8 * block_rows forces the chunked accumulator path (multiple
    grid programs revisit each weight-grad partial block consecutively) —
    the small-shape test above never leaves the one-visit-per-block path."""
    import jax
    import jax.numpy as jnp

    from studiosr_tpu.ops.pallas.mlp_vjp import mlp_block_vjp

    rng = np.random.default_rng(1)
    rows, c, hidden = 512 * 9 + 37, 16, 32  # 10 blocks -> chunk 2, 5 partials
    x = jnp.asarray(rng.standard_normal((rows, c)) * 0.5, jnp.float32)
    s = jnp.asarray(rng.standard_normal(c), jnp.float32)
    b = jnp.asarray(rng.standard_normal(c), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((c, hidden)) * 0.2, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal(hidden) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((hidden, c)) * 0.2, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32)
    cot = jnp.asarray(rng.standard_normal((rows, c)), jnp.float32)
    args = (x, s, b, w1, b1, w2, b2)

    grads_custom = jax.grad(lambda *a: jnp.sum(mlp_block_vjp(*a) * cot), argnums=tuple(range(7)))(*args)
    grads_ref = jax.grad(lambda *a: jnp.sum(_reference(*a) * cot), argnums=tuple(range(7)))(*args)
    names = ["dx", "ds", "db", "dw1", "db1", "dw2", "db2"]
    for name, gc, gr in zip(names, grads_custom, grads_ref):
        np.testing.assert_allclose(np.asarray(gc), np.asarray(gr), atol=2e-3, rtol=2e-3, err_msg=name)
