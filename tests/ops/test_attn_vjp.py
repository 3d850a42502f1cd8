"""Custom-VJP window-attention block: gradients vs jax.grad of a reference."""

import numpy as np
import pytest


def _reference(x, s, b, wqkv, bqkv, wproj, bproj, bias, mask, heads):
    import jax
    import jax.numpy as jnp

    nw, n, c = x.shape
    d = c // heads
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, -1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), -1, keepdims=True)
    ln = (x32 - mu) * jax.lax.rsqrt(var + 1e-5) * s + b
    qkv = ln @ wqkv + bqkv
    q = qkv[..., :c].reshape(nw, n, heads, d).transpose(0, 2, 1, 3) * (d**-0.5)
    k = qkv[..., c : 2 * c].reshape(nw, n, heads, d).transpose(0, 2, 1, 3)
    v = qkv[..., 2 * c :].reshape(nw, n, heads, d).transpose(0, 2, 1, 3)
    scores = jnp.einsum("whnd,whmd->whnm", q, k) + bias[None]
    if mask is not None:
        scores = scores + mask[:, None]
    probs = jax.nn.softmax(scores, axis=-1)
    av = jnp.einsum("whnm,whmd->whnd", probs, v).transpose(0, 2, 1, 3).reshape(nw, n, c)
    return x32 + av @ wproj + bproj


@pytest.mark.parametrize("with_mask", [False, True])
def test_attn_vjp_matches_autodiff(with_mask):
    import jax
    import jax.numpy as jnp

    from studiosr_tpu.ops.attn_vjp import attention_block_vjp

    rng = np.random.default_rng(0)
    nw, n, c, heads = 6, 16, 24, 2
    x = jnp.asarray(rng.standard_normal((nw, n, c)), jnp.float32)
    s = jnp.asarray(rng.standard_normal(c), jnp.float32)
    b = jnp.asarray(rng.standard_normal(c), jnp.float32)
    wqkv = jnp.asarray(rng.standard_normal((c, 3 * c)) * 0.2, jnp.float32)
    bqkv = jnp.asarray(rng.standard_normal(3 * c) * 0.1, jnp.float32)
    wproj = jnp.asarray(rng.standard_normal((c, c)) * 0.2, jnp.float32)
    bproj = jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32)
    bias = jnp.asarray(rng.standard_normal((heads, n, n)) * 0.5, jnp.float32)
    mask = jnp.asarray(np.where(rng.random((nw, n, n)) > 0.7, -100.0, 0.0), jnp.float32) if with_mask else None
    cot = jnp.asarray(rng.standard_normal((nw, n, c)), jnp.float32)

    args = (x, s, b, wqkv, bqkv, wproj, bproj, bias)

    out_custom = attention_block_vjp(*args, mask, heads)
    out_ref = _reference(*args, mask, heads)
    np.testing.assert_allclose(np.asarray(out_custom), np.asarray(out_ref), atol=2e-5, rtol=1e-4)

    def loss_custom(*a):
        return jnp.sum(attention_block_vjp(*a, mask, heads) * cot)

    def loss_ref(*a):
        return jnp.sum(_reference(*a, mask, heads) * cot)

    grads_custom = jax.grad(loss_custom, argnums=tuple(range(8)))(*args)
    grads_ref = jax.grad(loss_ref, argnums=tuple(range(8)))(*args)
    names = ["dx", "ds", "db", "dwqkv", "dbqkv", "dwproj", "dbproj", "dbias"]
    for name, gc, gr in zip(names, grads_custom, grads_ref):
        np.testing.assert_allclose(np.asarray(gc), np.asarray(gr), atol=5e-4, rtol=1e-3, err_msg=name)
