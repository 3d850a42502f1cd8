"""Pallas window-pair attention backward vs jax.grad of the XLA math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from studiosr_tpu.ops.attn_vjp import _map_forward_xla
from studiosr_tpu.ops.pallas.attn_bwd import pairs_attention_bwd
from studiosr_tpu.ops.windows import calculate_mask


@pytest.mark.parametrize("use_mask,use_dp", [(False, False), (True, True)])
def test_pairs_attention_bwd_matches_autodiff(use_mask, use_dp):
    rng = np.random.default_rng(0)
    b, h, w, c = 2, 16, 16, 12
    heads, ws = 2, 8
    x = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    s = jnp.asarray(rng.standard_normal(c) * 0.1 + 1, jnp.float32)
    bb = jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32)
    wqkv = jnp.asarray(rng.standard_normal((c, 3 * c)) * 0.1, jnp.float32)
    bqkv = jnp.asarray(rng.standard_normal(3 * c) * 0.1, jnp.float32)
    wproj = jnp.asarray(rng.standard_normal((c, c)) * 0.1, jnp.float32)
    bproj = jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32)
    bias = jnp.asarray(rng.standard_normal((heads, ws * ws, ws * ws)) * 0.05, jnp.float32)
    mask = jnp.asarray(calculate_mask((h, w), ws, ws // 2)) if use_mask else None
    dp = jnp.asarray([0.8, 1.25], jnp.float32) if use_dp else None

    def f(x, s, bb, wqkv, bqkv, wproj, bproj, bias):
        full = _map_forward_xla(x, s, bb, wqkv, bqkv, wproj, bproj, bias, mask, 0, heads, ws)
        if dp is not None:
            d = dp.reshape(-1, 1, 1, 1)
            full = x + d * (full - x)
        return jnp.sum(full * g)

    want = jax.grad(f, argnums=(0, 1, 2, 3, 4, 5, 6, 7))(x, s, bb, wqkv, bqkv, wproj, bproj, bias)

    got = pairs_attention_bwd(
        x, g, s, bb, wqkv, bqkv, wproj, bproj, bias, mask, dp,
        heads=heads, window_size=ws, interpret=True,
    )
    assert got is not None
    names = ["dx", "ds", "db", "dwqkv", "dbqkv", "dwproj", "dbproj", "dbias"]
    for name, a, e in zip(names, got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e), atol=3e-4, rtol=2e-3, err_msg=name)


@pytest.mark.parametrize("use_mask,use_dp", [(False, False), (True, True)])
def test_v5_attention_bwd_matches_autodiff(use_mask, use_dp):
    """Non-pair backward at a ws=16-like layout (HAT): windows ride the dot
    batch individually."""
    from studiosr_tpu.ops.pallas.attn_bwd import v5_attention_bwd

    rng = np.random.default_rng(1)
    b, h, w, c = 2, 32, 32, 12
    heads, ws = 2, 16
    x = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    s = jnp.asarray(rng.standard_normal(c) * 0.1 + 1, jnp.float32)
    bb = jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32)
    wqkv = jnp.asarray(rng.standard_normal((c, 3 * c)) * 0.1, jnp.float32)
    bqkv = jnp.asarray(rng.standard_normal(3 * c) * 0.1, jnp.float32)
    wproj = jnp.asarray(rng.standard_normal((c, c)) * 0.1, jnp.float32)
    bproj = jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32)
    bias = jnp.asarray(rng.standard_normal((heads, ws * ws, ws * ws)) * 0.05, jnp.float32)
    mask = jnp.asarray(calculate_mask((h, w), ws, ws // 2)) if use_mask else None
    dp = jnp.asarray([0.8, 1.25], jnp.float32) if use_dp else None

    def f(x, s, bb, wqkv, bqkv, wproj, bproj, bias):
        full = _map_forward_xla(x, s, bb, wqkv, bqkv, wproj, bproj, bias, mask, 0, heads, ws)
        if dp is not None:
            d = dp.reshape(-1, 1, 1, 1)
            full = x + d * (full - x)
        return jnp.sum(full * g)

    want = jax.grad(f, argnums=(0, 1, 2, 3, 4, 5, 6, 7))(x, s, bb, wqkv, bqkv, wproj, bproj, bias)

    got = v5_attention_bwd(
        x, g, s, bb, wqkv, bqkv, wproj, bproj, bias, mask, dp,
        heads=heads, window_size=ws, interpret=True,
    )
    assert got is not None
    names = ["dx", "ds", "db", "dwqkv", "dbqkv", "dwproj", "dbproj", "dbias"]
    for name, a, e in zip(names, got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e), atol=3e-4, rtol=2e-3, err_msg=name)
