"""Pallas fused window attention vs the XLA reference core (interpret mode on
CPU; the same kernel compiles on TPU)."""

import numpy as np
import pytest

from studiosr_tpu.ops.attention import attention_core
from studiosr_tpu.ops.pallas.window_attn import window_attention_pallas


def _rand(shape, seed):
    return np.random.default_rng(seed).standard_normal(shape, dtype=np.float32)


@pytest.mark.parametrize("bw", [1, 4])
def test_pallas_matches_xla_no_mask(bw):
    b, h, n, d = 12, 2, 64, 16
    q, k, v = _rand((b, h, n, d), 0) * 0.2, _rand((b, h, n, d), 1), _rand((b, h, n, d), 2)
    bias = _rand((h, n, n), 3)
    want = np.asarray(attention_core(q, k, v, bias=bias))
    got = np.asarray(window_attention_pallas(q, k, v, bias=bias, block_windows=bw, interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_pallas_matches_xla_with_mask():
    b, h, n, d = 8, 2, 64, 16
    q, k, v = _rand((b, h, n, d), 0) * 0.2, _rand((b, h, n, d), 1), _rand((b, h, n, d), 2)
    bias = _rand((h, n, n), 3)
    mask = np.where(_rand((b, n, n), 4) > 0.5, -100.0, 0.0).astype(np.float32)
    want = np.asarray(attention_core(q, k, v, bias=bias, mask=mask))
    got = np.asarray(window_attention_pallas(q, k, v, bias=bias, mask=mask, interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_pallas_cross_attention_shapes():
    """OCAB-style: kv windows larger than q windows."""
    b, h, n, m, d = 4, 2, 64, 144, 16
    q = _rand((b, h, n, d), 0) * 0.2
    k, v = _rand((b, h, m, d), 1), _rand((b, h, m, d), 2)
    bias = _rand((h, n, m), 3)
    want = np.asarray(attention_core(q, k, v, bias=bias))
    got = np.asarray(window_attention_pallas(q, k, v, bias=bias, interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_pallas_no_bias_matches_xla():
    """bias=None (MaxSR adaptive mode) runs with a synthesized zero bias."""
    b, h, n, d = 8, 2, 64, 16
    q, k, v = _rand((b, h, n, d), 0) * 0.2, _rand((b, h, n, d), 1), _rand((b, h, n, d), 2)
    want = np.asarray(attention_core(q, k, v))
    got = np.asarray(window_attention_pallas(q, k, v, interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_pallas_rejects_unsupported():
    b, h, n, d = 8, 2, 16, 8
    q = _rand((b, h, n, d), 0)
    bias = _rand((h, n, n), 1)
    bad_mask = _rand((3, n, n), 2)  # window axis != batch axis
    assert window_attention_pallas(q, q, q, bias=bias, mask=bad_mask) is None


def test_backend_switch_end_to_end():
    """SwinIR forward with the pallas backend (interpret on CPU) matches XLA."""
    from studiosr_tpu.models.swinir import SwinIR
    from studiosr_tpu.ops.attention import set_attention_backend

    model = SwinIR.build(scale=2, embed_dim=16, depths=[2], num_heads=[2], window_size=8)
    x = _rand((1, 16, 16, 3), 0)
    want = np.asarray(model(x))
    set_attention_backend("pallas")
    try:
        import jax

        got = np.asarray(jax.jit(lambda v, i: model.module.apply(v, i, train=False))(model.variables, x))
    finally:
        set_attention_backend("xla")
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-4)
