import numpy as np
import pytest

from studiosr_tpu.models.maxsr import MaxSR

from tests.reference_loader import reference_available

SMALL = dict(dim=32, dim_head=8, depth=[1, 1], window_size=8, dropout=0.0)


@pytest.mark.parametrize("scale", [2, 3, 4])
@pytest.mark.parametrize("adaptive", [False, True])
def test_shape_of_maxsr(scale, adaptive):
    model = MaxSR.build(scale=scale, adaptive=adaptive, **SMALL)
    y = model(np.zeros((1, 12, 12, 3), np.float32))
    assert y.shape == (1, 12 * scale, 12 * scale, 3)


@pytest.mark.parametrize("adaptive", [False, True])
def test_maxsr_fused_matches_plain(adaptive):
    """enable_fused routes all attention pairs through the Pallas kernel
    (interpret mode on CPU) with identical math — both modes, including the
    bias-free adaptive attention."""
    rng = np.random.default_rng(0)
    x = (rng.random((1, 16, 16, 3)) * 255).astype(np.float32)
    model = MaxSR.build(scale=2, adaptive=adaptive, **SMALL)
    want = model._forward(model.variables, x)
    model.enable_fused(True)
    got = model._forward(model.variables, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4, rtol=1e-4)


@pytest.mark.parametrize("adaptive", [False, True])
def test_maxsr_fused_serving_kernels_match_plain(adaptive):
    """The round-4 serving route (map-level fused attention + MLP kernels,
    the fused_train primals) with the kernels FORCED into interpret mode on
    CPU — pins the actual Pallas kernel math, not the XLA fallback the
    backend gate takes by default on CPU."""
    import studiosr_tpu.ops.attn_vjp as attn_vjp
    import studiosr_tpu.ops.pallas.mlp_vjp as mlp_vjp

    rng = np.random.default_rng(1)
    x = (rng.random((1, 16, 16, 3)) * 255).astype(np.float32)
    model = MaxSR.build(scale=2, adaptive=adaptive, **SMALL)
    want = model._forward(model.variables, x)
    model.enable_fused(True)
    attn_vjp.FORCE_FUSED = mlp_vjp.FORCE_FUSED = True
    try:
        import jax

        jax.clear_caches()  # the unforced trace of the same shapes is cached
        got = model._forward(model.variables, x)
    finally:
        attn_vjp.FORCE_FUSED = mlp_vjp.FORCE_FUSED = False
        jax.clear_caches()
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-4, rtol=1e-3)


@pytest.mark.skipif(not reference_available(), reason="reference repo not mounted")
def test_maxsr_static_parity():
    """Static mode (trained rel-pos embeddings) is bit-parity tested; the
    reference's adaptive mode uses an untrained random bias per forward
    (maxsr.py:258), so no deterministic target exists there."""
    import torch

    from tests.models.parity import assert_parity
    from tests.reference_loader import load_reference

    studiosr = load_reference()
    torch.manual_seed(0)
    ref = studiosr.models.maxsr.MaxSR(scale=2, adaptive=False, **SMALL)
    ours = MaxSR.build(scale=2, adaptive=False, **SMALL)
    assert_parity(ref, ours, hw=(16, 16), atol=5e-4)


def test_maxsr_dw_diag_dense_exact():
    """DW_IMPL="diag_dense" (depthwise conv as diagonal dense MXU conv) is
    the exact same math and parameter tree as the grouped-conv lowering."""
    import studiosr_tpu.models.maxsr as mx

    model = MaxSR.build(scale=2, **SMALL)
    x = np.random.default_rng(3).standard_normal((1, 16, 16, 3), dtype=np.float32)
    want = np.asarray(model(x))
    mx.DW_IMPL = "diag_dense"
    try:
        other = MaxSR.build(scale=2, **SMALL)
        other.variables = model.variables  # identical tree by construction
        got = np.asarray(other(x))
    finally:
        mx.DW_IMPL = "depthwise"
    # identical math; tolerance covers conv-lowering reassociation only
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)
