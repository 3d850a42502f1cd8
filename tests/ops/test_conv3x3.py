"""Streaming conv3x3 / ResBlock kernels vs XLA convolutions."""

import numpy as np
import pytest


def _xla_conv(t, k, b):
    import jax

    return (
        jax.lax.conv_general_dilated(
            t, k, (1, 1), [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        + b
    )


@pytest.mark.parametrize("activation,residual", [(None, False), ("relu", False), ("lrelu", True)])
def test_fused_conv3x3_matches_xla(activation, residual):
    import jax
    import jax.numpy as jnp

    from studiosr_tpu.ops.pallas.conv3x3 import fused_conv3x3

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 24, 20, 16)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 16, 16)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal(16) * 0.1, jnp.float32)

    want = _xla_conv(x, w, b)
    if activation == "relu":
        want = jnp.maximum(want, 0)
    elif activation == "lrelu":
        want = jax.nn.leaky_relu(want, 0.01)
    if residual:
        want = want + x
    got = fused_conv3x3(x, w, b, activation=activation, residual=residual, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4)


def test_fused_conv3x3_extra_join_matches_xla():
    """extra= folds the surrounding `conv(x) + skip` join into the kernel."""
    import jax.numpy as jnp

    from studiosr_tpu.ops.pallas.conv3x3 import fused_conv3x3

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 24, 20, 16)), jnp.float32)
    skip = jnp.asarray(rng.standard_normal((2, 24, 20, 16)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 16, 16)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal(16) * 0.1, jnp.float32)

    want = _xla_conv(x, w, b) + skip
    got = fused_conv3x3(x, w, b, extra=skip, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4)


def test_fused_resblock_matches_xla():
    import jax.numpy as jnp

    from studiosr_tpu.ops.pallas.conv3x3 import fused_resblock

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 32, 24, 16)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((3, 3, 16, 16)) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal(16) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((3, 3, 16, 16)) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal(16) * 0.1, jnp.float32)

    h1 = jnp.maximum(_xla_conv(x, w1, b1), 0)
    want = x + 0.5 * _xla_conv(h1, w2, b2)
    got = fused_resblock(x, w1, b1, w2, b2, res_scale=0.5, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4)


def test_fused_resblock_odd_height_falls_back_correctly():
    """Odd heights break the halo-2 band layout (t//halo == 0 degenerates
    the neighbor index maps): the wrapper must fall back to XLA instead of
    silently corrupting band borders (measured max err ~2.2 pre-fix)."""
    import jax.numpy as jnp

    from studiosr_tpu.ops.pallas import engagement
    from studiosr_tpu.ops.pallas.conv3x3 import fused_resblock

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, 17, 24, 16)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((3, 3, 16, 16)) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal(16) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((3, 3, 16, 16)) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal(16) * 0.1, jnp.float32)
    want = x + 0.5 * _xla_conv(jnp.maximum(_xla_conv(x, w1, b1), 0), w2, b2)

    engagement.reset()
    got = fused_resblock(x, w1, b1, w2, b2, res_scale=0.5, interpret=True)
    rec = engagement.counters().get("fused_resblock", {})
    assert rec.get("fallback", 0) >= 1, rec
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4)


def test_fused_cab_body_odd_height_falls_back_correctly():
    import jax
    import jax.numpy as jnp

    from studiosr_tpu.ops.pallas import engagement
    from studiosr_tpu.ops.pallas.conv3x3 import fused_cab_body
    from studiosr_tpu.ops.pallas.swin_block import _layernorm

    rng = np.random.default_rng(4)
    c, cm = 16, 8
    x = jnp.asarray(rng.standard_normal((1, 13, 24, c)), jnp.float32)
    s = jnp.asarray(rng.standard_normal(c) * 0.1 + 1.0, jnp.float32)
    b = jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((3, 3, c, cm)) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal(cm) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((3, 3, cm, c)) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32)

    ln = _layernorm(x, s, b)
    h1 = _xla_conv(ln, w1, b1)
    h1 = 0.5 * h1 * (1.0 + jax.lax.erf(h1 / np.sqrt(2.0)))
    want_y2 = 0.5 * _xla_conv(h1, w2, b2)
    want_sum = jnp.sum(want_y2, axis=(1, 2))

    engagement.reset()
    y2, csum = fused_cab_body(x, s, b, w1, b1, w2, b2, res_scale=0.5, interpret=True)
    rec = engagement.counters().get("fused_cab_body", {})
    assert rec.get("fallback", 0) >= 1, rec
    np.testing.assert_allclose(np.asarray(y2), np.asarray(want_y2), atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(csum), np.asarray(want_sum), atol=2e-3, rtol=1e-3)


def test_fused_resblock_lrelu_and_prepped_matches_xla():
    """Round-4 SFB options: activation="lrelu0.2" + prepped weights (the
    prepare_serving layout) — the one-pass S-branch configuration."""
    import jax.numpy as jnp

    from studiosr_tpu.ops.pallas.conv3x3 import fused_resblock, prepare_conv3x3_weights

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((1, 32, 24, 16)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((3, 3, 16, 16)) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal(16) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((3, 3, 16, 16)) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal(16) * 0.1, jnp.float32)

    h1 = _xla_conv(x, w1, b1)
    h1 = jnp.where(h1 >= 0, h1, 0.2 * h1)
    want = x + _xla_conv(h1, w2, b2)

    got = fused_resblock(x, w1, b1, w2, b2, activation="lrelu0.2", interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4)

    w1p = prepare_conv3x3_weights(w1, x.dtype)
    w2p = prepare_conv3x3_weights(w2, x.dtype)
    got_p = fused_resblock(x, w1p, b1, w2p, b2, activation="lrelu0.2", prepped=True, interpret=True)
    np.testing.assert_allclose(np.asarray(got_p), np.asarray(want), atol=2e-5, rtol=1e-4)

    # Odd height + prepped: the fallback must handle the stacked layout too.
    x_odd = x[:, :31]
    from studiosr_tpu.ops.pallas import engagement

    engagement.reset()
    h1o = _xla_conv(x_odd, w1, b1)
    h1o = jnp.where(h1o >= 0, h1o, 0.2 * h1o)
    want_odd = x_odd + _xla_conv(h1o, w2, b2)
    got_odd = fused_resblock(x_odd, w1p, b1, w2p, b2, activation="lrelu0.2", prepped=True, interpret=True)
    assert engagement.counters().get("fused_resblock", {}).get("fallback", 0) >= 1
    np.testing.assert_allclose(np.asarray(got_odd), np.asarray(want_odd), atol=2e-5, rtol=1e-4)
