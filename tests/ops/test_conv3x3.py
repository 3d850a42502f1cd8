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
