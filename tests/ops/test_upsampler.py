"""Fused x4 upsampler tail kernel vs the XLA conv+pixel_shuffle chain."""

import numpy as np


def test_fused_upsample_x4_matches_xla():
    import jax
    import jax.numpy as jnp

    from studiosr_tpu.ops.pallas.upsampler import fused_upsample_x4
    from studiosr_tpu.ops.pixel_shuffle import pixel_shuffle

    rng = np.random.default_rng(0)
    h = w = 16
    cin, n_colors = 8, 3
    x = jnp.asarray(rng.standard_normal((1, h, w, cin)), jnp.float32)
    w0 = jnp.asarray(rng.standard_normal((3, 3, cin, 4 * cin)) * 0.1, jnp.float32)
    b0 = jnp.asarray(rng.standard_normal(4 * cin) * 0.1, jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((3, 3, cin, 4 * cin)) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal(4 * cin) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((3, 3, cin, n_colors)) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal(n_colors) * 0.1, jnp.float32)

    def conv(t, k, b):
        return (
            jax.lax.conv_general_dilated(
                t, k, (1, 1), [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC")
            )
            + b
        )

    want = conv(x, w0, b0)
    want = pixel_shuffle(want, 2)
    want = conv(want, w1, b1)
    want = pixel_shuffle(want, 2)
    want = np.asarray(conv(want, w2, b2))

    got = fused_upsample_x4(x, w0, b0, w1, b1, w2, b2, interpret=True)
    assert got is not None
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=1e-4)


def test_fused_upsample_x4_rejects_bad_shapes():
    import jax.numpy as jnp

    from studiosr_tpu.ops.pallas.upsampler import fused_upsample_x4

    x = jnp.zeros((1, 7, 7, 8), jnp.float32)  # no valid tile
    w = jnp.zeros((3, 3, 8, 32), jnp.float32)
    w2 = jnp.zeros((3, 3, 8, 3), jnp.float32)
    assert fused_upsample_x4(x, w, jnp.zeros(32), w, jnp.zeros(32), w2, jnp.zeros(3)) is None
    # non-4x channel ladder also declines (batch > 1 is now mapped per-image)
    x = jnp.zeros((1, 16, 16, 8), jnp.float32)
    wb = jnp.zeros((3, 3, 8, 24), jnp.float32)
    assert fused_upsample_x4(x, wb, jnp.zeros(24), wb, jnp.zeros(24), w2, jnp.zeros(3)) is None


def test_fused_upsample_s_matches_xla():
    import jax
    import jax.numpy as jnp
    import pytest

    from studiosr_tpu.ops.pallas.upsampler import fused_upsample_s
    from studiosr_tpu.ops.pixel_shuffle import pixel_shuffle

    def conv(t, k, b):
        return (
            jax.lax.conv_general_dilated(
                t, k, (1, 1), [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC")
            )
            + b
        )

    rng = np.random.default_rng(1)
    for s in (2, 3):
        h = w = 16
        cin, n_colors = 8, 3
        x = jnp.asarray(rng.standard_normal((1, h, w, cin)), jnp.float32)
        w0 = jnp.asarray(rng.standard_normal((3, 3, cin, s * s * cin)) * 0.1, jnp.float32)
        b0 = jnp.asarray(rng.standard_normal(s * s * cin) * 0.1, jnp.float32)
        w2 = jnp.asarray(rng.standard_normal((3, 3, cin, n_colors)) * 0.1, jnp.float32)
        b2 = jnp.asarray(rng.standard_normal(n_colors) * 0.1, jnp.float32)

        want = conv(x, w0, b0)
        want = pixel_shuffle(want, s)
        want = np.asarray(conv(want, w2, b2))

        got = fused_upsample_s(x, w0, b0, w2, b2, s=s, interpret=True)
        assert got is not None
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=1e-4)


def test_fused_tails_batched_match_per_image():
    """Batched input routes through the per-image lax.map wrapper: the
    result must equal running each image alone (tiled serving tile_batch)."""
    import jax.numpy as jnp
    import numpy as np

    from studiosr_tpu.ops.pallas.upsampler import fused_upsample_s, fused_upsample_x4

    rng = np.random.default_rng(5)
    h = w = 16
    cin, n_colors = 8, 3
    xb = jnp.asarray(rng.standard_normal((3, h, w, cin)), jnp.float32)

    w0 = jnp.asarray(rng.standard_normal((3, 3, cin, 4 * cin)) * 0.1, jnp.float32)
    b0 = jnp.asarray(rng.standard_normal(4 * cin) * 0.1, jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((3, 3, cin, 4 * cin)) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal(4 * cin) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((3, 3, cin, n_colors)) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal(n_colors) * 0.1, jnp.float32)

    got = fused_upsample_x4(xb, w0, b0, w1, b1, w2, b2, interpret=True)
    assert got is not None and got.shape == (3, 4 * h, 4 * w, n_colors)
    for i in range(3):
        one = fused_upsample_x4(xb[i : i + 1], w0, b0, w1, b1, w2, b2, interpret=True)
        np.testing.assert_allclose(np.asarray(got[i]), np.asarray(one[0]), atol=1e-6)

    w0s = jnp.asarray(rng.standard_normal((3, 3, cin, 4 * cin)) * 0.1, jnp.float32)
    b0s = jnp.asarray(rng.standard_normal(4 * cin) * 0.1, jnp.float32)
    got = fused_upsample_s(xb, w0s, b0s, w2, b2, s=2, interpret=True)
    assert got is not None and got.shape == (3, 2 * h, 2 * w, n_colors)
    for i in range(3):
        one = fused_upsample_s(xb[i : i + 1], w0s, b0s, w2, b2, s=2, interpret=True)
        np.testing.assert_allclose(np.asarray(got[i]), np.asarray(one[0]), atol=1e-6)
