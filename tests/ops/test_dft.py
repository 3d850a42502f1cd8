"""MXU-matmul DFT vs jnp.fft (the SwinFIR SFB spectral path)."""

import jax.numpy as jnp
import numpy as np
import pytest

from studiosr_tpu.ops.dft import irfft2_mxu, rfft2_mxu


@pytest.mark.parametrize("h,w", [(16, 16), (24, 32), (15, 22)])
def test_rfft2_matches_jnp(h, w):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, h, w, 5)), jnp.float32)
    want = jnp.fft.rfftn(x, axes=(1, 2), norm="ortho")
    re, im = rfft2_mxu(x)
    np.testing.assert_allclose(np.asarray(re), np.asarray(want.real), atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(im), np.asarray(want.imag), atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("h,w", [(16, 16), (24, 32), (15, 22)])
def test_irfft2_matches_jnp(h, w):
    rng = np.random.default_rng(1)
    re = jnp.asarray(rng.standard_normal((2, h, w // 2 + 1, 5)), jnp.float32)
    im = jnp.asarray(rng.standard_normal((2, h, w // 2 + 1, 5)), jnp.float32)
    want = jnp.fft.irfftn(jnp.complex64(re + 1j * im), s=(h, w), axes=(1, 2), norm="ortho")
    got = irfft2_mxu(re, im, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5, rtol=1e-4)


def test_roundtrip():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 24, 24, 3)), jnp.float32)
    re, im = rfft2_mxu(x)
    back = irfft2_mxu(re, im, 24)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=3e-5, rtol=1e-4)
