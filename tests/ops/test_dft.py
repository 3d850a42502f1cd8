"""MXU-matmul DFT vs jnp.fft (the SwinFIR SFB spectral path).

Both formulations are pinned: "split" (one einsum per trig matrix, f32) and
"merged" (cos/sin stacked into single dots, compute dtype follows the input
— the serving default).
"""

import jax.numpy as jnp
import numpy as np
import pytest

import studiosr_tpu.ops.dft as dft
from studiosr_tpu.ops.dft import irfft2_mxu, rfft2_mxu


@pytest.fixture(params=["split", "merged"])
def dft_impl(request, monkeypatch):
    monkeypatch.setattr(dft, "DFT_IMPL", request.param)
    return request.param


@pytest.mark.parametrize("h,w", [(16, 16), (24, 32), (15, 22), (16, 21)])
def test_rfft2_matches_jnp(h, w, dft_impl):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, h, w, 5)), jnp.float32)
    want = jnp.fft.rfftn(x, axes=(1, 2), norm="ortho")
    re, im = rfft2_mxu(x)
    np.testing.assert_allclose(np.asarray(re), np.asarray(want.real), atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(im), np.asarray(want.imag), atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("h,w", [(16, 16), (24, 32), (15, 22), (16, 21)])
def test_irfft2_matches_jnp(h, w, dft_impl):
    rng = np.random.default_rng(1)
    re = jnp.asarray(rng.standard_normal((2, h, w // 2 + 1, 5)), jnp.float32)
    im = jnp.asarray(rng.standard_normal((2, h, w // 2 + 1, 5)), jnp.float32)
    want = jnp.fft.irfftn(jnp.complex64(re + 1j * im), s=(h, w), axes=(1, 2), norm="ortho")
    got = irfft2_mxu(re, im, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5, rtol=1e-4)


def test_roundtrip(dft_impl):
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 24, 24, 3)), jnp.float32)
    re, im = rfft2_mxu(x)
    back = irfft2_mxu(re, im, 24)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=3e-5, rtol=1e-4)


def test_merged_matches_split(monkeypatch):
    """The two formulations agree tightly at f32 (same math per dot)."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, 33, 33, 7)), jnp.float32)
    re_m, im_m = dft._rfft2_merged(x)
    monkeypatch.setattr(dft, "DFT_IMPL", "split")
    re_s, im_s = dft.rfft2_mxu(x)
    np.testing.assert_allclose(np.asarray(re_m), np.asarray(re_s), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(im_m), np.asarray(im_s), atol=1e-5, rtol=1e-5)
    back_m = dft._irfft2_merged(re_m, im_m, 33)
    back_s = dft.irfft2_mxu(re_s, im_s, 33)
    np.testing.assert_allclose(np.asarray(back_m), np.asarray(back_s), atol=1e-5, rtol=1e-5)
