import numpy as np
import pytest

from studiosr_tpu.utils import (
    compute_psnr,
    compute_psnr_jax,
    compute_ssim,
    compute_ssim_jax,
    to_y,
)


def test_psnr_black_vs_white() -> None:
    im1 = np.zeros((32, 32, 3), dtype=np.uint8)
    im2 = np.full((32, 32, 3), 255, dtype=np.uint8)
    assert compute_psnr(im1, im2) == 0.0


def test_psnr_identical_is_inf() -> None:
    im = np.random.default_rng(0).integers(0, 256, (16, 16, 3), dtype=np.uint8)
    assert compute_psnr(im, im) == np.inf


def test_psnr_uint8_float_invariance() -> None:
    im1 = np.random.default_rng(0).integers(0, 256, (24, 24, 3), dtype=np.uint8)
    im2 = np.random.default_rng(1).integers(0, 256, (24, 24, 3), dtype=np.uint8)
    p_uint8 = compute_psnr(im1, im2)
    p_float = compute_psnr(im1.astype(np.float64) / 255.0, im2.astype(np.float64) / 255.0)
    assert abs(p_uint8 - p_float) < 1e-4


def test_psnr_against_direct_formula() -> None:
    rng = np.random.default_rng(2)
    im1 = rng.integers(0, 256, (40, 30, 3), dtype=np.uint8)
    im2 = rng.integers(0, 256, (40, 30, 3), dtype=np.uint8)
    mse = np.mean((im1.astype(np.float64) - im2.astype(np.float64)) ** 2)
    want = 10 * np.log10(255.0**2 / mse)
    assert abs(compute_psnr(im1, im2) - want) < 1e-4


def test_psnr_crop_and_shape_mismatch() -> None:
    rng = np.random.default_rng(3)
    im1 = rng.integers(0, 256, (40, 30, 3), dtype=np.uint8)
    im2 = rng.integers(0, 256, (44, 33, 3), dtype=np.uint8)
    # Larger image is cropped bottom/right to match, then the border is cut.
    want = compute_psnr(im1[4:-4, 4:-4], im2[:40, :30][4:-4, 4:-4])
    got = compute_psnr(im1, im2, crop_border=4)
    assert abs(got - want) < 1e-6


def test_to_y_range() -> None:
    white = np.full((4, 4, 3), 255, dtype=np.uint8)
    black = np.zeros((4, 4, 3), dtype=np.uint8)
    assert np.allclose(to_y(white), 235.0, atol=1e-3)
    assert np.allclose(to_y(black), 16.0, atol=1e-6)


def _ssim_cv2_reference(img1: np.ndarray, img2: np.ndarray) -> float:
    """Independent SSIM implementation (BasicSR protocol, cv2 gaussian window)
    to cross-validate ours: 11x11 sigma-1.5 window, valid-region mean."""
    import cv2

    img1 = img1.astype(np.float64)
    img2 = img2.astype(np.float64)
    c1 = (0.01 * 255) ** 2
    c2 = (0.03 * 255) ** 2
    kernel = cv2.getGaussianKernel(11, 1.5)
    window = np.outer(kernel, kernel.transpose())
    mu1 = cv2.filter2D(img1, -1, window)[5:-5, 5:-5]
    mu2 = cv2.filter2D(img2, -1, window)[5:-5, 5:-5]
    mu1_sq, mu2_sq, mu1_mu2 = mu1**2, mu2**2, mu1 * mu2
    sigma1_sq = cv2.filter2D(img1**2, -1, window)[5:-5, 5:-5] - mu1_sq
    sigma2_sq = cv2.filter2D(img2**2, -1, window)[5:-5, 5:-5] - mu2_sq
    sigma12 = cv2.filter2D(img1 * img2, -1, window)[5:-5, 5:-5] - mu1_mu2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / ((mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2))
    return float(ssim_map.mean())


def test_ssim_identical_is_one() -> None:
    im = np.random.default_rng(0).integers(0, 256, (48, 48, 3), dtype=np.uint8)
    assert compute_ssim(im, im) > 0.9999


def test_ssim_matches_independent_implementation() -> None:
    rng = np.random.default_rng(4)
    gt = rng.integers(0, 256, (64, 56), dtype=np.uint8).astype(np.float64)
    noisy = np.clip(gt + rng.normal(0, 12, gt.shape), 0, 255)
    want = _ssim_cv2_reference(noisy, gt)
    got = compute_ssim(noisy, gt)
    assert abs(got - want) < 1e-4, (got, want)


def test_jax_psnr_matches_numpy() -> None:
    rng = np.random.default_rng(5)
    im1 = rng.integers(0, 256, (33, 41, 3), dtype=np.uint8)
    im2 = rng.integers(0, 256, (33, 41, 3), dtype=np.uint8)
    for y_only in (False, True):
        for crop in (0, 4):
            want = compute_psnr(im1, im2, y_only=y_only, crop_border=crop)
            got = float(compute_psnr_jax(im1, im2, y_only=y_only, crop_border=crop))
            assert abs(got - want) < 1e-3, (y_only, crop, got, want)


def test_jax_ssim_matches_numpy() -> None:
    rng = np.random.default_rng(6)
    gt = rng.integers(0, 256, (40, 44, 3), dtype=np.uint8)
    noisy = np.clip(gt.astype(np.float64) + rng.normal(0, 10, gt.shape), 0, 255).astype(np.uint8)
    for y_only in (True, False):
        want = compute_ssim(noisy, gt, y_only=y_only, crop_border=4)
        got = float(compute_ssim_jax(noisy, gt, y_only=y_only, crop_border=4))
        assert abs(got - want) < 1e-4, (y_only, got, want)


def test_jax_metrics_crop_to_equal_like_host() -> None:
    """SR can be smaller than GT (HR not divisible by the scale — e.g.
    Set14 at x4): the jax paths must crop to a common size like the host
    protocol instead of crashing on a broadcast mismatch."""
    rng = np.random.default_rng(7)
    gt = rng.integers(0, 256, (41, 45, 3), dtype=np.uint8)
    sr = rng.integers(0, 256, (40, 44, 3), dtype=np.uint8)
    for y_only in (False, True):
        want = compute_psnr(sr, gt, y_only=y_only, crop_border=4)
        got = float(compute_psnr_jax(sr, gt, y_only=y_only, crop_border=4))
        assert abs(got - want) < 1e-3, (y_only, got, want)
    want = compute_ssim(sr, gt, y_only=True, crop_border=4)
    got = float(compute_ssim_jax(sr, gt, y_only=True, crop_border=4))
    assert abs(got - want) < 1e-4, (got, want)


def test_jax_psnr_float_scaling_matches_host() -> None:
    """Non-y float [0,1] inputs are scaled by 255 in the host/reference
    protocol (reference metrics.py:43-44); the jax path must agree instead
    of treating the same floats as 0-255 intensities (~48 dB apart)."""
    rng = np.random.default_rng(8)
    im1 = rng.random((24, 28, 3)).astype(np.float32)
    im2 = rng.random((24, 28, 3)).astype(np.float32)
    want = compute_psnr(im1, im2, y_only=False, crop_border=0)
    got = float(compute_psnr_jax(im1, im2, y_only=False, crop_border=0))
    assert abs(got - want) < 1e-3, (got, want)


def test_jax_y_only_float_inputs_match_host() -> None:
    """y_only metrics on FLOAT [0,1] inputs must mirror the host to_y dtype
    dispatch (only uint8 is rescaled, reference metrics.py:11-17): the old
    unconditional /255 compressed floats to [0, 0.004] before the Y weights
    and inflated PSNR by ~48 dB / SSIM to ~1.0."""
    rng = np.random.default_rng(9)
    base = rng.integers(0, 256, (32, 36, 3))
    noisy = np.clip(base + rng.integers(-12, 12, base.shape), 0, 255)
    im1 = (base / 255.0).astype(np.float32)
    im2 = (noisy / 255.0).astype(np.float32)
    want_p = compute_psnr(im1, im2, y_only=True, crop_border=2)
    got_p = float(compute_psnr_jax(im1, im2, y_only=True, crop_border=2))
    assert abs(got_p - want_p) < 1e-3, (got_p, want_p)
    want_s = compute_ssim(im1, im2, y_only=True, crop_border=2)
    got_s = float(compute_ssim_jax(im1, im2, y_only=True, crop_border=2))
    assert abs(got_s - want_s) < 1e-4, (got_s, want_s)
