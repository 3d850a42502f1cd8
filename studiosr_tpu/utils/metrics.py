"""Standard super-resolution quality metrics.

Implements the SR benchmark protocol of the reference implementation
(``studiosr/utils/metrics.py`` in /root/reference): BT.601 Y-channel
conversion on [0,1] floats (metrics.py:11-17), border cropping, PSNR as
20*log10(255/sqrt(MSE)) (metrics.py:36-49), and SSIM with the
skimage ``structural_similarity`` constants — K1=0.01, K2=0.03, gaussian
window sigma=1.5 (11x11 taps via truncate=3.5), ``use_sample_covariance=False``,
``data_range=255`` (metrics.py:52-71).

Two implementations are provided:

* numpy host versions (``compute_psnr`` / ``compute_ssim``) — the bit-exact
  protocol reference, float64 like skimage;
* jitted on-device versions (``compute_psnr_jax`` / ``compute_ssim_jax``) —
  XLA-fused so evaluation never leaves the chip; SSIM's gaussian window is a
  separable depthwise convolution. Validated against the numpy versions in
  ``tests/utils/test_metrics.py``.

Note skimage's SSIM crops the filtered maps by the window radius, so the
gaussian boundary mode is irrelevant: every retained output tap only touches
in-bounds pixels.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import numpy as np

__all__ = [
    "is_rgb",
    "to_y",
    "crop_img_to_equal",
    "compute_psnr",
    "compute_ssim",
    "compute_psnr_jax",
    "compute_ssim_jax",
]

# BT.601 RGB -> Y (luma) weights used across the SR literature.
_Y_WEIGHTS = np.array([65.481, 128.553, 24.966])
_Y_OFFSET = 16.0

# skimage structural_similarity constants (metrics.py:60-70).
_SSIM_K1 = 0.01
_SSIM_K2 = 0.03
_SSIM_SIGMA = 1.5
_SSIM_TRUNCATE = 3.5
_SSIM_DATA_RANGE = 255.0


def is_rgb(im: np.ndarray) -> bool:
    return len(im.shape) == 3 and im.shape[-1] == 3


def to_y(image: np.ndarray) -> np.ndarray:
    """RGB -> BT.601 Y channel; uint8 input is scaled to [0,1] first."""
    if not is_rgb(image):
        return image
    if image.dtype == np.uint8:
        image = image.astype(np.float32) / 255.0
    return np.dot(image, _Y_WEIGHTS) + _Y_OFFSET


def crop_img_to_equal(im1: np.ndarray, im2: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Crop the larger image's bottom/right so both share a common size."""
    diff_x = abs(im1.shape[0] - im2.shape[0])
    diff_y = abs(im1.shape[1] - im2.shape[1])
    if im1.shape[0] > im2.shape[0]:
        im1 = im1[:-diff_x, :]
    elif im1.shape[0] < im2.shape[0]:
        im2 = im2[:-diff_x, :]
    if im1.shape[1] > im2.shape[1]:
        im1 = im1[:, :-diff_y]
    elif im1.shape[1] < im2.shape[1]:
        im2 = im2[:, :-diff_y]
    return im1, im2


def compute_psnr(
    im1: np.ndarray, im2: np.ndarray, y_only: bool = False, crop_border: int = 0
) -> np.float64:
    im1, im2 = crop_img_to_equal(im1, im2)
    if crop_border:
        im1 = im1[crop_border:-crop_border, crop_border:-crop_border]
        im2 = im2[crop_border:-crop_border, crop_border:-crop_border]
    if y_only:
        im1, im2 = to_y(im1), to_y(im2)
    elif im1.dtype != np.uint8:
        im1, im2 = im1 * 255.0, im2 * 255.0
    error = np.mean((im1.astype(np.float32) - im2.astype(np.float32)) ** 2)
    if error == 0:
        return np.inf
    return 20 * np.log10(255.0 / np.sqrt(error))


def _gaussian_kernel_1d(sigma: float = _SSIM_SIGMA, truncate: float = _SSIM_TRUNCATE) -> np.ndarray:
    """The 1-D gaussian taps scipy.ndimage uses: radius = int(truncate*sigma + 0.5)."""
    radius = int(truncate * sigma + 0.5)
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    kernel = np.exp(-0.5 * (x / sigma) ** 2)
    return kernel / kernel.sum()


def _ssim_single_channel(im1: np.ndarray, im2: np.ndarray) -> float:
    """skimage structural_similarity for one 2-D channel.

    gaussian_weights=True / sigma=1.5 / use_sample_covariance=False /
    data_range=255; float64 compute; the filtered maps are cropped by the
    window radius before averaging, exactly like skimage.
    """
    kernel = _gaussian_kernel_1d()
    pad = (kernel.size - 1) // 2

    im1 = im1.astype(np.float64)
    im2 = im2.astype(np.float64)

    def filt(img: np.ndarray) -> np.ndarray:
        # Separable gaussian; boundary values are discarded by the crop below.
        from scipy.ndimage import correlate1d

        out = correlate1d(img, kernel, axis=0, mode="reflect")
        return correlate1d(out, kernel, axis=1, mode="reflect")

    ux = filt(im1)
    uy = filt(im2)
    uxx = filt(im1 * im1)
    uyy = filt(im2 * im2)
    uxy = filt(im1 * im2)
    # use_sample_covariance=False -> cov_norm = 1
    vx = uxx - ux * ux
    vy = uyy - uy * uy
    vxy = uxy - ux * uy

    c1 = (_SSIM_K1 * _SSIM_DATA_RANGE) ** 2
    c2 = (_SSIM_K2 * _SSIM_DATA_RANGE) ** 2
    a1 = 2.0 * ux * uy + c1
    a2 = 2.0 * vxy + c2
    b1 = ux**2 + uy**2 + c1
    b2 = vx + vy + c2
    s = (a1 * a2) / (b1 * b2)
    return float(s[pad:-pad, pad:-pad].mean())


def compute_ssim(
    im1: np.ndarray, im2: np.ndarray, y_only: bool = False, crop_border: int = 0
) -> np.float64:
    im1, im2 = crop_img_to_equal(im1, im2)
    if crop_border:
        im1 = im1[crop_border:-crop_border, crop_border:-crop_border]
        im2 = im2[crop_border:-crop_border, crop_border:-crop_border]
    if y_only:
        im1, im2 = to_y(im1), to_y(im2)
    if im1.ndim == 3:
        # Multichannel: mean of per-channel SSIM (skimage channel_axis semantics).
        values = [_ssim_single_channel(im1[..., c], im2[..., c]) for c in range(im1.shape[-1])]
        return np.float64(np.mean(values))
    return np.float64(_ssim_single_channel(im1, im2))


# ---------------------------------------------------------------------------
# On-device (jitted) versions.
# ---------------------------------------------------------------------------


def _to_y_jax(image):
    import jax.numpy as jnp

    if image.ndim == 3 and image.shape[-1] == 3:
        weights = jnp.asarray(_Y_WEIGHTS, dtype=jnp.float32)
        # precision: TPU default truncates f32 multiplies to bf16; metric
        # parity with the host protocol needs true f32.
        return jnp.tensordot(image, weights, axes=[[-1], [0]], precision="highest") + _Y_OFFSET
    return image


def _to_y_like_host(image):
    """Exact mirror of the host :func:`to_y` dtype dispatch: ONLY uint8 is
    rescaled to [0,1] before the Y weights (reference metrics.py:11-17);
    float inputs are assumed [0,1] already. An unconditional ``/255`` here
    silently inflated scores for float-valued callers (~+48 dB measured on
    [0,1] f32 pairs) — the uint8 production path was unaffected."""
    import jax.numpy as jnp

    if image.dtype == jnp.uint8:
        return _to_y_jax(image.astype(jnp.float32) / 255.0)
    return _to_y_jax(image.astype(jnp.float32))


def _crop_to_equal_jax(im1, im2):
    """Host-side analog of :func:`crop_img_to_equal` for device arrays:
    shapes are concrete here, so plain slicing keeps the jitted impls
    static-shaped (SR output can be smaller than GT when the HR image is
    not divisible by the scale — e.g. Set14 at x4)."""
    h = min(im1.shape[0], im2.shape[0])
    w = min(im1.shape[1], im2.shape[1])
    return im1[:h, :w], im2[:h, :w]


@partial(__import__("jax").jit, static_argnames=("y_only", "crop_border", "scale255"))
def _psnr_jax_impl(im1, im2, y_only: bool, crop_border: int, scale255: bool):
    import jax.numpy as jnp

    if crop_border:
        im1 = im1[crop_border:-crop_border, crop_border:-crop_border]
        im2 = im2[crop_border:-crop_border, crop_border:-crop_border]
    if y_only:
        im1 = _to_y_like_host(im1)
        im2 = _to_y_like_host(im2)
    else:
        im1 = im1.astype(jnp.float32)
        im2 = im2.astype(jnp.float32)
        if scale255:
            # Float [0,1] inputs are scaled like the host/reference protocol
            # (reference metrics.py:43-44).
            im1, im2 = im1 * 255.0, im2 * 255.0
    error = jnp.mean((im1 - im2) ** 2)
    return 20.0 * jnp.log10(255.0 / jnp.sqrt(error))


def compute_psnr_jax(im1, im2, y_only: bool = False, crop_border: int = 0):
    """On-device PSNR (returns a device scalar), matching the host
    :func:`compute_psnr` protocol: images cropped to a common size, uint8
    treated as 0-255, non-y float inputs scaled by 255."""
    im1, im2 = _crop_to_equal_jax(im1, im2)
    scale255 = not y_only and im1.dtype != np.uint8
    return _psnr_jax_impl(im1, im2, y_only, crop_border, scale255)


def _ssim_maps_jax(im1, im2):
    import jax.numpy as jnp
    from jax import lax

    kernel = jnp.asarray(_gaussian_kernel_1d(), dtype=jnp.float32)

    def filt(img):
        # img: (H, W) -> separable "valid" gaussian; crop happens implicitly.
        # HIGHEST precision is load-bearing on TPU: the default bf16-truncated
        # multiplies wreck the E[x^2] - E[x]^2 variance cancellation and SSIM
        # diverges from the host protocol by ~0.02 (measured, exp_eval_ab.py).
        x = img[None, :, :, None]
        kh = kernel.reshape(-1, 1, 1, 1)
        kw = kernel.reshape(1, -1, 1, 1)
        x = lax.conv_general_dilated(
            x, kh, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=lax.Precision.HIGHEST,
        )
        x = lax.conv_general_dilated(
            x, kw, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=lax.Precision.HIGHEST,
        )
        return x[0, :, :, 0]

    ux = filt(im1)
    uy = filt(im2)
    uxx = filt(im1 * im1)
    uyy = filt(im2 * im2)
    uxy = filt(im1 * im2)
    vx = uxx - ux * ux
    vy = uyy - uy * uy
    vxy = uxy - ux * uy

    c1 = (_SSIM_K1 * _SSIM_DATA_RANGE) ** 2
    c2 = (_SSIM_K2 * _SSIM_DATA_RANGE) ** 2
    s = ((2.0 * ux * uy + c1) * (2.0 * vxy + c2)) / ((ux**2 + uy**2 + c1) * (vx + vy + c2))
    return s


@partial(__import__("jax").jit, static_argnames=("y_only", "crop_border"))
def _ssim_jax_impl(im1, im2, y_only: bool, crop_border: int):
    import jax.numpy as jnp

    if crop_border:
        im1 = im1[crop_border:-crop_border, crop_border:-crop_border]
        im2 = im2[crop_border:-crop_border, crop_border:-crop_border]
    if y_only:
        im1 = _to_y_like_host(im1)
        im2 = _to_y_like_host(im2)
    else:
        im1 = im1.astype(jnp.float32)
        im2 = im2.astype(jnp.float32)
    if im1.ndim == 3:
        values = [jnp.mean(_ssim_maps_jax(im1[..., c], im2[..., c])) for c in range(im1.shape[-1])]
        return jnp.mean(jnp.stack(values))
    return jnp.mean(_ssim_maps_jax(im1, im2))


def compute_ssim_jax(im1, im2, y_only: bool = False, crop_border: int = 0):
    """On-device SSIM (fp32) matching the skimage protocol to ~1e-5.

    Like the host/reference :func:`compute_ssim`, non-y float inputs are
    deliberately NOT rescaled (the reference feeds them to skimage with
    ``data_range=255`` as-is, reference metrics.py:52-71) — protocol parity
    over plausibility."""
    im1, im2 = _crop_to_equal_jax(im1, im2)
    return _ssim_jax_impl(im1, im2, y_only, crop_border)
