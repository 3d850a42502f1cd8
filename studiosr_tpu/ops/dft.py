"""2-D real FFT as MXU matmuls (TPU-native DFT).

SwinFIR's Spatial-Frequency Block needs ``rfftn``/``irfftn`` over the
feature-map axes (reference ``studiosr/models/swinfir.py:18-33``). XLA's FFT
op on this TPU backend compiles pathologically at SwinFIR's shapes (a
(1, 64, 64, 90) rfftn hangs the compiler for 20+ minutes — round-3 probe),
and FFT butterflies are a poor fit for the systolic array anyway. At SR map
sizes (<= a few hundred pixels per axis) the O(N) DFT-matrix contraction is
a few GFLOP of dense matmul — exactly what the MXU is for.

Forward/inverse are 'ortho'-normalized to match ``jnp.fft.rfftn(...,
norm="ortho")`` / ``irfftn``; validated against them in
tests/ops/test_dft.py.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["rfft2_mxu", "irfft2_mxu"]

# "merged": each transform axis is ONE dot with the cos/sin matrices stacked
# along the output (or contraction) axis — 2 dots per transform instead of 6,
# and the compute dtype follows the input (bf16 trunk => bf16 operands with
# f32 accumulation) instead of always materializing f32 maps. Fewer, bigger,
# narrower dots is the round-3 kernel lesson applied at the XLA level.
# "split": the original 6-dot f32 formulation (kept for A/B measurement —
# scripts/exp_swinfir_ablate.py).
DFT_IMPL = "merged"

# Tests: route the CPU backend through the matmul DFT too (the serving and
# model SFB paths take jnp.fft on CPU otherwise, leaving the MXU wiring
# untested offline).
FORCE_MXU = False


def use_mxu_dft() -> bool:
    """MXU DFT on TPU (XLA's FFT op compile-hangs at SFB shapes on this
    backend); ``jnp.fft`` on CPU unless :data:`FORCE_MXU`."""
    return FORCE_MXU or jax.default_backend() != "cpu"


def _dot_dtype(x: jnp.ndarray):
    # CPU's dot thunk rejects BF16 x BF16 = F32; bf16 operands are a TPU
    # (traffic) optimization only.
    if x.dtype == jnp.bfloat16 and jax.default_backend() != "cpu":
        return jnp.bfloat16
    return jnp.float32


@lru_cache(maxsize=32)
def _mats(n: int):
    """cos/sin DFT matrices (n, n): M[j, k] = trig(2*pi*j*k/n)."""
    jk = np.outer(np.arange(n), np.arange(n)) * (2.0 * np.pi / n)
    return np.cos(jk).astype(np.float32), np.sin(jk).astype(np.float32)


def rfft2_mxu(x: jnp.ndarray):
    """Real 2-D DFT over axes (1, 2) of (B, H, W, C), ortho-normalized.

    Returns ``(re, im)`` of shape (B, H, W//2 + 1, C) — equal to the real
    and imaginary parts of ``jnp.fft.rfftn(x, axes=(1, 2), norm="ortho")``.
    """
    if DFT_IMPL == "merged":
        return _rfft2_merged(x)
    _, h, w, _ = x.shape
    kw = w // 2 + 1
    cw, sw = _mats(w)
    ch, sh = _mats(h)
    cwk = jnp.asarray(cw[:, :kw])
    swk = jnp.asarray(sw[:, :kw])
    chm = jnp.asarray(ch)
    shm = jnp.asarray(sh)

    x32 = x.astype(jnp.float32)
    # W axis (real input): X1[k] = sum_w x[w] e^{-2pi i w k / W}
    re1 = jnp.einsum("bhwc,wk->bhkc", x32, cwk)
    im1 = -jnp.einsum("bhwc,wk->bhkc", x32, swk)
    # H axis (complex): X2[m] = sum_h X1[h] e^{-2pi i h m / H}
    re = jnp.einsum("bhkc,hm->bmkc", re1, chm) + jnp.einsum("bhkc,hm->bmkc", im1, shm)
    im = jnp.einsum("bhkc,hm->bmkc", im1, chm) - jnp.einsum("bhkc,hm->bmkc", re1, shm)
    scale = 1.0 / np.sqrt(h * w)
    return re * scale, im * scale


def irfft2_mxu(re: jnp.ndarray, im: jnp.ndarray, w_out: int):
    """Inverse of :func:`rfft2_mxu`: (B, H, W//2+1, C) re/im -> real
    (B, H, w_out, C), ortho-normalized (matches ``jnp.fft.irfftn(...,
    s=(H, w_out), axes=(1, 2), norm="ortho")``)."""
    if DFT_IMPL == "merged":
        return _irfft2_merged(re, im, w_out)
    _, h, kw, _ = re.shape
    w = w_out
    cw, sw = _mats(w)
    ch, sh = _mats(h)
    # Hermitian fold weights along W: bins 1..ceil(W/2)-1 appear twice.
    alpha = np.full(kw, 2.0, np.float32)
    alpha[0] = 1.0
    if w % 2 == 0 and kw == w // 2 + 1:
        alpha[-1] = 1.0
    cwi = jnp.asarray(cw[:, :kw] * alpha)  # (w, kw)
    swi = jnp.asarray(sw[:, :kw] * alpha)
    chm = jnp.asarray(ch)
    shm = jnp.asarray(sh)

    re32 = re.astype(jnp.float32)
    im32 = im.astype(jnp.float32)
    # H axis inverse (complex): x1[g] = sum_m X[m] e^{+2pi i m g / H}
    re1 = jnp.einsum("bmkc,mg->bgkc", re32, chm) - jnp.einsum("bmkc,mg->bgkc", im32, shm)
    im1 = jnp.einsum("bmkc,mg->bgkc", im32, chm) + jnp.einsum("bmkc,mg->bgkc", re32, shm)
    # W axis inverse with hermitian fold, real output:
    out = jnp.einsum("bgkc,wk->bgwc", re1, cwi) - jnp.einsum("bgkc,wk->bgwc", im1, swi)
    scale = 1.0 / np.sqrt(h * w)
    return out * scale


# -- merged-dot formulation ---------------------------------------------------


def _rfft2_merged(x: jnp.ndarray):
    """Same contract as the split form, as 2 dots: the W pass multiplies by
    [cos | sin] stacked along the output axis; the H pass stacks (re1, im1)
    along channels and [cos | sin] along the output axis, and the four
    quadrants of the result combine elementwise."""
    b, h, w, c = x.shape
    kw = w // 2 + 1
    cw, sw = _mats(w)
    ch, sh = _mats(h)
    dt = _dot_dtype(x)
    wk = jnp.asarray(np.concatenate([cw[:, :kw], sw[:, :kw]], axis=1), dt)  # (w, 2kw)
    hm = jnp.asarray(np.concatenate([ch, sh], axis=1), dt)  # (h, 2h)

    t1 = jnp.einsum("bhwc,wk->bhkc", x.astype(dt), wk, preferred_element_type=jnp.float32)
    re1 = t1[:, :, :kw]
    im1 = -t1[:, :, kw:]
    s = jnp.concatenate([re1, im1], axis=-1).astype(dt)  # (b, h, kw, 2c)
    u = jnp.einsum("bhkc,hm->bmkc", s, hm, preferred_element_type=jnp.float32)  # (b, 2h, kw, 2c)
    # u quadrants: [m<h, c<c0] = re1@cos, [m<h, c>=c0] = im1@cos,
    #              [m>=h, c<c0] = re1@sin, [m>=h, c>=c0] = im1@sin
    re = u[:, :h, :, :c] + u[:, h:, :, c:]
    im = u[:, :h, :, c:] - u[:, h:, :, :c]
    scale = 1.0 / np.sqrt(h * w)
    return re * scale, im * scale


def _irfft2_merged(re: jnp.ndarray, im: jnp.ndarray, w_out: int):
    b, h, kw, c = re.shape
    w = w_out
    cw, sw = _mats(w)
    ch, sh = _mats(h)
    alpha = np.full(kw, 2.0, np.float32)
    alpha[0] = 1.0
    if w % 2 == 0 and kw == w // 2 + 1:
        alpha[-1] = 1.0
    dt = _dot_dtype(re)
    hm = jnp.asarray(np.concatenate([ch, sh], axis=1), dt)  # (h, 2h)
    # W pass contracts over k; stacking (re1, im1) along k pairs with
    # [alpha*cos | -alpha*sin] stacked along the same axis => one dot.
    wk = jnp.asarray(np.concatenate([(cw[:, :kw] * alpha), -(sw[:, :kw] * alpha)], axis=1), dt)  # (w, 2kw)

    s = jnp.concatenate([re, im], axis=-1).astype(dt)  # (b, h, kw, 2c)
    v = jnp.einsum("bmkc,mg->bgkc", s, hm, preferred_element_type=jnp.float32)  # (b, 2h, kw, 2c)
    re1 = v[:, :h, :, :c] - v[:, h:, :, c:]  # re@cos - im@sin
    im1 = v[:, :h, :, c:] + v[:, h:, :, :c]  # im@cos + re@sin
    z = jnp.concatenate([re1, im1], axis=2).astype(dt)  # (b, h, 2kw, c)
    out = jnp.einsum("bgkc,wk->bgwc", z, wk, preferred_element_type=jnp.float32)
    scale = 1.0 / np.sqrt(h * w)
    return out * scale
