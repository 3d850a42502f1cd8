"""Bicubic resize with PyTorch semantics, as MXU-friendly matrix products.

SRCNN/VDSR (and the Evaluator's visualization path) rely on
``nn.Upsample(mode="bicubic")`` (reference ``studiosr/models/srcnn.py:47``,
``vdsr.py:29``). PyTorch's bicubic uses the Keys kernel with A = -0.75 and
half-pixel sampling (align_corners=False), which differs from
``jax.image.resize`` (A = -0.5) — so a direct port of the call would break
pretrained parity.

TPU-first design: because the interpolation weights depend only on the
(static) input/output sizes, we precompute two dense interpolation matrices at
trace time (numpy, baked as constants) and lower the resize to two matmuls —
``out = W_h @ img @ W_w^T`` — which run on the MXU instead of gather units.
For typical SR shapes these matrices are tiny relative to the feature maps.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

__all__ = ["bicubic_resize", "bicubic_matrix"]

_A = -0.75  # PyTorch's cubic convolution coefficient.


def _cubic_kernel(t: np.ndarray) -> np.ndarray:
    """Keys cubic convolution weight for |t| in [0, 2] with A = -0.75."""
    t = np.abs(t)
    w = np.where(
        t <= 1.0,
        ((_A + 2.0) * t - (_A + 3.0)) * t * t + 1.0,
        np.where(t < 2.0, ((_A * t - 5.0 * _A) * t + 8.0 * _A) * t - 4.0 * _A, 0.0),
    )
    return w


@lru_cache(maxsize=256)
def bicubic_matrix(in_size: int, out_size: int) -> np.ndarray:
    """Dense (out_size, in_size) interpolation matrix matching torch bicubic.

    Half-pixel mapping: src = (dst + 0.5) * in/out - 0.5; four taps at
    floor(src)-1 .. floor(src)+2 with edge-clamped indices.
    """
    scale = in_size / out_size
    dst = np.arange(out_size, dtype=np.float64)
    src = (dst + 0.5) * scale - 0.5
    x0 = np.floor(src).astype(np.int64)
    t = src - x0

    matrix = np.zeros((out_size, in_size), dtype=np.float64)
    for tap in range(-1, 3):
        weight = _cubic_kernel(t - tap)
        index = np.clip(x0 + tap, 0, in_size - 1)
        np.add.at(matrix, (dst.astype(np.int64), index), weight)
    return matrix.astype(np.float32)


def bicubic_resize(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Bicubic resize of NHWC ``x`` to (out_h, out_w), torch-parity weights."""
    n, h, w, c = x.shape
    wh = jnp.asarray(bicubic_matrix(h, out_h))
    ww = jnp.asarray(bicubic_matrix(w, out_w))
    # (N,H,W,C): contract H then W on the MXU.
    x = jnp.einsum("oh,nhwc->nowc", wh, x)
    x = jnp.einsum("pw,nowc->nopc", ww, x)
    return x


def bicubic_upsample(x: jnp.ndarray, scale: int) -> jnp.ndarray:
    """Integer-factor bicubic upsample (``nn.Upsample(scale_factor=s)``)."""
    n, h, w, c = x.shape
    return bicubic_resize(x, h * scale, w * scale)
