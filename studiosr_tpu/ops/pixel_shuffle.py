"""Depth-to-space (pixel shuffle) for NHWC tensors.

TPU-native replacement for ``nn.PixelShuffle`` (used by every reference
upsampler, ``studiosr/models/common.py:124-137``). XLA lowers the
reshape+transpose pair to a single data-movement op and fuses it with the
producing convolution, so no custom kernel is needed for this.

The channel ordering matches PyTorch's convention, which matters for
pretrained-weight parity: for input channel index ``c*r*r + i*r + j`` the
output pixel is ``(h*r + i, w*r + j)`` of channel ``c``.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["pixel_shuffle", "pixel_unshuffle"]


def pixel_shuffle(x: jnp.ndarray, scale: int) -> jnp.ndarray:
    """(N, H, W, C*r^2) -> (N, H*r, W*r, C) with torch channel ordering."""
    n, h, w, c = x.shape
    r = scale
    oc = c // (r * r)
    x = x.reshape(n, h, w, oc, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # (N, H, r_i, W, r_j, C)
    return x.reshape(n, h * r, w * r, oc)


def pixel_unshuffle(x: jnp.ndarray, scale: int) -> jnp.ndarray:
    """(N, H*r, W*r, C) -> (N, H, W, C*r^2), inverse of :func:`pixel_shuffle`."""
    n, hr, wr, c = x.shape
    r = scale
    h, w = hr // r, wr // r
    x = x.reshape(n, h, r, w, r, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # (N, H, W, C, r_i, r_j)
    return x.reshape(n, h, w, c * r * r)
