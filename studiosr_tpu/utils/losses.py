"""Training losses as pure JAX functions.

The reference exposes an L1 default plus a Charbonnier loss
(``studiosr/utils/losses.py:5-12`` in /root/reference). Losses here are plain
``(pred, target) -> scalar`` functions, jit-compatible, so the Trainer can fuse
them into the train step.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["l1_loss", "l2_loss", "charbonnier_loss", "CharbonnierLoss", "get_loss"]


def l1_loss(pred, target):
    return jnp.mean(jnp.abs(pred - target))


def l2_loss(pred, target):
    return jnp.mean(jnp.square(pred - target))


def charbonnier_loss(pred, target, eps: float = 1e-6):
    """sqrt((x - y)^2 + eps), mean-reduced (losses.py:5-12)."""
    return jnp.mean(jnp.sqrt(jnp.square(pred - target) + eps))


class CharbonnierLoss:
    """Callable wrapper mirroring the reference class interface."""

    def __init__(self, eps: float = 1e-6, reduction: str = "mean") -> None:
        self.eps = eps
        self.reduce = jnp.mean if reduction == "mean" else jnp.sum

    def __call__(self, x, y):
        return self.reduce(jnp.sqrt(jnp.square(x - y) + self.eps))


_LOSSES = {
    "l1": l1_loss,
    "l2": l2_loss,
    "mse": l2_loss,
    "charbonnier": charbonnier_loss,
}


def get_loss(name_or_fn):
    """Resolve a loss by name or pass a callable through."""
    if callable(name_or_fn):
        return name_or_fn
    return _LOSSES[str(name_or_fn).lower()]
