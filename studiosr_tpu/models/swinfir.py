"""SwinFIR — SwinIR with Spatial-Frequency (Fourier) residual blocks.

Capabilities of the reference ``studiosr/models/swinfir.py``: every RSTB's
residual conv and the ``conv_after_body`` are replaced by an SFB — a spatial
conv branch in parallel with a spectral branch (rfft -> 1x1 conv on stacked
re/im -> irfft), fused by a 1x1 conv.

TPU notes: XLA lowers ``jnp.fft.rfftn`` to the TPU FFT op; the whole SFB
stays on-device inside the jitted forward (the reference relies on cuFFT,
``swinfir.py:21,31``).
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from studiosr_tpu.models.blocks import conv
from studiosr_tpu.models.swinir import SwinIR

__all__ = ["SwinFIR", "SFB", "FourierUnit", "SpectralTransform", "SpatialB"]


def _lrelu(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.leaky_relu(x, 0.2)


class FourierUnit(nn.Module):
    """rfft2 -> 1x1 conv on concatenated (re, im) channels -> irfft2
    (``swinfir.py:9-33``), norm='ortho'.

    On TPU the transform runs as MXU DFT matmuls (ops/dft.py): XLA's FFT op
    compiles pathologically at these shapes on this backend, and the dense
    DFT contraction is a better fit for the systolic array anyway."""

    embed_dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from studiosr_tpu.ops.dft import irfft2_mxu, rfft2_mxu, use_mxu_dft

        h, w = x.shape[1:3]
        if use_mxu_dft():
            re_f, im_f = rfft2_mxu(x)
        else:
            fft = jnp.fft.rfftn(x, axes=(1, 2), norm="ortho")  # (B, H, W//2+1, C)
            re_f, im_f = fft.real, fft.imag
        stacked = jnp.concatenate([re_f.astype(x.dtype), im_f.astype(x.dtype)], axis=-1)
        stacked = conv(self.embed_dim * 2, 1, name="conv_layer")(stacked)
        stacked = _lrelu(stacked)
        re, im = jnp.split(stacked, 2, axis=-1)
        if not use_mxu_dft():
            return jnp.fft.irfftn(jax.lax.complex(re, im), s=(h, w), axes=(1, 2), norm="ortho")
        return irfft2_mxu(re, im, w).astype(x.dtype)


class SpectralTransform(nn.Module):
    embed_dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = conv(self.embed_dim // 2, 1, name="conv_before_fft.0")(x)
        x = _lrelu(x)
        out = FourierUnit(self.embed_dim // 2, name="fu")(x)
        return conv(self.embed_dim, 1, name="conv_after_fft")(out + x)


class SpatialB(nn.Module):
    embed_dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = conv(self.embed_dim, 3, name="body.0")(x)
        y = _lrelu(y)
        y = conv(self.embed_dim, 3, name="body.2")(y)
        return y + x


class SFB(nn.Module):
    """Spatial branch || spectral branch -> concat -> 1x1 fuse (``swinfir.py:68-80``)."""

    embed_dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        s = SpatialB(self.embed_dim, name="S")(x)
        f = SpectralTransform(self.embed_dim, name="F")(x)
        return conv(self.embed_dim, 1, name="fusion")(jnp.concatenate([s, f], axis=-1))


class SwinFIR(SwinIR):
    @classmethod
    def from_pretrained(cls, *args, **kwargs) -> "SwinFIR":
        """No public SwinFIR release checkpoints exist. The reference
        inherits SwinIR.from_pretrained, which hardcodes ``SwinIR(**config)``
        (reference ``swinir.py:429``) and so silently hands back a plain
        SwinIR; inheriting OUR builder would instead produce a SwinFIR whose
        SFB parameters stay zero-initialized (strict=False load) — a model
        that runs but upscales garbage. Fail loudly instead."""
        raise NotImplementedError(
            "SwinFIR has no published pretrained checkpoints. Train one with "
            "studiosr_tpu.Trainer (SwinFIR.build().get_training_config()), or "
            "use SwinIR.from_pretrained for the release SwinIR weights."
        )

    @classmethod
    def build(
        cls,
        scale: int = 4,
        n_colors: int = 3,
        img_range: float = 1.0,
        embed_dim: int = 180,
        depths: Sequence[int] = (6, 6, 6, 6, 6, 6),
        num_heads: Sequence[int] = (6, 6, 6, 6, 6, 6),
        window_size: int = 8,
        mlp_ratio: float = 2.0,
        drop_rate: float = 0.0,
        drop_path_rate: float = 0.1,
        upsampler: str = "pixelshuffle",
        seed: int = 0,
        fast_init: bool = False,
    ) -> "SwinFIR":
        model = super().build(
            scale=scale,
            n_colors=n_colors,
            img_range=img_range,
            embed_dim=embed_dim,
            depths=depths,
            num_heads=num_heads,
            window_size=window_size,
            mlp_ratio=mlp_ratio,
            drop_rate=drop_rate,
            drop_path_rate=drop_path_rate,
            upsampler=upsampler,
            seed=seed,
            fast_init=fast_init,
            resi_connection=SFB,
            conv_after_body=SFB,
        )
        model._training_config = dict(_TRAINING_CONFIG)
        return model


_TRAINING_CONFIG: Dict[str, Any] = dict(
    batch_size=32,
    learning_rate=0.0002,
    beta1=0.9,
    beta2=0.99,
    weight_decay=0.0,
    max_iters=500000,
    gamma=0.5,
    milestones=[250000, 400000, 450000, 475000],
    bfloat16=False,
)
