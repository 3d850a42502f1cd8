"""HAN — Holistic Attention Network (NHWC / JAX).

Capabilities of the reference ``studiosr/models/han.py``: the RCAN trunk plus
Layer Attention (LAM) over the stack of all 11 intermediate trunk outputs and
a Channel-Spatial Attention Module (CSAM, 3-D conv gate), fused by two convs.

TPU notes: the LAM bilinear form over 11 flattened feature maps is two
batched matmuls of shape (11, H*W*C) — MXU work; the feature "stack" is kept
as a single (B, 11, H, W, C) tensor so XLA can lay it out once instead of
re-concatenating per layer (the reference grows the stack with repeated
``torch.cat`` in the forward loop, ``han.py:94-99``).
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from studiosr_tpu.models.base import Model
from studiosr_tpu.models.blocks import Upsampler, conv, mean_shift
from studiosr_tpu.models.rcan import ResidualGroup

__all__ = ["HAN", "HANModule"]


class LAM(nn.Module):
    """Layer attention over the (B, N, H, W, C) trunk stack (``han.py:12-33``).

    energy[i,j] = <layer_i, layer_j> over all H*W*C elements; rows are
    softmaxed after the stabilizing ``rowmax - energy`` trick, then the stack
    is re-mixed by the attention matrix and blended by a learned gamma.
    """

    @nn.compact
    def __call__(self, stack: jnp.ndarray) -> jnp.ndarray:
        gamma = self.param("gamma", nn.initializers.zeros, (1,))
        b, n = stack.shape[:2]
        flat = stack.reshape(b, n, -1)
        energy = jnp.einsum("bnd,bmd->bnm", flat, flat)
        energy = jnp.max(energy, axis=-1, keepdims=True) - energy
        attention = jax.nn.softmax(energy, axis=-1)
        out = jnp.einsum("bnm,bmd->bnd", attention, flat).reshape(stack.shape)
        return gamma * out + stack


# How CSAM's 3-D conv is computed (three formulations, all measured, v5e):
#   "conv3d"  — XLA's native 3-D conv lowering of the 1-in/1-out-channel
#               volume conv: cannot use the MXU, pays two full volume
#               transposes; 6.69 ms standalone (exp_csam_micro.py).
#   "stencil" — 27 shifted scalar FMAs in native NHWC (channel shifts as 2
#               lane pad+slices); 0.92 ms standalone but in-context ablation
#               attributes ~45 ms to it (100.2 full vs 55.5 without CSAM,
#               exp_han_ablate.py) — an XLA schedule-level interaction with
#               the trunk, not compute.
#   "banded"  — the same math as a STANDARD dense 3x3 2-D conv whose
#               (3, 3, C, C) weight is channel-banded: W[kh,kw,ci,co] =
#               k[co-ci+1,kh,kw] for |co-ci| <= 1 else 0. XLA sees a bog-
#               standard MXU conv (no pad/slice fusion patterns), at ~43x
#               the FLOPs (4.8 GFLOP at 256^2 — still ~25 us of MXU time).
CSAM_IMPL = "banded"


class _Conv3dStencil(nn.Module):
    """3x3x3 single-channel conv over (C, H, W) in native NHWC layout.

    Parameter tree (kernel (3,3,3,1,1), bias (1,)) is identical to
    ``nn.Conv`` for zoo-translation parity with the reference's Conv3d
    (``han.py:40``). See CSAM_IMPL above for the formulation choices."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # (B, H, W, C)
        kernel = self.param("kernel", nn.initializers.lecun_normal(), (3, 3, 3, 1, 1))
        bias = self.param("bias", nn.initializers.zeros, (1,))
        _, h, w, c = x.shape
        k = kernel[..., 0, 0].astype(x.dtype)
        # Conv spatial order is (C, H, W) over the (B, C, H, W, 1) volume:
        # out[h, w, c] = sum_{kc,kh,kw} kernel[kc,kh,kw] * x[h+kh-1, w+kw-1, c+kc-1].
        if CSAM_IMPL == "banded":
            # Fold the channel dimension of the volume kernel into a banded
            # (3, 3, C, C) dense-conv weight: the kc in {0,1,2} tap lands on
            # output channel co = ci + (kc - 1), i.e. the kc-th subdiagonal.
            band = jnp.stack([_diag_mask(c, kc - 1, x.dtype) for kc in range(3)])  # (3, C, C); [kc, ci, co]
            w2d = jnp.einsum("khw,kio->hwio", k, band)  # (3, 3, C, C)
            y = jax.lax.conv_general_dilated(
                x, w2d, window_strides=(1, 1), padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return y + bias.astype(x.dtype)
        # "stencil": H/W shifts are sublane-cheap; channel shifts move lanes,
        # so compute the 9-tap H/W stencil per channel offset first and shift
        # only the three partial sums (2 lane shifts instead of 18).
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        acc = None
        for kc in range(3):
            s = None
            for kh in range(3):
                for kw in range(3):
                    term = k[kc, kh, kw] * xp[:, kh : kh + h, kw : kw + w, :]
                    s = term if s is None else s + term
            if kc != 1:
                sp = jnp.pad(s, ((0, 0), (0, 0), (0, 0), (1, 1)))
                s = sp[..., kc : kc + c]
            acc = s if acc is None else acc + s
        return acc + bias.astype(x.dtype)


def _diag_mask(c: int, offset: int, dtype) -> jnp.ndarray:
    """(C, C) 0/1 mask with ones where ci == co + offset: the tap
    out[co] += k[kc] * x[co + kc - 1] lands on the (kc-1)-th subdiagonal."""
    i = jnp.arange(c)
    return (i[:, None] == i[None, :] + offset).astype(dtype)


class CSAM(nn.Module):
    """Channel-spatial attention: 3x3x3 conv gate over (C,H,W) (``han.py:36-53``)."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        gamma = self.param("gamma", nn.initializers.zeros, (1,))
        gate = _Conv3dStencil(name="conv")(x)
        gate = nn.sigmoid(gate) * gamma
        return x * gate + x


class HANModule(nn.Module):
    scale: int = 4
    n_colors: int = 3
    img_range: float = 1.0
    n_feats: int = 64
    n_resblocks: int = 20
    n_resgroups: int = 10
    reduction: int = 16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = mean_shift(x, self.img_range, sign=-1)
        x = conv(self.n_feats, 3, name="head.0")(x)

        res = x
        collected = []
        for g in range(self.n_resgroups):
            res = ResidualGroup(self.n_feats, 3, self.reduction, self.n_resblocks, name=f"body.{g}")(res)
            collected.append(res)
        res = conv(self.n_feats, 3, name=f"body.{self.n_resgroups}")(res)
        collected.append(res)

        # The reference prepends each new output, so the stack runs newest ->
        # oldest (han.py:94-99); preserved here for weight parity of the
        # 11C-channel fusion conv.
        stack = jnp.stack(collected[::-1], axis=1)  # (B, 11, H, W, C)
        out1 = res

        mixed = LAM(name="la")(stack)
        b, n, h, w, c = mixed.shape
        # Channel-concat in the reference's NCHW layout: layer-major order.
        mixed = mixed.transpose(0, 2, 3, 1, 4).reshape(b, h, w, n * c)
        out2 = conv(self.n_feats, 3, name="last_conv")(mixed)

        out1 = CSAM(name="csa")(out1)
        out = jnp.concatenate([out1, out2], axis=-1)
        res = conv(self.n_feats, 3, name="last")(out)
        res = res + x

        x = Upsampler(self.scale, self.n_feats, name="tail.0")(res)
        x = conv(self.n_colors, 3, name="tail.1")(x)
        return mean_shift(x, self.img_range, sign=1)


class HAN(Model):
    @classmethod
    def build(
        cls,
        scale: int = 4,
        n_colors: int = 3,
        img_range: float = 1.0,
        n_feats: int = 64,
        n_resblocks: int = 20,
        n_resgroups: int = 10,
        reduction: int = 16,
        seed: int = 0,
        fast_init: bool = False,
    ) -> "HAN":
        config = dict(
            scale=scale,
            n_colors=n_colors,
            img_range=img_range,
            n_feats=n_feats,
            n_resblocks=n_resblocks,
            n_resgroups=n_resgroups,
            reduction=reduction,
        )
        module = HANModule(**config)
        from studiosr_tpu.models.base import init_variables

        variables = init_variables(module, (1, 16, 16, n_colors), seed, fast=fast_init)
        return cls(module, variables, config, _TRAINING_CONFIG)

    @classmethod
    def from_pretrained(cls, scale: int = 4) -> "HAN":
        """HAN_BIX weights from Google Drive (``han.py:140-161``)."""
        from studiosr_tpu.zoo import fetch, load_torch_state_dict, translate_state_dict

        file_ids = {
            2: "12NhWDksOXiVnGw-Zbv6Y20J2DnRRKkJ2",
            3: "1bcos3CfYZ-qfSszxEnPohJaUFgVihOB_",
            4: "1f86ez0hgFLwe9hjhQogHpkACtYgfqrRi",
            8: "1Z5mYsASGKfn77ze25EjS8sUNAJ-KjzpO",
        }
        model = cls.build(scale=scale, img_range=255.0, fast_init=True)
        path = fetch(f"HAN_BIX{scale}.pt", gdrive_id=file_ids[scale])
        state = load_torch_state_dict(path)
        model.variables, _ = translate_state_dict(state, model.variables, strict=False)
        return model


_TRAINING_CONFIG: Dict[str, Any] = dict(
    batch_size=16,
    learning_rate=0.0001,
    beta1=0.9,
    beta2=0.99,
    weight_decay=0.0,
    max_iters=1000000,
    gamma=0.5,
    milestones=[200000, 400000, 600000, 800000],
)
