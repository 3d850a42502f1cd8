"""HAT — Hybrid Attention Transformer (NHWC / JAX).

Capabilities of the reference ``studiosr/models/hat.py``: 6 RHAG groups, each
a stack of HAB blocks (shifted-window attention + a parallel conv
channel-attention branch scaled by 0.01) capped by an Overlapping
Cross-Attention Block (OCAB, window 16 queries attending 24x24 overlapping
key/value windows), plus the Google-Drive ``params_ema`` zoo
(``hat.py:576-593``).

TPU-first notes:
* the overlapping kv windows (reference ``nn.Unfold``, ``hat.py:217-221``)
  are built from static row/col slices of the zero-padded feature map (no
  XLA gather; the training backward is pad+add instead of scatter) — no
  im2col materialization in HBM beyond the (nW, owin^2, 2C) window tensor;
* shift masks / relative-position tables are trace-time constants;
* all window batches feed the shared :func:`attention_core` backend.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from studiosr_tpu.models.base import FusedServingModel
from studiosr_tpu.models.blocks import DropPath, LayerNorm, Mlp, Normalizer, Upsampler, conv, gelu
from studiosr_tpu.models.swinir import WindowAttention
from studiosr_tpu.ops.attention import attention_core
from studiosr_tpu.ops.oca_vjp import oca_attention, oca_supported
from studiosr_tpu.ops.windows import (
    calculate_mask,
    pad_to_multiple_reflect,
    relative_position_index_oca,
    window_partition,
    window_reverse,
)

__all__ = ["HAT", "HATModule"]

# Experiment knobs (trace-time: re-jit after flipping, jit caches branches —
# CLAUDE.md session-2 lesson). Measured in scripts/exp_ocab_train_micro.py.
# OCAB_REMAT: wrap OCAB in nn.remat under fused training. The OCA custom VJP
#   already bounds the score memory; remat additionally recomputes the 2.25x
#   kv unfold + qkv dense + bias gather during the backward pass.
OCAB_REMAT = True
# Timing-only probes for the OCAB bias-table path: OCA_BIAS=False ablates the
# (heads, nq, nk) gather entirely; OCA_BIAS_GRAD=False stop-gradients it
# (kills the backward scatter-add into the (2209, heads) table).
OCA_BIAS = True
OCA_BIAS_GRAD = True


class ChannelAttentionHAT(nn.Module):
    """HAT's squeeze-excite variant with ``attention.{1,3}`` conv names
    (``hat.py:25-38``)."""

    num_feat: int
    squeeze_factor: int = 16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = jnp.mean(x, axis=(1, 2), keepdims=True)
        y = conv(self.num_feat // self.squeeze_factor, 1, name="attention.1")(y)
        y = nn.relu(y)
        y = conv(self.num_feat, 1, name="attention.3")(y)
        return x * nn.sigmoid(y)


class CAB(nn.Module):
    """conv-GELU-conv + channel attention branch (``hat.py:41-53``)."""

    num_feat: int
    compress_ratio: int = 3
    squeeze_factor: int = 30

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = conv(self.num_feat // self.compress_ratio, 3, name="cab.0")(x)
        y = gelu(y)
        y = conv(self.num_feat, 3, name="cab.2")(y)
        return ChannelAttentionHAT(self.num_feat, self.squeeze_factor, name="cab.3")(y)


class HAB(nn.Module):
    """Hybrid attention block: window MHA + 0.01-scaled CAB branch
    (``hat.py:113-196``).

    ``fused_train=True`` routes the attention and MLP halves through the
    custom-VJP fused blocks (same pattern as ``models/swinir.py``): the
    primal runs the Pallas serving kernels on TPU, the backward the
    validated flash-style recompute math — the plain autodiff backward
    materializes the (nW, heads, N, N) f32 score cotangents in HBM, at
    ws=16 4x larger than SwinIR's. The CAB branch stays plain autodiff
    (XLA convs differentiate cleanly). Parameter tree is identical."""

    dim: int
    num_heads: int
    window_size: int
    shift_size: int = 0
    mlp_ratio: float = 2.0
    compress_ratio: int = 3
    squeeze_factor: int = 30
    conv_scale: float = 0.01
    drop_path: float = 0.0
    fused_train: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        b, h, w, c = x.shape
        ws, ss = self.window_size, self.shift_size

        if self.fused_train:
            from studiosr_tpu.models.swinir import _AttnParams, _LayerNormParams, _MlpParams
            from studiosr_tpu.ops.attn_vjp import attention_map_vjp
            from studiosr_tpu.ops.pallas.mlp_vjp import mlp_block_dp_vjp
            from studiosr_tpu.ops.windows import relative_position_index

            from studiosr_tpu.ops.pallas.swin_block import _layernorm

            s1, b1 = _LayerNormParams(c, name="norm1")()
            # CAB consumes the same LN1 output (f32 stats, torch eps).
            ln = _layernorm(x.astype(jnp.float32), s1, b1).astype(x.dtype)
            conv_x = CAB(self.dim, self.compress_ratio, self.squeeze_factor, name="conv_block")(ln)

            table, wqkv, bqkv, wproj, bproj = _AttnParams(self.dim, ws, self.num_heads, name="attn")()
            rpi = relative_position_index(ws)
            bias = table[jnp.asarray(rpi.reshape(-1))].reshape(ws * ws, ws * ws, self.num_heads)
            bias = bias.transpose(2, 0, 1)
            mask = jnp.asarray(calculate_mask((h, w), ws, ss)) if ss > 0 else None

            if train and self.drop_path > 0.0:
                keep = 1.0 - self.drop_path
                bits = jax.random.bernoulli(self.make_rng("dropout"), keep, (b, 2))
                dp_scales = bits.astype(jnp.float32) / keep
            else:
                dp_scales = jnp.ones((b, 2), jnp.float32)

            attn_out = attention_map_vjp(
                x, s1, b1, wqkv, bqkv, wproj, bproj, bias, mask, dp_scales[:, 0],
                ss, self.num_heads, ws,
            )
            x = attn_out + conv_x * jnp.asarray(self.conv_scale, conv_x.dtype)

            s2, b2 = _LayerNormParams(c, name="norm2")()
            w1, bb1, w2, bb2 = _MlpParams(c, int(self.dim * self.mlp_ratio), name="mlp")()
            flat = x.reshape(b * h * w, c)
            y = mlp_block_dp_vjp(flat, s2, b2, w1, bb1, w2, bb2, dp_scales[:, 1], h * w)
            return y.reshape(b, h, w, c)

        shortcut = x
        x = LayerNorm(name="norm1")(x)
        conv_x = CAB(self.dim, self.compress_ratio, self.squeeze_factor, name="conv_block")(x)

        if ss > 0:
            shifted = jnp.roll(x, (-ss, -ss), axis=(1, 2))
            mask = calculate_mask((h, w), ws, ss)
        else:
            shifted, mask = x, None

        windows = window_partition(shifted, ws).reshape(-1, ws * ws, c)
        windows = WindowAttention(self.dim, ws, self.num_heads, name="attn")(windows, mask=mask)
        shifted = window_reverse(windows.reshape(-1, ws, ws, c), ws, h, w)
        attn_x = jnp.roll(shifted, (ss, ss), axis=(1, 2)) if ss > 0 else shifted

        x = shortcut + DropPath(self.drop_path)(attn_x, deterministic=not train) + conv_x * self.conv_scale
        y = Mlp(self.dim, int(self.dim * self.mlp_ratio), name="mlp")(LayerNorm(name="norm2")(x), train=train)
        return x + DropPath(self.drop_path)(y, deterministic=not train)


class OCAB(nn.Module):
    """Overlapping cross-attention block (``hat.py:198-293``).

    ``fused_train=True`` (memory-constrained training path) routes the
    cross-attention through the Pallas custom VJP (ops/oca_vjp.py): the
    (nW, heads, 256, 576) f32 score tensor — 1.7 GB at batch 32 — stays in
    VMEM per window in both directions. Layouts the kernel declines fall
    back to a checkpointed scan over window chunks."""

    dim: int
    num_heads: int
    window_size: int
    overlap_ratio: float
    mlp_ratio: float = 2.0
    fused_train: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        b, h, w, c = x.shape
        ws = self.window_size
        owin = int(ws * self.overlap_ratio) + ws
        pad = (owin - ws) // 2
        heads = self.num_heads
        d = c // heads

        shortcut = x
        x = LayerNorm(name="norm1")(x)

        qkv = nn.Dense(3 * c, name="qkv")(x)  # (B, H, W, 3C)
        q, kv = qkv[..., :c], qkv[..., c:]

        # Query windows: plain ws partition.
        q_windows = window_partition(q, ws).reshape(-1, ws * ws, c)

        # Key/value windows: overlapping owin x owin at stride ws, zero pad.
        # Built from STATIC slices (window i rows [i*ws, i*ws+owin) of the
        # padded map), not advanced indexing: an index-array gather lowers to
        # XLA gather and its training backward to scatter-add — measured as
        # the bulk of OCAB's 0.257 s/step overlap surcharge (STATUS.md
        # session 10). Slice backward is pad+add, which XLA fuses.
        kv_pad = jnp.pad(kv, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
        rows = jnp.stack(
            [kv_pad[:, i * ws : i * ws + owin] for i in range(h // ws)], axis=1
        )  # (B, nH, owin, Wp, 2C)
        gathered = jnp.stack(
            [rows[:, :, :, j * ws : j * ws + owin] for j in range(w // ws)], axis=3
        )  # (B, nH, owin, nW, owin, 2C)
        gathered = gathered.transpose(0, 1, 3, 2, 4, 5).reshape(-1, owin * owin, 2 * c)
        k_windows, v_windows = gathered[..., :c], gathered[..., c:]

        nq, nk = ws * ws, owin * owin
        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((ws + owin - 1) ** 2, heads),
        )
        rpi = relative_position_index_oca(ws, self.overlap_ratio)
        bias = table[jnp.asarray(rpi.reshape(-1))].reshape(nq, nk, heads).transpose(2, 0, 1)
        if not OCA_BIAS:  # timing probe (exp_ocab_train_micro.py)
            bias = jnp.zeros_like(bias)
        elif not OCA_BIAS_GRAD:  # timing probe
            bias = jax.lax.stop_gradient(bias)

        bw = q_windows.shape[0]
        qh = q_windows.reshape(bw, nq, heads, d).transpose(0, 2, 1, 3) * (d**-0.5)
        kh = k_windows.reshape(bw, nk, heads, d).transpose(0, 2, 1, 3)
        vh = v_windows.reshape(bw, nk, heads, d).transpose(0, 2, 1, 3)
        if self.fused_train and oca_supported(heads, nq, nk):
            # Pallas custom VJP: scores stay in VMEM both directions
            # (ops/oca_vjp.py; ~0.257 s/step of the plain-autodiff scan
            # removed from the HAT train step, exp_hat_train_ablate.py).
            out = oca_attention(qh, kh, vh, bias)
        elif self.fused_train and bw > 32:
            core = jax.checkpoint(lambda q, k, v: attention_core(q, k, v, bias=bias))

            def body(carry, args):
                return carry, core(*args)

            ck = max((m for m in range(1, 33) if bw % m == 0))
            shape = (bw // ck, ck, heads)
            _, outc = jax.lax.scan(
                body, None,
                (qh.reshape(*shape, nq, d), kh.reshape(*shape, nk, d), vh.reshape(*shape, nk, d)),
            )
            out = outc.reshape(bw, heads, nq, d)
        else:
            out = attention_core(qh, kh, vh, bias=bias)
        out = out.transpose(0, 2, 1, 3).reshape(bw, nq, c)

        x = window_reverse(out.reshape(-1, ws, ws, c), ws, h, w)
        x = nn.Dense(c, name="proj")(x) + shortcut
        y = Mlp(self.dim, int(self.dim * self.mlp_ratio), name="mlp")(LayerNorm(name="norm2")(x), train=train)
        return x + y


class RHAG(nn.Module):
    """Residual hybrid attention group: HABs + OCAB + conv (``hat.py:348-386``)."""

    dim: int
    depth: int
    num_heads: int
    window_size: int
    mlp_ratio: float
    compress_ratio: int
    squeeze_factor: int
    conv_scale: float
    overlap_ratio: float
    drop_path: Sequence[float] = ()
    fused_train: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        res = x
        for i in range(self.depth):
            res = HAB(
                dim=self.dim,
                num_heads=self.num_heads,
                window_size=self.window_size,
                shift_size=0 if i % 2 == 0 else self.window_size // 2,
                mlp_ratio=self.mlp_ratio,
                compress_ratio=self.compress_ratio,
                squeeze_factor=self.squeeze_factor,
                conv_scale=self.conv_scale,
                drop_path=self.drop_path[i] if self.drop_path else 0.0,
                fused_train=self.fused_train,
                name=f"residual_group.blocks.{i}",
            )(res, train=train)
        # Under fused training OCAB's attention core runs the Pallas custom
        # VJP (ops/oca_vjp.py) when the layout fits; remat the block anyway —
        # its gather intermediates (B, nH, owin, Wp, 2C) are still the
        # largest non-kernel residuals in the group.
        ocab_cls = nn.remat(OCAB, static_argnums=(2,)) if (self.fused_train and OCAB_REMAT) else OCAB
        res = ocab_cls(
            dim=self.dim,
            num_heads=self.num_heads,
            window_size=self.window_size,
            overlap_ratio=self.overlap_ratio,
            mlp_ratio=self.mlp_ratio,
            fused_train=self.fused_train,
            name="residual_group.overlap_attn",
        )(res, train)
        return conv(self.dim, 3, name="conv")(res) + x


class HATModule(nn.Module):
    scale: int = 4
    n_colors: int = 3
    img_range: float = 1.0
    embed_dim: int = 180
    depths: Tuple[int, ...] = (6, 6, 6, 6, 6, 6)
    num_heads: Tuple[int, ...] = (6, 6, 6, 6, 6, 6)
    window_size: int = 16
    mlp_ratio: float = 2.0
    drop_rate: float = 0.0
    drop_path_rate: float = 0.1
    compress_ratio: int = 3
    squeeze_factor: int = 30
    conv_scale: float = 0.01
    overlap_ratio: float = 0.5
    fused_train: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        h, w = x.shape[1:3]
        normalizer = Normalizer(self.img_range)

        x = pad_to_multiple_reflect(x, self.window_size)
        x = normalizer.normalize(x)

        x = conv(self.embed_dim, 3, name="conv_first")(x)
        shallow = x

        feats = LayerNorm(name="patch_embed.norm")(x)
        feats = nn.Dropout(self.drop_rate, deterministic=not train)(feats)
        dpr = np.linspace(0, self.drop_path_rate, sum(self.depths)).tolist()
        # Remat each RHAG in backward (see models/swinir.py): window 16 makes
        # the per-block attention-map residuals 4x larger than SwinIR's.
        # With fused_train the HAB custom VJPs recompute internally, so the
        # group-level remat is dropped (it would defeat them).
        rhag_cls = RHAG if self.fused_train else nn.remat(RHAG, static_argnums=(2,))
        for i, depth in enumerate(self.depths):
            start = sum(self.depths[:i])
            feats = rhag_cls(
                dim=self.embed_dim,
                depth=depth,
                num_heads=self.num_heads[i],
                window_size=self.window_size,
                mlp_ratio=self.mlp_ratio,
                compress_ratio=self.compress_ratio,
                squeeze_factor=self.squeeze_factor,
                conv_scale=self.conv_scale,
                overlap_ratio=self.overlap_ratio,
                drop_path=tuple(dpr[start : start + depth]),
                fused_train=self.fused_train,
                name=f"layers.{i}",
            )(feats, train)
        feats = LayerNorm(name="norm")(feats)

        x = conv(self.embed_dim, 3, name="conv_after_body")(feats) + shallow
        x = conv(64, 3, name="conv_before_upsample.0")(x)
        x = jax.nn.leaky_relu(x, 0.01)
        x = Upsampler(self.scale, 64, name="upsample")(x)
        x = conv(self.n_colors, 3, name="conv_last")(x)

        x = normalizer.unnormalize(x)
        return x[:, : h * self.scale, : w * self.scale, :]


class HAT(FusedServingModel):
    def _fused_fns(self):
        from studiosr_tpu.serving.hat_fast import hat_fast_forward, prepare_hat_serving

        return hat_fast_forward, prepare_hat_serving

    @classmethod
    def build(
        cls,
        scale: int = 4,
        n_colors: int = 3,
        img_range: float = 1.0,
        embed_dim: int = 180,
        depths: Sequence[int] = (6, 6, 6, 6, 6, 6),
        num_heads: Sequence[int] = (6, 6, 6, 6, 6, 6),
        window_size: int = 16,
        mlp_ratio: float = 2.0,
        drop_rate: float = 0.0,
        drop_path_rate: float = 0.1,
        compress_ratio: int = 3,
        squeeze_factor: int = 30,
        conv_scale: float = 0.01,
        overlap_ratio: float = 0.5,
        seed: int = 0,
        fast_init: bool = False,
    ) -> "HAT":
        config = dict(
            scale=scale,
            n_colors=n_colors,
            img_range=img_range,
            embed_dim=embed_dim,
            depths=list(depths),
            num_heads=list(num_heads),
            window_size=window_size,
            mlp_ratio=mlp_ratio,
            drop_rate=drop_rate,
            drop_path_rate=drop_path_rate,
            compress_ratio=compress_ratio,
            squeeze_factor=squeeze_factor,
            conv_scale=conv_scale,
            overlap_ratio=overlap_ratio,
        )
        module = HATModule(**{**config, "depths": tuple(depths), "num_heads": tuple(num_heads)})
        from studiosr_tpu.models.base import init_variables

        size = window_size
        variables = init_variables(module, (1, size, size, n_colors), seed, fast=fast_init)
        return cls(module, variables, config, _TRAINING_CONFIG)

    @classmethod
    def from_pretrained(cls, scale: int = 4) -> "HAT":
        """HAT_SRx checkpoints, ``params_ema`` key (``hat.py:576-593``)."""
        from studiosr_tpu.zoo import fetch, load_torch_state_dict, translate_state_dict

        file_ids = {
            2: "1M2HZD6i9ZNpsJR-dKKBjlzL_AXntCvGR",
            3: "1dWG4X_6VUSi1hhIwX0zEwddWI9M0tFmI",
            4: "1pdhaO1fJq3tgSqDIbymdDiGxu4S0nqVq",
        }
        model = cls.build(scale=scale, fast_init=True)
        path = fetch(f"HAT_SRx{scale}.pth", gdrive_id=file_ids[scale])
        state = load_torch_state_dict(path, key="params_ema")
        model.variables, _ = translate_state_dict(state, model.variables)
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
)
