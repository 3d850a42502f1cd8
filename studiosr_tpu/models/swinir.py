"""SwinIR — shifted-window transformer SR (NHWC / JAX).

Capabilities of the reference ``studiosr/models/swinir.py``: conv_first ->
6 RSTB groups (each 6 Swin blocks + conv + residual) -> conv_after_body ->
PixelShuffle upsampler; classical ("pixelshuffle") and lightweight
("pixelshuffledirect") variants; reflect padding in training vs flip-concat
padding at eval (``swinir.py:356``, ``swinir.py:249-255``); the
JingyunLiang/SwinIR release zoo (``swinir.py:404-445``).

TPU-first differences from the reference:
* the shift mask and relative-position index are trace-time numpy constants
  (the reference rebuilds the mask on device every block forward,
  ``swinir.py:161``);
* windows stay in (B*nW, heads, N, d) batched layout feeding
  :func:`studiosr_tpu.ops.attention.attention_core` (XLA-fused or Pallas);
* layout is NHWC throughout — the reference's NCHW<->NHWC permutes around
  each RSTB conv disappear.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from studiosr_tpu.models.base import FusedServingModel
from studiosr_tpu.models.blocks import DropPath, LayerNorm, Mlp, Normalizer, Upsampler, conv
from studiosr_tpu.ops.attention import attention_core
from studiosr_tpu.ops.windows import (
    calculate_mask,
    pad_to_multiple_flip,
    pad_to_multiple_reflect,
    relative_position_index,
    window_partition,
    window_reverse,
)

__all__ = ["SwinIR", "SwinIRModule", "WindowAttention", "SwinTransformerBlock", "RSTB"]


class WindowAttention(nn.Module):
    """Per-window MHA with learned relative-position bias (``swinir.py:35-105``)."""

    dim: int
    window_size: int
    num_heads: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[np.ndarray] = None) -> jnp.ndarray:
        b_, n, c = x.shape
        heads = self.num_heads
        d = c // heads

        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * self.window_size - 1) ** 2, heads),
        )
        rpi = relative_position_index(self.window_size)  # static numpy
        bias = table[jnp.asarray(rpi.reshape(-1))].reshape(n, n, heads)
        bias = bias.transpose(2, 0, 1)  # (heads, N, N)

        qkv = nn.Dense(3 * c, name="qkv")(x)
        qkv = qkv.reshape(b_, n, 3, heads, d).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        q = q * (d**-0.5)

        mask_arr = None if mask is None else jnp.asarray(mask)
        out = attention_core(q, k, v, bias=bias, mask=mask_arr)
        out = out.transpose(0, 2, 1, 3).reshape(b_, n, c)
        return nn.Dense(c, name="proj")(out)


class _DenseParams(nn.Module):
    """Declare a Dense layer's parameters (same names/inits as ``nn.Dense``)
    without applying it — the fused custom-VJP ops consume raw arrays."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(), (self.in_features, self.features))
        b = self.param("bias", nn.initializers.zeros_init(), (self.features,))
        return k, b


class _LayerNormParams(nn.Module):
    features: int

    @nn.compact
    def __call__(self):
        s = self.param("scale", nn.initializers.ones_init(), (self.features,))
        b = self.param("bias", nn.initializers.zeros_init(), (self.features,))
        return s, b


class _AttnParams(nn.Module):
    """Parameter tree of :class:`WindowAttention` (same paths/inits)."""

    dim: int
    window_size: int
    num_heads: int

    @nn.compact
    def __call__(self):
        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * self.window_size - 1) ** 2, self.num_heads),
        )
        wqkv, bqkv = _DenseParams(self.dim, 3 * self.dim, name="qkv")()
        wproj, bproj = _DenseParams(self.dim, self.dim, name="proj")()
        return table, wqkv, bqkv, wproj, bproj


class _MlpParams(nn.Module):
    in_features: int
    hidden_features: int

    @nn.compact
    def __call__(self):
        w1, b1 = _DenseParams(self.in_features, self.hidden_features, name="fc1")()
        w2, b2 = _DenseParams(self.hidden_features, self.in_features, name="fc2")()
        return w1, b1, w2, b2


class SwinTransformerBlock(nn.Module):
    """LN -> (shifted) window attention -> LN -> MLP, both residual
    (``swinir.py:108-174``). Operates on (B, H, W, C).

    ``fused_train=True`` switches to the custom-VJP fused blocks
    (ops/attn_vjp.py, ops/pallas/mlp_vjp.py): same parameter tree, Pallas
    forward on TPU, hand-written flash-style backward. Requires drop==0
    (the reference training recipes use no dropout); drop-path is applied
    post-hoc on the residual delta, which is exact because both halves are
    residual."""

    dim: int
    num_heads: int
    window_size: int
    shift_size: int = 0
    mlp_ratio: float = 4.0
    drop: float = 0.0
    drop_path: float = 0.0
    fused_train: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        b, h, w, c = x.shape
        ws, ss = self.window_size, self.shift_size

        if self.fused_train:
            if self.drop:
                raise NotImplementedError("fused_train requires drop==0")
            s1, b1 = _LayerNormParams(c, name="norm1")()
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

            s2, b2 = _LayerNormParams(c, name="norm2")()
            w1, bb1, w2, bb2 = _MlpParams(c, int(self.dim * self.mlp_ratio), name="mlp")()
            # Whole-block training VJP (scripts/experiments/swin_vjp.py) was
            # measured SLOWER than the split VJPs (0.92 vs 0.86 s/step) —
            # the split attn/MLP custom-VJP granularity is the keeper.
            from studiosr_tpu.ops.attn_vjp import attention_map_vjp
            from studiosr_tpu.ops.pallas.mlp_vjp import mlp_block_dp_vjp

            # per-sample stochastic-depth scales folded INTO the kernels (the
            # XLA delta-scaling costs ~3 full-map passes per half).
            x = attention_map_vjp(
                x, s1, b1, wqkv, bqkv, wproj, bproj, bias, mask, dp_scales[:, 0],
                ss, self.num_heads, ws,
            )
            flat = x.reshape(b * h * w, c)
            y = mlp_block_dp_vjp(flat, s2, b2, w1, bb1, w2, bb2, dp_scales[:, 1], h * w)
            return y.reshape(b, h, w, c)

        shortcut = x
        x = LayerNorm(name="norm1")(x)

        if ss > 0:
            x = jnp.roll(x, (-ss, -ss), axis=(1, 2))
            mask = calculate_mask((h, w), ws, ss)
        else:
            mask = None

        windows = window_partition(x, ws).reshape(-1, ws * ws, c)
        windows = WindowAttention(self.dim, ws, self.num_heads, name="attn")(windows, mask=mask)
        x = window_reverse(windows.reshape(-1, ws, ws, c), ws, h, w)

        if ss > 0:
            x = jnp.roll(x, (ss, ss), axis=(1, 2))

        x = shortcut + DropPath(self.drop_path)(x, deterministic=not train)
        y = Mlp(self.dim, int(self.dim * self.mlp_ratio), drop=self.drop, name="mlp")(
            LayerNorm(name="norm2")(x), train=train
        )
        return x + DropPath(self.drop_path)(y, deterministic=not train)


class RSTB(nn.Module):
    """Residual Swin Transformer Block group (``swinir.py:216-247``)."""

    dim: int
    depth: int
    num_heads: int
    window_size: int
    mlp_ratio: float = 4.0
    drop: float = 0.0
    drop_path: Sequence[float] = ()
    resi_connection: Optional[Callable[..., nn.Module]] = None
    fused_train: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        res = x
        for i in range(self.depth):
            res = SwinTransformerBlock(
                dim=self.dim,
                num_heads=self.num_heads,
                window_size=self.window_size,
                shift_size=0 if i % 2 == 0 else self.window_size // 2,
                mlp_ratio=self.mlp_ratio,
                drop=self.drop,
                drop_path=self.drop_path[i] if self.drop_path else 0.0,
                fused_train=self.fused_train,
                name=f"residual_group.blocks.{i}",
            )(res, train=train)
        if self.resi_connection is not None:
            res = self.resi_connection(self.dim, name="conv")(res)
        else:
            res = conv(self.dim, 3, name="conv")(res)
        return res + x


class SwinIRModule(nn.Module):
    scale: int = 4
    n_colors: int = 3
    img_range: float = 1.0
    embed_dim: int = 180
    depths: Tuple[int, ...] = (6, 6, 6, 6, 6, 6)
    num_heads: Tuple[int, ...] = (6, 6, 6, 6, 6, 6)
    window_size: int = 8
    mlp_ratio: float = 2.0
    drop_rate: float = 0.0
    drop_path_rate: float = 0.1
    upsampler: str = "pixelshuffle"
    resi_connection: Optional[Callable[..., nn.Module]] = None
    conv_after_body: Optional[Callable[..., nn.Module]] = None
    # Route transformer blocks through the fused custom-VJP kernels when
    # training (ops/attn_vjp.py, ops/pallas/mlp_vjp.py). The custom VJPs
    # rematerialize internally (residual = block input only), so the outer
    # per-RSTB remat is skipped.
    fused_train: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        h, w = x.shape[1:3]
        normalizer = Normalizer(self.img_range)

        pad = pad_to_multiple_reflect if train else pad_to_multiple_flip
        x = pad(x, self.window_size)
        x = normalizer.normalize(x)

        x = conv(self.embed_dim, 3, name="conv_first")(x)
        shallow = x

        # forward_features: LN in, RSTB stack, LN out (swinir.py:342-351).
        feats = LayerNorm(name="patch_embed.norm")(x)
        feats = nn.Dropout(self.drop_rate, deterministic=not train)(feats)
        dpr = np.linspace(0, self.drop_path_rate, sum(self.depths)).tolist()
        # Rematerialize each RSTB in the backward pass: the per-block f32
        # attention maps would otherwise dominate HBM as saved residuals
        # (36 x ~100s of MB at training shapes). Free at inference. With
        # fused_train the custom VJPs recompute internally, so the outer
        # remat would only double the recompute.
        rstb_cls = RSTB if self.fused_train else nn.remat(RSTB, static_argnums=(2,))
        for i, depth in enumerate(self.depths):
            start = sum(self.depths[:i])
            feats = rstb_cls(
                dim=self.embed_dim,
                depth=depth,
                num_heads=self.num_heads[i],
                window_size=self.window_size,
                mlp_ratio=self.mlp_ratio,
                drop=self.drop_rate,
                drop_path=tuple(dpr[start : start + depth]),
                resi_connection=self.resi_connection,
                fused_train=self.fused_train,
                name=f"layers.{i}",
            )(feats, train)
        feats = LayerNorm(name="norm")(feats)

        if self.conv_after_body is not None:
            x = self.conv_after_body(self.embed_dim, name="conv_after_body")(feats) + shallow
        else:
            x = conv(self.embed_dim, 3, name="conv_after_body")(feats) + shallow

        if self.upsampler == "pixelshuffle":
            x = conv(64, 3, name="conv_before_upsample.0")(x)
            x = jax.nn.leaky_relu(x, 0.01)
            x = Upsampler(self.scale, 64, name="upsample")(x)
            x = conv(self.n_colors, 3, name="conv_last")(x)
        elif self.upsampler == "pixelshuffledirect":
            x = Upsampler(self.scale, self.embed_dim, num_out_ch=self.n_colors, name="upsample")(x)
        else:
            raise ValueError(f"unknown upsampler: {self.upsampler}")

        x = normalizer.unnormalize(x)
        return x[:, : h * self.scale, : w * self.scale, :]


class SwinIR(FusedServingModel):
    def _fused_fns(self):
        from studiosr_tpu.serving import prepare_serving, swinir_fast_forward

        return swinir_fast_forward, prepare_serving

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
        _module_cls=None,
        **extra,
    ) -> "SwinIR":
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
            upsampler=upsampler,
        )
        module_cls = _module_cls or SwinIRModule
        module = module_cls(
            **{**config, "depths": tuple(depths), "num_heads": tuple(num_heads)}, **extra
        )
        size = 2 * window_size
        if fast_init:
            from studiosr_tpu.models.base import fast_init_variables

            variables = fast_init_variables(module, (1, size, size, n_colors), seed)
        else:
            variables = module.init(
                jax.random.PRNGKey(seed), jnp.zeros((1, size, size, n_colors), jnp.float32)
            )
        return cls(module, variables, config, _TRAINING_CONFIG)

    @classmethod
    def from_pretrained(
        cls,
        scale: int = 4,
        light: bool = False,
        dataset: str = "DF2K",
        pretrained: bool = True,
    ) -> "SwinIR":
        """JingyunLiang/SwinIR release checkpoints (``swinir.py:404-445``)."""
        assert scale in [2, 3, 4, 8]
        assert dataset in ["DIV2K", "DF2K"]

        config: Dict[str, Any] = {"scale": scale}
        img_size = 64 if dataset == "DF2K" else 48
        task, label = "001_classicalSR", "M"
        if light:
            config.update(depths=[6, 6, 6, 6], embed_dim=60, num_heads=[6, 6, 6, 6], upsampler="pixelshuffledirect")
            task, dataset, img_size, label = "002_lightweightSR", "DIV2K", 64, "S"

        # fast_init: every parameter is covered by the release checkpoints, so
        # skip the expensive real init (values are fully overwritten).
        model = cls.build(**config, fast_init=bool(pretrained))
        if pretrained:
            from studiosr_tpu.zoo import fetch, load_torch_state_dict, translate_state_dict

            file_name = f"{task}_{dataset}_s{img_size}w8_SwinIR-{label}_x{scale}.pth"
            path = fetch(file_name, url=f"https://github.com/JingyunLiang/SwinIR/releases/download/v0.0/{file_name}")
            state = load_torch_state_dict(path, key="auto")
            model.variables, report = translate_state_dict(state, model.variables, strict=False)
            if report.missing:
                print(f"warning: {len(report.missing)} parameters missing from checkpoint: {report.missing[:5]} ...")
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
