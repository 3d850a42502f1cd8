"""MaxSR — MaxViT-style SR: MBConv + block attention + grid attention.

Capabilities of the reference ``studiosr/models/maxsr.py``: conv stem, 4
stages of (MBConv -> block attention -> grid attention), hierarchical feature
fusion (HFFB) over the concatenated stage outputs, PixelShuffle upsampling.
Both the static-window mode (``adaptive=False``: fixed 8x8 windows, trained
relative-position embeddings) and the adaptive mode (``adaptive=True``:
window size = ceil(sqrt(H)) x ceil(sqrt(W)) per input) are provided.

Parity note: the reference's adaptive attention constructs a *fresh,
untrained* ``nn.Embedding`` relative-position bias inside every forward
(``maxsr.py:258``), making its output nondeterministic. We replace that with
a deterministic zero bias; static mode is bit-parity tested instead
(SURVEY.md §7 step 5).

TPU notes: block/grid partitions are reshape/transposes; the depthwise MBConv
conv lowers to a TPU depthwise convolution; adaptive mode re-specializes the
jit per input shape (inherent to shape-dependent windows).
"""

from __future__ import annotations

import math
import os
from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from studiosr_tpu.models.base import Model
from studiosr_tpu.models.blocks import BatchNorm, LayerNorm, Normalizer, conv, gelu
from studiosr_tpu.ops.attention import attention_core
from studiosr_tpu.ops.pixel_shuffle import pixel_shuffle
from studiosr_tpu.ops.windows import relative_position_index

__all__ = ["MaxSR", "MaxSRModule"]

# Timing-only trace knob (scripts/exp_maxsr_ablate.py): True drops the static
# rel-pos bias gather+add entirely (wrong math) — bounds what a load-time
# pre-gathered bias table could save per forward. Re-jit after flipping.
ABLATE_BIAS = False

# MBConv-internal dissection knobs (timing-only, wrong math): subset of
# {"dw", "expand", "project", "bn"} — each drops that stage, shapes kept.
# Guarded: honored only under STUDIOSR_EXPERIMENTAL_ABLATIONS=1 (ADVICE r4 —
# "expand"/"project" silently remove fn.0/fn.7 from the parameter tree, so a
# checkpoint saved under an ablation is incompatible with production builds).
MBCONV_ABLATE: frozenset = frozenset()


def _mbconv_ablate() -> frozenset:
    if MBCONV_ABLATE and os.environ.get("STUDIOSR_EXPERIMENTAL_ABLATIONS", "0") in ("", "0"):
        raise RuntimeError(
            "MBCONV_ABLATE is a timing-only dissection knob that changes the "
            "parameter tree; set STUDIOSR_EXPERIMENTAL_ABLATIONS=1 to use it "
            "in an explicitly experimental build (scripts/exp_maxsr_ablate.py)."
        )
    return MBCONV_ABLATE

# Depthwise-conv implementation (exact same math both ways):
#   "depthwise"  — XLA grouped conv (feature_group_count=hidden);
#   "diag_dense" — dense 3x3 conv whose weight is the depthwise kernel on
#                  the channel diagonal (W[kh,kw,ci,co] = k[kh,kw,0,co] if
#                  ci==co else 0). The HAN banded-CSAM playbook: XLA sees a
#                  standard MXU conv instead of a VPU-bound depthwise
#                  lowering. Parameter tree identical.
DW_IMPL = "depthwise"

# Serving-route knob: True routes enable_fused serving through the
# map-level fused blocks (the fused_train primals). Measured 199.6 ms vs
# 103.9 at the 256x256 x4 sweep shape (round 4) — the adaptive re-basing
# and grid-shuffle passes lose more than the fusion saves; OFF by default.
MAP_FUSED_SERVING = False

# True routes the serving feed-forward (PreNorm MLP on tokens) through the
# fused MLP Pallas kernel while keeping the token-path attention route.
# Measured 226.4 ms vs the unchanged route's 95.7 in the same session
# (round 4) — decisively worse at MaxSR's (B', 64, 128) token shapes; OFF.
FF_FUSED_SERVING = False


class SqueezeExcitation(nn.Module):
    """Mean-pool gate with two bias-free Dense layers (``maxsr.py:58-73``)."""

    dim: int
    shrinkage_rate: float = 0.25

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        hidden = int(self.dim * self.shrinkage_rate)
        g = jnp.mean(x, axis=(1, 2))
        g = nn.Dense(hidden, use_bias=False, name="gate.1")(g)
        g = nn.silu(g)
        g = nn.Dense(self.dim, use_bias=False, name="gate.3")(g)
        g = nn.sigmoid(g)
        return x * g[:, None, None, :]


class _DWDiagDense(nn.Module):
    """Depthwise 3x3 conv computed as a dense MXU conv with the kernel on
    the channel diagonal — exact same math and parameter tree as the
    grouped conv (kernel (3,3,1,C), bias (C,)), but XLA sees a standard
    conv instead of the depthwise lowering. HAN's banded-CSAM trick
    (models/han.py); A/B'd via ``DW_IMPL`` in exp_maxsr_ablate.py."""

    hidden: int

    @nn.compact
    def __call__(self, y: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (3, 3, 1, self.hidden)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.hidden,))
        eye = jnp.eye(self.hidden, dtype=kernel.dtype)
        wd = kernel[:, :, 0, None, :] * eye[None, None]
        out = jax.lax.conv_general_dilated(
            y,
            wd.astype(y.dtype),
            (1, 1),
            [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return out + bias.astype(y.dtype)


class MBConv(nn.Module):
    """Inverted-bottleneck conv with SE gate and residual (``maxsr.py:103-122``).

    Sequential names follow the torch layout: 0 expand conv, 1 BN, 3
    depthwise conv, 4 BN, 6 SE, 7 project conv, 8 BN; under ``fn.`` when
    wrapped in the residual (always true here: uniform dims, no downsample).
    """

    dim: int
    expansion_rate: float = 4
    shrinkage_rate: float = 0.25
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        hidden = int(self.expansion_rate * self.dim)
        ab = _mbconv_ablate()
        if "expand" in ab:  # timing-only: shape-preserving no-dot stand-in
            y = jnp.tile(x, (1, 1, 1, hidden // x.shape[-1]))
        else:
            y = conv(hidden, 1, name="fn.0")(x)
        if "bn" not in ab:
            y = BatchNorm(use_running_average=not train, name="fn.1")(y)
        y = gelu(y)
        if "dw" not in ab:
            if DW_IMPL == "diag_dense":
                y = _DWDiagDense(hidden, name="fn.3")(y)
            else:
                y = conv(hidden, 3, feature_group_count=hidden, name="fn.3")(y)
        if "bn" not in ab:
            y = BatchNorm(use_running_average=not train, name="fn.4")(y)
        y = gelu(y)
        y = SqueezeExcitation(hidden, self.shrinkage_rate, name="fn.6")(y)
        if "project" in ab:
            y = y[..., : self.dim]
        else:
            y = conv(self.dim, 1, name="fn.7")(y)
        if "bn" not in ab:
            y = BatchNorm(use_running_average=not train, name="fn.8")(y)
        if train and self.dropout > 0.0:
            # Dropsample: per-sample stochastic residual drop (``maxsr.py:76-90``).
            keep = 1.0 - self.dropout
            mask = jax.random.bernoulli(self.make_rng("dropout"), keep, (y.shape[0], 1, 1, 1))
            y = y * mask.astype(y.dtype) / keep
        return y + x


def _block_partition(x: jnp.ndarray, wh: int, ww: int) -> Tuple[jnp.ndarray, Tuple[int, int]]:
    """'b (x w1) (y w2) c -> (b x y) (w1 w2) c' — contiguous blocks."""
    b, h, w, c = x.shape
    nx, ny = h // wh, w // ww
    x = x.reshape(b, nx, wh, ny, ww, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b * nx * ny, wh * ww, c), (nx, ny)


def _block_reverse(x: jnp.ndarray, grid: Tuple[int, int], wh: int, ww: int) -> jnp.ndarray:
    nx, ny = grid
    bxy, _, c = x.shape
    b = bxy // (nx * ny)
    x = x.reshape(b, nx, ny, wh, ww, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, nx * wh, ny * ww, c)


def _grid_partition(x: jnp.ndarray, wh: int, ww: int) -> Tuple[jnp.ndarray, Tuple[int, int]]:
    """'b (w1 x) (w2 y) c -> (b x y) (w1 w2) c' — strided grid tokens."""
    b, h, w, c = x.shape
    nx, ny = h // wh, w // ww
    x = x.reshape(b, wh, nx, ww, ny, c).transpose(0, 2, 4, 1, 3, 5)
    return x.reshape(b * nx * ny, wh * ww, c), (nx, ny)


def _grid_reverse(x: jnp.ndarray, grid: Tuple[int, int], wh: int, ww: int) -> jnp.ndarray:
    nx, ny = grid
    bxy, _, c = x.shape
    b = bxy // (nx * ny)
    x = x.reshape(b, nx, ny, wh, ww, c).transpose(0, 3, 1, 4, 2, 5)
    return x.reshape(b, wh * nx, ww * ny, c)


class _Attention(nn.Module):
    """Window attention over flattened (B', N, C) tokens.

    ``static=True`` uses the trained rel-pos embedding table
    (``maxsr.py:125-196``); adaptive mode uses a zero bias (see module
    docstring) and an extra input LayerNorm like ``Adaptive_Attention``
    (``maxsr.py:198-279``).
    """

    dim: int
    dim_head: int
    window_size: int = 0  # static mode only
    static: bool = True
    fused: bool = False  # route the score/softmax/AV chain through Pallas

    @nn.compact
    def __call__(self, tokens: jnp.ndarray) -> jnp.ndarray:
        b_, n, c = tokens.shape
        heads = self.dim // self.dim_head
        d = self.dim_head

        if not self.static:
            tokens = LayerNorm(name="norm")(tokens)

        qkv = nn.Dense(3 * self.dim, use_bias=False, name="to_qkv")(tokens)
        qkv = qkv.reshape(b_, n, 3, heads, d).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0] * (d**-0.5), qkv[1], qkv[2]

        bias = None
        if self.static:
            table = nn.Embed((2 * self.window_size - 1) ** 2, heads, name="rel_pos_bias")
            if not ABLATE_BIAS:
                rpi = relative_position_index(self.window_size)
                bias = table(jnp.asarray(rpi)).transpose(2, 0, 1)

        out = None
        if self.fused:
            # Fused VMEM-resident scores (ops/pallas/window_attn.py): the XLA
            # path materializes the (B', heads, N, N) f32 score tensor in HBM
            # for every one of MaxSR's 32 attention pairs.
            from studiosr_tpu.ops.pallas.window_attn import window_attention_pallas

            out = window_attention_pallas(q, k, v, bias=bias)
        if out is None:
            out = attention_core(q, k, v, bias=bias)
        out = out.transpose(0, 2, 1, 3).reshape(b_, n, c)
        return nn.Dense(self.dim, use_bias=False, name="to_out.0")(out)


class _FeedForward(nn.Module):
    dim: int
    mult: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.dim * self.mult, name="net.0")(x)
        x = gelu(x)
        return nn.Dense(self.dim, name="net.3")(x)


def _shuffle_grid(x: jnp.ndarray, wh: int, ww: int) -> jnp.ndarray:
    """Spatial perfect-shuffle making grid partition a block partition:
    ``_grid_partition(x) == _block_partition(_shuffle_grid(x))``. A pure
    permutation (two XLA transposes), so grid attention can ride the same
    map-level fused custom-VJP block as block attention."""
    b, h, w, c = x.shape
    nx, ny = h // wh, w // ww
    x = x.reshape(b, wh, nx, w, c).transpose(0, 2, 1, 3, 4).reshape(b, h, w, c)
    return x.reshape(b, h, ww, ny, c).transpose(0, 1, 3, 2, 4).reshape(b, h, w, c)


def _unshuffle_grid(x: jnp.ndarray, wh: int, ww: int) -> jnp.ndarray:
    """Inverse of :func:`_shuffle_grid`."""
    b, h, w, c = x.shape
    nx, ny = h // wh, w // ww
    x = x.reshape(b, nx, wh, w, c).transpose(0, 2, 1, 3, 4).reshape(b, h, w, c)
    return x.reshape(b, h, ny, ww, c).transpose(0, 1, 3, 2, 4).reshape(b, h, w, c)


class _DenseKernelParam(nn.Module):
    """Declare a bias-free ``nn.Dense``'s kernel (same name/init) without
    applying it — the fused custom-VJP ops consume raw arrays."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self) -> jnp.ndarray:
        return self.param("kernel", nn.initializers.lecun_normal(), (self.in_features, self.features))


class _AttnRawParams(nn.Module):
    """Parameter tree of :class:`_Attention` (identical paths/inits) returned
    as raw arrays for the fused-training custom VJP."""

    dim: int
    dim_head: int
    window_size: int
    static: bool

    @nn.compact
    def __call__(self):
        from studiosr_tpu.models.swinir import _LayerNormParams

        heads = self.dim // self.dim_head
        s_in = b_in = None
        if not self.static:
            s_in, b_in = _LayerNormParams(self.dim, name="norm")()
        wqkv = _DenseKernelParam(self.dim, 3 * self.dim, name="to_qkv")()
        bias = None
        if self.static:
            table = nn.Embed((2 * self.window_size - 1) ** 2, heads, name="rel_pos_bias")
            rpi = relative_position_index(self.window_size)
            bias = table(jnp.asarray(rpi)).transpose(2, 0, 1)
        wproj = _DenseKernelParam(self.dim, self.dim, name="to_out.0")()
        return s_in, b_in, wqkv, bias, wproj


class _FFRawParams(nn.Module):
    """Parameter tree of :class:`_FeedForward` (identical paths/inits)."""

    dim: int
    mult: int = 4

    @nn.compact
    def __call__(self):
        from studiosr_tpu.models.swinir import _DenseParams

        w1, b1 = _DenseParams(self.dim, self.dim * self.mult, name="net.0")()
        w2, b2 = _DenseParams(self.dim * self.mult, self.dim, name="net.3")()
        return w1, b1, w2, b2


class _AttentionPair(nn.Module):
    """PreNorm attention + PreNorm feed-forward on partitioned tokens.

    ``prefix_attn``/``prefix_ff`` carry the torch Sequential naming, which
    differs between the static (``stages.s.d.1.{1,2}``) and adaptive
    (``stages.s.i.{attention,feedforward}``) layouts.

    ``fused_train=True`` routes both halves through the custom-VJP fused
    blocks (ops/attn_vjp.py, ops/pallas/mlp_vjp.py — the SwinIR/HAT
    pattern): identical parameter tree, Pallas forward + one-pass Pallas
    backward on TPU, flash-style recompute (no (B', heads, N, N) f32
    score residuals or cotangents in HBM). Block attention maps directly
    onto the window kernels; grid attention becomes block attention of a
    perfect-shuffle permuted map (:func:`_shuffle_grid`); adaptive mode's
    extra inner LayerNorm is handled by running the outer LN in plain XLA
    and re-basing the fused block's residual (exact in f32)."""

    dim: int
    dim_head: int
    window_size: int
    static: bool
    grid: bool
    fused: bool = False
    fused_train: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, wh: int, ww: int) -> jnp.ndarray:
        attn_name = "1" if self.static else "attention"
        ff_name = "2" if self.static else "feedforward"

        # Map-level fused path: attention (LN+qkv+scores+AV+proj, one VMEM
        # pass) + fused MLP kernel — the fused TRAINING route (custom VJPs).
        # MEASURED NOT A SERVING WIN (round 4): routing serving through it
        # read 199.6 ms vs 103.9 at the sweep shape — the adaptive mode's
        # re-basing passes and the grid-shuffle transposes cost more than
        # the LN/qkv/proj fusion saves (MAP_FUSED_SERVING knob to re-probe).
        if (self.fused_train or (self.fused and MAP_FUSED_SERVING)) and wh == ww:
            from studiosr_tpu.models.swinir import _LayerNormParams
            from studiosr_tpu.ops.attn_vjp import attention_map_vjp
            from studiosr_tpu.ops.pallas.mlp_vjp import mlp_block_vjp

            b, h, w, c = x.shape
            heads = self.dim // self.dim_head
            ws = wh
            s1, b1 = _LayerNormParams(c, name=f"{attn_name}.norm")()
            s_in, b_in, wqkv, bias, wproj = _AttnRawParams(
                self.dim, self.dim_head, self.window_size, self.static, name=f"{attn_name}.fn"
            )()
            s2, b2 = _LayerNormParams(c, name=f"{ff_name}.norm")()
            w1, fb1, w2, fb2 = _FFRawParams(self.dim, name=f"{ff_name}.fn")()

            # _Attention has no qkv/proj biases: zero constants get dropped
            # gradients (they are not parameters).
            zb3 = jnp.zeros((3 * c,), jnp.float32)
            zb1 = jnp.zeros((c,), jnp.float32)
            if self.grid:
                x = _shuffle_grid(x, wh, ww)
            if self.static:
                x = attention_map_vjp(
                    x, s1, b1, wqkv, zb3, wproj, zb1, bias, None, None, 0, heads, ws
                )
            else:
                # Adaptive: x + proj(attn(LN_in(LN_out(x)))). Run LN_out in
                # XLA, then re-base the fused block's internal residual:
                # x + (block(ln) - ln) with block(ln) = ln + proj(attn(LN_in(ln))).
                from studiosr_tpu.ops.pallas.swin_block import _layernorm

                zbias = jnp.zeros((heads, ws * ws, ws * ws), jnp.float32)
                x32 = x.astype(jnp.float32)
                ln = _layernorm(x32, s1, b1).astype(x.dtype)
                y = attention_map_vjp(
                    ln, s_in, b_in, wqkv, zb3, wproj, zb1, zbias, None, None, 0, heads, ws
                )
                x = (x32 + (y.astype(jnp.float32) - ln.astype(jnp.float32))).astype(x.dtype)
            flat = x.reshape(b * h * w, c)
            flat = mlp_block_vjp(flat, s2, b2, w1, fb1, w2, fb2)
            x = flat.reshape(b, h, w, c)
            if self.grid:
                x = _unshuffle_grid(x, wh, ww)
            return x

        partition = _grid_partition if self.grid else _block_partition
        reverse = _grid_reverse if self.grid else _block_reverse
        tokens, grid_shape = partition(x, wh, ww)

        y = LayerNorm(name=f"{attn_name}.norm")(tokens)
        y = _Attention(
            self.dim,
            self.dim_head,
            window_size=self.window_size,
            static=self.static,
            fused=self.fused,
            name=f"{attn_name}.fn",
        )(y)
        tokens = tokens + y
        if self.fused and FF_FUSED_SERVING:
            # Fused MLP kernel on flattened token rows: LN + fc + gelu + fc
            # + residual in one VMEM pass (same parameter tree as the
            # LayerNorm/_FeedForward modules below; the mlp_block_vjp primal
            # runs the kernel on TPU, XLA math on CPU).
            from studiosr_tpu.models.swinir import _LayerNormParams
            from studiosr_tpu.ops.pallas.mlp_vjp import mlp_block_vjp

            bp, n, c = tokens.shape
            s2, b2 = _LayerNormParams(c, name=f"{ff_name}.norm")()
            w1, fb1, w2, fb2 = _FFRawParams(self.dim, name=f"{ff_name}.fn")()
            flat = mlp_block_vjp(tokens.reshape(bp * n, c), s2, b2, w1, fb1, w2, fb2)
            tokens = flat.reshape(bp, n, c)
        else:
            y = LayerNorm(name=f"{ff_name}.norm")(tokens)
            tokens = tokens + _FeedForward(self.dim, name=f"{ff_name}.fn")(y)
        return reverse(tokens, grid_shape, wh, ww)


class MaxSRModule(nn.Module):
    scale: int = 4
    n_colors: int = 3
    img_range: float = 1.0
    adaptive: bool = True
    dim: int = 128
    dim_head: int = 32
    depth: Tuple[int, ...] = (4, 4, 4, 4)
    window_size: int = 8
    mbconv_expansion_rate: float = 4
    mbconv_shrinkage_rate: float = 0.25
    dropout: float = 0.1
    fused: bool = False  # Pallas fused attention (serving; no extra params)
    fused_train: bool = False  # custom-VJP fused blocks (training)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        h, w = x.shape[1:3]
        normalizer = Normalizer(self.img_range)
        ws = self.window_size
        # Rematerialize each attention pair in the backward pass: autodiff
        # otherwise saves the (B*nW, heads, N, N) f32 score/prob maps of all
        # 32 pairs as residuals (~4 GB at batch-32 training shapes). Free at
        # inference (forward-only jit drops the recompute). Same pattern as
        # models/swinir.py RSTB remat. Under fused_train the custom VJPs
        # recompute internally, so the outer remat is dropped — but only
        # where the fused pair actually engages (wh == ww); a non-square
        # adaptive map falls back to the plain path, which must stay
        # rematted or the score residuals blow up again.
        pair_remat = nn.remat(_AttentionPair, static_argnums=(2, 3))

        def pair_cls(*a, _wh=None, _ww=None, **kw):
            fused_engages = self.fused_train and (_wh == _ww)
            return (_AttentionPair if fused_engages else pair_remat)(*a, **kw)

        if not self.adaptive:
            pad_h = (ws - h % ws) % ws
            pad_w = (ws - w % ws) % ws
            if pad_h or pad_w:
                x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)), mode="reflect")

        x = normalizer.normalize(x)
        fm1 = conv(self.dim, 3, name="conv_stem_first")(x)
        x = conv(self.dim, 3, name="conv_stem_second")(fm1)

        stage_outputs = []
        for s, stage_depth in enumerate(self.depth):
            for dblock in range(stage_depth):
                if self.adaptive:
                    # Adaptive layout: flat ModuleList [mbconv, block, grid] * depth.
                    base = 3 * dblock
                    x = MBConv(
                        self.dim,
                        self.mbconv_expansion_rate,
                        self.mbconv_shrinkage_rate,
                        self.dropout,
                        name=f"stages.{s}.{base}",
                    )(x, train=train)
                    hh, www = x.shape[1:3]
                    wh, ww_ = math.ceil(math.sqrt(hh)), math.ceil(math.sqrt(www))
                    # Pad to (wh^2, ww^2) like the reference (maxsr.py:446-449).
                    x = jnp.pad(x, ((0, 0), (0, wh * wh - hh), (0, ww_ * ww_ - www), (0, 0)))
                    x = pair_cls(
                        self.dim,
                        self.dim_head,
                        0,
                        static=False,
                        grid=False,
                        fused=self.fused,
                        fused_train=self.fused_train,
                        name=f"stages.{s}.{base + 1}",
                        _wh=wh, _ww=ww_,
                    )(x, wh, ww_)
                    x = pair_cls(
                        self.dim,
                        self.dim_head,
                        0,
                        static=False,
                        grid=True,
                        fused=self.fused,
                        fused_train=self.fused_train,
                        name=f"stages.{s}.{base + 2}",
                        _wh=wh, _ww=ww_,
                    )(x, wh, ww_)
                    # Like the reference, x stays padded (wh^2 is a fixpoint of
                    # the window rule) until the post-stage crop (maxsr.py:459).
                else:
                    x = MBConv(
                        self.dim,
                        self.mbconv_expansion_rate,
                        self.mbconv_shrinkage_rate,
                        self.dropout,
                        name=f"stages.{s}.{dblock}.0",
                    )(x, train=train)
                    x = pair_cls(
                        self.dim,
                        self.dim_head,
                        ws,
                        static=True,
                        grid=False,
                        fused=self.fused,
                        fused_train=self.fused_train,
                        name=f"stages.{s}.{dblock}.1",
                        _wh=ws, _ww=ws,
                    )(x, ws, ws)
                    x = pair_cls(
                        self.dim,
                        self.dim_head,
                        ws,
                        static=True,
                        grid=True,
                        fused=self.fused,
                        fused_train=self.fused_train,
                        name=f"stages.{s}.{dblock}.2",
                        _wh=ws, _ww=ws,
                    )(x, ws, ws)
            stage_outputs.append(x)

        f_cat = jnp.concatenate(stage_outputs, axis=-1)
        if self.adaptive:
            f_cat = f_cat[:, :h, :w, :]

        y = conv(self.dim, 1, name="HFFB.0")(f_cat)
        y = conv(self.dim, 3, name="HFFB.1")(y)
        y = y + fm1

        s = self.scale
        if (s & (s - 1)) == 0:
            for i in range(int(math.log2(s))):
                y = conv(4 * self.dim, 3, name=f"Upsample.{2 * i}")(y)
                y = pixel_shuffle(y, 2)
        elif s == 3:
            y = conv(9 * self.dim, 3, name="Upsample.0")(y)
            y = pixel_shuffle(y, 3)
        else:
            raise ValueError(f"scale {s} is not supported. Supported scales: 2^n and 3.")
        y = conv(self.n_colors, 3, name="conv_last")(y)

        y = normalizer.unnormalize(y)
        if not self.adaptive:
            y = y[:, : h * s, : w * s, :]
        return y


class MaxSR(Model):
    def enable_fused(self, enabled: bool = True) -> "MaxSR":
        """Route the 32 attention pairs through the fused Pallas attention
        kernel (scores stay in VMEM; the XLA path materializes f32 score
        tensors in HBM). Parameters are unchanged — this is a serving flag."""
        self.module = self.module.clone(fused=enabled)
        # The base-class manual-SPMD contract keys on _fused: a fused MaxSR
        # on a >1-device mesh must serve under shard_map like SwinIR/HAT
        # (Mosaic kernels cannot be GSPMD-partitioned, base.needs_manual_spmd).
        self._fused = enabled
        self._jit_forward = jax.jit(self._forward)
        return self

    @classmethod
    def build(
        cls,
        scale: int = 4,
        n_colors: int = 3,
        img_range: float = 1.0,
        adaptive: bool = True,
        dim: int = 128,
        dim_head: int = 32,
        depth: Sequence[int] = (4, 4, 4, 4),
        window_size: int = 8,
        mbconv_expansion_rate: float = 4,
        mbconv_shrinkage_rate: float = 0.25,
        dropout: float = 0.1,
        seed: int = 0,
        fast_init: bool = False,
    ) -> "MaxSR":
        config = dict(
            scale=scale,
            n_colors=n_colors,
            img_range=img_range,
            adaptive=adaptive,
            dim=dim,
            dim_head=dim_head,
            depth=list(depth),
            window_size=window_size,
            mbconv_expansion_rate=mbconv_expansion_rate,
            mbconv_shrinkage_rate=mbconv_shrinkage_rate,
            dropout=dropout,
        )
        module = MaxSRModule(**{**config, "depth": tuple(depth)})
        size = window_size if not adaptive else 9
        from studiosr_tpu.models.base import init_variables

        variables = init_variables(module, (1, size, size, n_colors), seed, fast=fast_init)
        return cls(module, variables, config, {})

    @classmethod
    def from_pretrained(
        cls,
        scale: int = 4,
        light: bool = True,
        adaptive: bool = False,
        ckpt_path: str = None,
    ) -> "MaxSR":
        """Config mirror of the reference (``maxsr.py:546-576``): light builds a
        48-dim/2-deep variant; weights only from a local checkpoint."""
        config: Dict[str, Any] = dict(
            scale=scale, adaptive=adaptive, dim=128, dim_head=32, depth=[4, 4, 4, 4], window_size=8, dropout=0.1
        )
        if light:
            config.update(dim=48, dim_head=12, depth=[2, 2, 2, 2])
        # fast_init only when a checkpoint will overwrite every value; a
        # bare from_pretrained (no ckpt_path) must keep real initializers.
        model = cls.build(**config, fast_init=ckpt_path is not None)
        if ckpt_path is not None:
            from studiosr_tpu.zoo import load_torch_state_dict, translate_state_dict

            state = load_torch_state_dict(ckpt_path)
            model.variables, _ = translate_state_dict(state, model.variables)
        return model
