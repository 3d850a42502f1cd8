"""Serving-path SwinIR forward built on the fused Pallas block kernels.

Runs the exact SwinIR computation (``models/swinir.py``) directly from the
parameter pytree — convolutions via XLA, every transformer block via the two
fused kernels in ``ops/pallas/swin_block.py``. Numerically equivalent to the
linen forward (validated in tests/ops/test_fused_swin.py); kept separate so
the reference-parity model code stays simple while serving gets the
HBM-optimal path.

Supports batched inputs (all images share the static padded size); the
model.inference contract uses batch 1.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from studiosr_tpu.models.blocks import DEFAULT_RGB_MEAN
from studiosr_tpu.ops.pallas.swin_block import (
    fused_mlp_block,
    fused_swin_block,
    fused_window_attention_block,
    prepare_mask,
    shift_fold_supported,
)
from studiosr_tpu.ops.pixel_shuffle import pixel_shuffle
from studiosr_tpu.ops.windows import (
    calculate_mask,
    gather_rel_bias,
    pad_to_multiple_flip,
    relative_position_index,
)

__all__ = ["swinir_fast_forward", "prepare_serving"]


def prepare_serving(variables: Dict[str, Any], config: Dict[str, Any], dtype) -> Dict[str, Any]:
    """Pre-lay every serving weight into its kernel operand layout.

    The per-forward weight prep (head padding, pair-bias embedding, conv tap
    stacking, the tail's quadrant-weight scatter chain) is traced into every
    compiled forward and is NOT hoisted out of scan loops (scan-body HLO
    audit, STATUS.md session 7) — in per-image serving it re-executes per
    call. Building it once at load time (eagerly, on device) removes it
    from the hot path. Consumed by ``swinir_fast_forward(..., prep=...)``;
    the same helper functions build both layouts, so outputs are identical.
    """
    from studiosr_tpu.ops.pallas.conv3x3 import prepare_conv3x3_weights
    from studiosr_tpu.ops.pallas.swin_block import prepare_attention_weights
    from studiosr_tpu.ops.pallas.upsampler import (
        prepare_upsample_s_weights,
        prepare_upsample_x4_weights,
    )

    params = variables["params"]
    depths = list(config["depths"])
    num_heads = list(config["num_heads"])
    ws = int(config["window_size"])
    scale = int(config["scale"])
    upsampler = config.get("upsampler", "pixelshuffle")
    rpi = relative_position_index(ws)

    prep: Dict[str, Any] = {"blocks": {}, "convs": {}}
    for li, depth in enumerate(depths):
        layer = params[f"layers.{li}"]
        heads = num_heads[li]
        for bi in range(depth):
            blk = layer[f"residual_group.blocks.{bi}"]
            bias = gather_rel_bias(blk["attn"]["relative_position_bias_table"], rpi, heads)
            prep["blocks"][f"{li}.{bi}"] = prepare_attention_weights(
                blk["attn"]["qkv"]["kernel"], blk["attn"]["qkv"]["bias"],
                blk["attn"]["proj"]["kernel"], bias, heads, ws, dtype,
            )
        conv = layer["conv"]
        if "kernel" in conv:
            prep["convs"][str(li)] = prepare_conv3x3_weights(conv["kernel"], dtype)
        else:  # SwinFIR SFB: the streaming S-branch convs
            prep["convs"][str(li)] = {
                "s0": prepare_conv3x3_weights(conv["S"]["body.0"]["kernel"], dtype),
                "s2": prepare_conv3x3_weights(conv["S"]["body.2"]["kernel"], dtype),
            }
    cab = params["conv_after_body"]
    if "kernel" in cab:
        prep["convs"]["after_body"] = prepare_conv3x3_weights(cab["kernel"], dtype)
    else:
        prep["convs"]["after_body"] = {
            "s0": prepare_conv3x3_weights(cab["S"]["body.0"]["kernel"], dtype),
            "s2": prepare_conv3x3_weights(cab["S"]["body.2"]["kernel"], dtype),
        }
    if upsampler == "pixelshuffle" and "conv_last" in params:
        up = params["upsample"]
        if scale == 4:
            prep["tail"] = prepare_upsample_x4_weights(
                up["0"]["kernel"], up["0"]["bias"], up["2"]["kernel"], up["2"]["bias"],
                params["conv_last"]["kernel"], params["conv_last"]["bias"], dtype,
            )
        elif scale in (2, 3):
            prep["tail"] = prepare_upsample_s_weights(
                up["0"]["kernel"], up["0"]["bias"],
                params["conv_last"]["kernel"], params["conv_last"]["bias"], scale, dtype,
            )
    elif upsampler != "pixelshuffle":
        prep["convs"]["up_direct"] = prepare_conv3x3_weights(params["upsample"]["0"]["kernel"], dtype)
    return prep

# A/B flag (scripts/exp_swinfir_ablate.py): SFB spatial-branch 3x3 convs via
# the streaming Pallas kernel (True) or XLA convs (False).
SFB_STREAM_S = True


def _attn_operands(bp, blk, bias, dtype):
    """Attention-kernel weight operands: the pre-laid layout when a prep
    block is available, the raw linen weights otherwise. Returns
    ``(wqkv, bqkv, wproj, bias, prepped)`` — the single selection point for
    every fused_swin_block / fused_window_attention_block call site."""
    if bp is not None:
        return bp["wqkv"], bp["bqkv"], bp["wproj"], bp["bias2"], True
    a = blk["attn"]
    return a["qkv"]["kernel"].astype(dtype), a["qkv"]["bias"], a["proj"]["kernel"].astype(dtype), bias, False


def _conv(x, p, stride=1):
    return (
        jax.lax.conv_general_dilated(
            x,
            p["kernel"].astype(x.dtype),
            (stride, stride),
            [(p["kernel"].shape[0] // 2,) * 2, (p["kernel"].shape[1] // 2,) * 2],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        + p["bias"].astype(x.dtype)
    )


def _layernorm(x, p):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
    out = (x32 - mu) * jax.lax.rsqrt(var + 1e-5) * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return out.astype(x.dtype)


def _residual_conv(x, p, interpret=False, extra=None, prep_w=None):
    """RSTB residual connection: plain conv or SwinFIR's SFB
    (spatial branch || rfft spectral branch -> 1x1 fuse). ``extra`` is the
    skip map of the surrounding `conv(x) + skip` join, folded into the conv
    kernel's pass (a standalone XLA add is a full map read+read+write).
    ``prep_w``: pre-laid conv weights (prepare_serving) — an array for the
    plain conv, a {"s0", "s2"} dict for the SFB spatial branch."""
    from studiosr_tpu.ops.pallas.conv3x3 import fused_conv3x3

    if "kernel" in p:
        # Streaming Pallas conv: one HBM pass (XLA's measured ~2.4x the
        # stream bound in context, STATUS.md round-2 dissection).
        if prep_w is not None:
            return fused_conv3x3(x, prep_w, p["bias"], extra=extra, prepped=True, interpret=interpret)
        return fused_conv3x3(x, p["kernel"].astype(x.dtype), p["bias"], extra=extra, interpret=interpret)
    # SFB (models/swinfir.py): keys S / F / fusion.
    if SFB_STREAM_S:
        # The S-branch conv-lrelu-conv-residual runs as ONE streaming
        # resblock kernel pass (round 4; previously two fused_conv3x3
        # passes + a standalone XLA residual add = 3 map round-trips).
        from studiosr_tpu.ops.pallas.conv3x3 import fused_resblock

        s0 = p["S"]["body.0"]
        s2 = p["S"]["body.2"]
        if prep_w is not None:
            s = fused_resblock(
                x, prep_w["s0"], s0["bias"], prep_w["s2"], s2["bias"],
                activation="lrelu0.2", prepped=True, interpret=interpret,
            )
        else:
            s = fused_resblock(
                x, s0["kernel"].astype(x.dtype), s0["bias"],
                s2["kernel"].astype(x.dtype), s2["bias"],
                activation="lrelu0.2", interpret=interpret,
            )
    else:
        s = _conv(x, p["S"]["body.0"])
        s = jax.nn.leaky_relu(s, 0.2)
        s = _conv(s, p["S"]["body.2"]) + x

    from studiosr_tpu.ops.dft import irfft2_mxu, rfft2_mxu, use_mxu_dft

    f = _conv(x, p["F"]["conv_before_fft.0"])
    f = jax.nn.leaky_relu(f, 0.2)
    h, w = f.shape[1:3]
    if use_mxu_dft():
        # MXU DFT matmuls — XLA's FFT op compile-hangs at these shapes on
        # this TPU backend (ops/dft.py). Compute dtype follows the trunk
        # (bf16 operands with f32 accumulation under half()).
        re_f, im_f = rfft2_mxu(f)
    else:
        fft = jnp.fft.rfftn(f.astype(jnp.float32), axes=(1, 2), norm="ortho")
        re_f, im_f = fft.real, fft.imag
    stacked = jnp.concatenate([re_f, im_f], axis=-1).astype(x.dtype)
    stacked = jax.nn.leaky_relu(_conv(stacked, p["F"]["fu"]["conv_layer"]), 0.2)
    re, im = jnp.split(stacked, 2, axis=-1)
    if use_mxu_dft():
        fu = irfft2_mxu(re, im, w).astype(x.dtype)
    else:
        re32, im32 = re.astype(jnp.float32), im.astype(jnp.float32)
        fu = jnp.fft.irfftn(jax.lax.complex(re32, im32), s=(h, w), axes=(1, 2), norm="ortho").astype(x.dtype)
    f = _conv(fu + f, p["F"]["conv_after_fft"])

    out = _conv(jnp.concatenate([s, f], axis=-1), p["fusion"])
    return out if extra is None else out + extra


def _xla_attention_block(y, blk, bias, mask, heads, ws):
    """XLA fallback for the attention half (used for kernel A/B ablations)."""
    from studiosr_tpu.ops.attention import attention_core
    from studiosr_tpu.ops.windows import window_partition, window_reverse

    _, hgt, wdt, c = y.shape
    d = c // heads
    ln = _layernorm(y, blk["norm1"])
    windows = window_partition(ln, ws).reshape(-1, ws * ws, c)
    qkv = windows @ blk["attn"]["qkv"]["kernel"].astype(y.dtype) + blk["attn"]["qkv"]["bias"].astype(y.dtype)
    b_, n, _ = qkv.shape
    qkv = qkv.reshape(b_, n, 3, heads, d).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0] * (d**-0.5), qkv[1], qkv[2]
    out = attention_core(q, k, v, bias=bias, mask=mask)
    out = out.transpose(0, 2, 1, 3).reshape(b_, n, c)
    out = out @ blk["attn"]["proj"]["kernel"].astype(y.dtype) + blk["attn"]["proj"]["bias"].astype(y.dtype)
    return y + window_reverse(out.reshape(-1, ws, ws, c), ws, hgt, wdt)


def swinir_fast_forward(
    variables: Dict[str, Any],
    x: jnp.ndarray,
    config: Dict[str, Any],
    interpret: bool = False,
    tail_batched_map: bool = True,
    use_fused_attn: bool = True,
    use_fused_mlp: bool = True,
    prep: Dict[str, Any] = None,
    _ablate: frozenset = frozenset(),
) -> jnp.ndarray:
    """Eval-mode SwinIR forward (flip-concat padding) from raw variables.

    ``prep``: pre-laid kernel weights from :func:`prepare_serving` (skips
    the per-forward weight-layout passes). ``_ablate`` is a perf-dissection
    hook (scripts/exp_model_ablate.py):
    subsets of {"roll", "attn", "mlp", "conv", "tail"} skip that part of the
    computation (numerically wrong, timing only)."""
    params = variables["params"]
    scale = int(config["scale"])
    depths = list(config["depths"])
    num_heads = list(config["num_heads"])
    ws = int(config["window_size"])
    img_range = float(config.get("img_range", 1.0))
    upsampler = config.get("upsampler", "pixelshuffle")

    n, h0, w0, _ = x.shape
    x = pad_to_multiple_flip(x, ws)
    hgt, wdt = x.shape[1:3]

    mean = jnp.asarray(DEFAULT_RGB_MEAN, x.dtype)
    x = x / img_range - mean

    x = _conv(x, params["conv_first"])
    shallow = x
    c = x.shape[-1]

    feats = _layernorm(x, params["patch_embed.norm"])
    mask_np = calculate_mask((hgt, wdt), ws, ws // 2)
    mask = jnp.asarray(mask_np)  # dense f32 — the XLA fallback path's layout
    rpi = relative_position_index(ws)

    for li, depth in enumerate(depths):
        layer = params[f"layers.{li}"]
        res = feats
        heads = num_heads[li]
        # Kernel-side mask: compressed layout (repeated blocks re-use one
        # fetch) in the map dtype — the dense f32 mask is 17.8 MB streamed
        # per shifted block at a 264² map (scripts/exp_hlo_audit.py).
        mask_k, mask_mode = prepare_mask(mask_np, res.shape, heads, ws, res.dtype)
        sh = ws // 2
        # Shift folding: shifted blocks read the map at a (+sh,+sh) offset
        # inside the kernel (rows via half-stripe blocks, columns via an
        # in-register rotate) and leave their output in the rolled space;
        # the next block reads it back at (-sh,-sh). All the XLA roll
        # passes per shifted block vanish — only one roll per residual
        # group remains (before the conv). Disabled in ablation mode so the
        # dissection deltas stay comparable.
        fold_ok = (
            use_fused_attn is True
            and use_fused_mlp
            and not _ablate
            and shift_fold_supported(res.shape, heads, ws)
        )
        space = 0  # 0: map aligned; 1: map rolled by (-sh, -sh)
        for bi in range(depth):
            blk = layer[f"residual_group.blocks.{bi}"]
            shift = 0 if bi % 2 == 0 else sh

            bp = None if prep is None else prep["blocks"][f"{li}.{bi}"]

            def _raw_bias(blk=blk, heads=heads):
                return gather_rel_bias(blk["attn"]["relative_position_bias_table"], rpi, heads)

            # raw bias only materialized if a kernel declines the prep
            bias = None if bp is not None else _raw_bias()

            y = res
            if "attn" in _ablate and "mlp" in _ablate:
                continue
            if use_fused_attn is True and use_fused_mlp and not _ablate & {"attn", "mlp"}:
                # Whole-block single-pass kernel (attn + MLP in one HBM
                # round-trip — the serving path is bandwidth-bound).
                desired = 1 if shift else 0
                read_shift = (desired - space) * sh if fold_ok else 0
                if not fold_ok and shift and "roll" not in _ablate:
                    y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
                wq, bq, wp, bs, is_prepped = _attn_operands(bp, blk, bias, y.dtype)
                whole = fused_swin_block(
                    y,
                    blk["norm1"]["scale"], blk["norm1"]["bias"],
                    wq, bq, wp, blk["attn"]["proj"]["bias"],
                    bs, mask_k if shift else None,
                    blk["norm2"]["scale"], blk["norm2"]["bias"],
                    blk["mlp"]["fc1"]["kernel"].astype(y.dtype), blk["mlp"]["fc1"]["bias"],
                    blk["mlp"]["fc2"]["kernel"].astype(y.dtype), blk["mlp"]["fc2"]["bias"],
                    heads=heads, window_size=ws, read_shift=read_shift,
                    mask_mode=mask_mode, prepped=is_prepped, interpret=interpret,
                )
                if whole is not None:
                    if fold_ok:
                        space = desired
                    elif shift and "roll" not in _ablate:
                        whole = jnp.roll(whole, (shift, shift), axis=(1, 2))
                    res = whole
                    continue
                y = res  # kernel declined: restart from the unrolled map
            if space:
                # leaving the folded path mid-group: realign first.
                y = jnp.roll(y, (sh, sh), axis=(1, 2))
                res = y
                space = 0
            if shift and "roll" not in _ablate:
                y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
            if "attn" in _ablate:
                pass
            else:
                fused = None
                if use_fused_attn:
                    wq, bq, wp, bs, is_prepped = _attn_operands(bp, blk, bias, y.dtype)
                    fused = fused_window_attention_block(
                        y,
                        blk["norm1"]["scale"],
                        blk["norm1"]["bias"],
                        wq, bq, wp,
                        blk["attn"]["proj"]["bias"],
                        bs,
                        mask_k if shift else None,
                        heads=heads,
                        window_size=ws,
                        mask_mode=mask_mode,
                        prepped=is_prepped,
                        interpret=interpret,
                    )
                if fused is None and bias is None:
                    bias = _raw_bias()
                y = fused if fused is not None else _xla_attention_block(y, blk, bias, mask if shift else None, heads, ws)
            if shift and "roll" not in _ablate:
                y = jnp.roll(y, (shift, shift), axis=(1, 2))
            res = y

            if "mlp" in _ablate:
                continue
            flat = res.reshape(n * hgt * wdt, c)
            if use_fused_mlp:
                flat = fused_mlp_block(
                    flat,
                    blk["norm2"]["scale"],
                    blk["norm2"]["bias"],
                    blk["mlp"]["fc1"]["kernel"].astype(flat.dtype),
                    blk["mlp"]["fc1"]["bias"],
                    blk["mlp"]["fc2"]["kernel"].astype(flat.dtype),
                    blk["mlp"]["fc2"]["bias"],
                    interpret=interpret,
                )
            else:
                ln = _layernorm(flat, blk["norm2"])
                h1 = ln @ blk["mlp"]["fc1"]["kernel"].astype(ln.dtype) + blk["mlp"]["fc1"]["bias"].astype(ln.dtype)
                h1 = jax.nn.gelu(h1, approximate=False)
                flat = flat + (h1 @ blk["mlp"]["fc2"]["kernel"].astype(ln.dtype) + blk["mlp"]["fc2"]["bias"].astype(ln.dtype))
            res = flat.reshape(n, hgt, wdt, c)
        if space:
            # the group ends on a shifted block in the folded path: realign
            # once (was one roll pair per shifted block).
            res = jnp.roll(res, (sh, sh), axis=(1, 2))
        if "conv" not in _ablate:
            cw = None if prep is None else prep["convs"].get(str(li))
            feats = _residual_conv(res, layer["conv"], interpret=interpret, extra=feats, prep_w=cw)
        else:
            feats = res + feats

    if "tail" in _ablate:
        return feats
    feats = _layernorm(feats, params["norm"])
    x = _residual_conv(
        feats, params["conv_after_body"], interpret=interpret, extra=shallow,
        prep_w=None if prep is None else prep["convs"].get("after_body"),
    )

    if upsampler == "pixelshuffle":
        x = _conv(x, params["conv_before_upsample.0"])
        x = jax.nn.leaky_relu(x, 0.01)
        up = params["upsample"]
        if scale == 4 and "conv_last" in params:
            from studiosr_tpu.ops.pallas.upsampler import fused_upsample_x4

            fused_tail = fused_upsample_x4(
                x,
                up["0"]["kernel"].astype(x.dtype), up["0"]["bias"],
                up["2"]["kernel"].astype(x.dtype), up["2"]["bias"],
                params["conv_last"]["kernel"].astype(x.dtype), params["conv_last"]["bias"],
                interpret=interpret, batched_map=tail_batched_map,
                prep=None if prep is None else prep.get("tail"),
            )
            if fused_tail is not None:
                x = (fused_tail + mean) * img_range
                return x[:, : h0 * scale, : w0 * scale, :]
        if scale in (2, 3) and "conv_last" in params:
            from studiosr_tpu.ops.pallas.upsampler import fused_upsample_s

            fused_tail = fused_upsample_s(
                x,
                up["0"]["kernel"].astype(x.dtype), up["0"]["bias"],
                params["conv_last"]["kernel"].astype(x.dtype), params["conv_last"]["bias"],
                s=scale, interpret=interpret, batched_map=tail_batched_map,
                prep=None if prep is None else prep.get("tail"),
            )
            if fused_tail is not None:
                x = (fused_tail + mean) * img_range
                return x[:, : h0 * scale, : w0 * scale, :]
        if scale not in (2, 3, 4) and "conv_last" in params:
            # Record the by-design decline loudly instead of silently
            # taking the XLA ladder below (round-4 VERDICT weak #5).
            from studiosr_tpu.ops.pallas import engagement

            engagement.structural_tail_decline(scale)
        s = scale
        i = 0
        while s > 1 and (s & (s - 1)) == 0:
            x = _conv(x, up[str(2 * i)])
            x = pixel_shuffle(x, 2)
            s //= 2
            i += 1
        if s == 3:
            x = _conv(x, up["0"])
            x = pixel_shuffle(x, 3)
        x = _conv(x, params["conv_last"])
    else:  # pixelshuffledirect (lightweight variant): streaming conv emits
        # the subpixel-packed channels in one pass; XLA depth-to-space ends.
        from studiosr_tpu.ops.pallas.conv3x3 import fused_conv3x3

        up0 = params["upsample"]["0"]
        uw = None if prep is None else prep["convs"].get("up_direct")
        x = fused_conv3x3(
            x, uw if uw is not None else up0["kernel"].astype(x.dtype), up0["bias"],
            prepped=uw is not None, interpret=interpret,
        )
        x = pixel_shuffle(x, scale)

    x = (x + mean) * img_range
    return x[:, : h0 * scale, : w0 * scale, :]
