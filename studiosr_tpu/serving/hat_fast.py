"""Serving-path HAT forward on the fused Swin block kernels.

Runs the exact HAT computation (``models/hat.py``) from the parameter pytree:
HAB blocks use the fused VMEM-resident attention kernel (16x16 windows) and
the fused MLP kernel; the parallel CAB conv branch and the per-group OCAB
(overlapping cross-attention) run in XLA where convolutions and the 576-token
cross-attention are already MXU-shaped. Validated against the linen forward
in tests/ops/test_fused_swin.py.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from studiosr_tpu.models.blocks import DEFAULT_RGB_MEAN
from studiosr_tpu.ops.attention import attention_core
from studiosr_tpu.ops.pallas.swin_block import fused_mlp_block, fused_window_attention_block, prepare_mask
from studiosr_tpu.ops.pixel_shuffle import pixel_shuffle
from studiosr_tpu.ops.windows import (
    calculate_mask,
    gather_rel_bias,
    pad_to_multiple_reflect,
    relative_position_index,
    relative_position_index_oca,
    window_partition,
    window_reverse,
)
from studiosr_tpu.serving.swinir_fast import _attn_operands, _conv, _layernorm, _residual_conv

__all__ = ["hat_fast_forward", "prepare_hat_serving"]


def prepare_hat_serving(variables, config, dtype):
    """Pre-lay every HAT serving weight into its kernel operand layout
    (see serving/swinir_fast.py prepare_serving for the rationale): HAB
    attention head padding + rel-pos gathers, CAB conv tap stacks, RHAG
    conv stacks, OCAB qkv/proj padding + the (256, 576, heads) OCA bias
    gather, and the tail stage weights."""
    from studiosr_tpu.ops.pallas.conv3x3 import (
        prepare_cab_weights,
        prepare_conv3x3_weights,
    )
    from studiosr_tpu.ops.pallas.ocab import prepare_ocab_weights
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
    overlap_ratio = float(config.get("overlap_ratio", 0.5))
    rpi = relative_position_index(ws)
    rpi_oca = relative_position_index_oca(ws, overlap_ratio)

    prep = {"blocks": {}, "cab": {}, "convs": {}, "ocab": {}}
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
            cb = blk["conv_block"]
            prep["cab"][f"{li}.{bi}"] = prepare_cab_weights(
                cb["cab.0"]["kernel"], cb["cab.2"]["kernel"], dtype
            )
        prep["convs"][str(li)] = prepare_conv3x3_weights(layer["conv"]["kernel"], dtype)
        oa = layer["residual_group.overlap_attn"]
        oca_bias = gather_rel_bias(oa["relative_position_bias_table"], rpi_oca, heads)
        prep["ocab"][str(li)] = prepare_ocab_weights(
            oa["qkv"]["kernel"], oa["qkv"]["bias"], oa["proj"]["kernel"], oca_bias, heads, dtype
        )
    prep["convs"]["after_body"] = prepare_conv3x3_weights(params["conv_after_body"]["kernel"], dtype)
    if "conv_last" in params:
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
    return prep

# Whole-HAB (incl. gate-folded CAB join) measured 133.8 vs 130.8 ms split —
# neutral again; the CAB KERNEL itself is the cost (see exp_hat_ablate).
USE_WHOLE_HAB = False


def _gelu(x):
    return jax.nn.gelu(x, approximate=False)


def _ocab(x, p, heads, ws, overlap_ratio):
    """Overlapping cross-attention block in XLA (models/hat.py OCAB)."""
    import numpy as np

    b, h, w, c = x.shape
    owin = int(ws * overlap_ratio) + ws
    pad = (owin - ws) // 2
    d = c // heads

    shortcut = x
    ln = _layernorm(x, p["norm1"])
    qkv = ln @ p["qkv"]["kernel"].astype(x.dtype) + p["qkv"]["bias"].astype(x.dtype)
    q, kv = qkv[..., :c], qkv[..., c:]

    q_windows = window_partition(q, ws).reshape(-1, ws * ws, c)
    kv_pad = jnp.pad(kv, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    rows = np.arange(h // ws)[:, None] * ws + np.arange(owin)[None, :]
    cols = np.arange(w // ws)[:, None] * ws + np.arange(owin)[None, :]
    gathered = kv_pad[:, jnp.asarray(rows)][:, :, :, jnp.asarray(cols)]
    gathered = gathered.transpose(0, 1, 3, 2, 4, 5).reshape(-1, owin * owin, 2 * c)
    k_windows, v_windows = gathered[..., :c], gathered[..., c:]

    nq, nk = ws * ws, owin * owin
    rpi = relative_position_index_oca(ws, overlap_ratio)
    bias = gather_rel_bias(p["relative_position_bias_table"], rpi, heads)

    bw = q_windows.shape[0]
    qh = q_windows.reshape(bw, nq, heads, d).transpose(0, 2, 1, 3) * (d**-0.5)
    kh = k_windows.reshape(bw, nk, heads, d).transpose(0, 2, 1, 3)
    vh = v_windows.reshape(bw, nk, heads, d).transpose(0, 2, 1, 3)
    out = attention_core(qh, kh, vh, bias=bias)
    out = out.transpose(0, 2, 1, 3).reshape(bw, nq, c)

    y = window_reverse(out.reshape(-1, ws, ws, c), ws, h, w)
    y = y @ p["proj"]["kernel"].astype(x.dtype) + p["proj"]["bias"].astype(x.dtype)
    x = y + shortcut

    flat = x.reshape(b * h * w, c)
    ln2 = _layernorm(flat, p["norm2"])
    h1 = _gelu(ln2 @ p["mlp"]["fc1"]["kernel"].astype(x.dtype) + p["mlp"]["fc1"]["bias"].astype(x.dtype))
    flat = flat + (h1 @ p["mlp"]["fc2"]["kernel"].astype(x.dtype) + p["mlp"]["fc2"]["bias"].astype(x.dtype))
    return flat.reshape(b, h, w, c)


def hat_fast_forward(
    variables: Dict[str, Any],
    x: jnp.ndarray,
    config: Dict[str, Any],
    interpret: bool = False,
    tail_batched_map: bool = True,
    prep: Dict[str, Any] = None,
    _ablate: frozenset = frozenset(),
) -> jnp.ndarray:
    """``_ablate``: perf-dissection hook (scripts/exp_hat_ablate.py) — subsets
    of {"cab", "attn", "mlp", "ocab", "conv", "tail"} skip that part
    (timing only, wrong math)."""
    params = variables["params"]
    scale = int(config["scale"])
    depths = list(config["depths"])
    num_heads = list(config["num_heads"])
    ws = int(config["window_size"])
    img_range = float(config.get("img_range", 1.0))
    conv_scale = float(config.get("conv_scale", 0.01))
    overlap_ratio = float(config.get("overlap_ratio", 0.5))

    n, h0, w0, _ = x.shape
    x = pad_to_multiple_reflect(x, ws)
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
        # Compressed kernel-side mask: the dense f32 mask at HAT's 272² map
        # is (289, 256, 256) = 75.7 MB streamed per shifted block with
        # chunk-1 programs (scripts/exp_hlo_audit.py); the cls4 layout
        # re-uses one fetched block across interior windows.
        mask_k, mask_mode = prepare_mask(mask_np, res.shape, heads, ws, res.dtype)
        for bi in range(depth):
            blk = layer[f"residual_group.blocks.{bi}"]
            shift = 0 if bi % 2 == 0 else ws // 2

            bp = None if prep is None else prep["blocks"][f"{li}.{bi}"]

            def _raw_bias(blk=blk, heads=heads):
                return gather_rel_bias(blk["attn"]["relative_position_bias_table"], rpi, heads)

            if bp is not None and bp["bias2"].shape[1] == ws * ws:
                bias = bp["bias2"]  # ws>=12: bias2 IS the raw (heads, N, N) bias
            elif bp is not None:
                # ws=8 preps carry the pair-EMBEDDED bias; the raw one is
                # materialized lazily only if a kernel declines.
                bias = None
            else:
                bias = _raw_bias()

            # CAB trunk in one Pallas pass (LN + conv-GELU-conv + channel
            # sums); the global-mean squeeze-excite gate finishes in XLA and
            # is folded into the residual combine below.
            from studiosr_tpu.ops.pallas.conv3x3 import fused_cab_body

            cb = blk["conv_block"]
            if "cab" in _ablate:
                conv_x = res * jnp.asarray(0, res.dtype)
                y2 = conv_x
                g = None
            else:
                y2, csum = fused_cab_body(
                    res,
                    blk["norm1"]["scale"], blk["norm1"]["bias"],
                    cb["cab.0"]["kernel"].astype(res.dtype), cb["cab.0"]["bias"],
                    cb["cab.2"]["kernel"].astype(res.dtype), cb["cab.2"]["bias"],
                    interpret=interpret,
                    prep=None if prep is None else prep["cab"][f"{li}.{bi}"],
                )
                ca_mean = (csum / (hgt * wdt)).astype(res.dtype).reshape(n, 1, 1, c)
                g = jax.nn.relu(_conv(ca_mean, cb["cab.3"]["attention.1"]))
                g = jax.nn.sigmoid(_conv(g, cb["cab.3"]["attention.3"]))
                conv_x = None  # materialized lazily (split path only)

            y = res
            extra = y2 if "cab" not in _ablate else conv_x
            escale = (g.reshape(n, c) * jnp.asarray(conv_scale, g.dtype)) if "cab" not in _ablate else None
            if shift:
                y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
                extra = jnp.roll(extra, (-shift, -shift), axis=(1, 2))
            from studiosr_tpu.ops.pallas.swin_block import fused_swin_block

            # Whole HAB block (attention + CAB join + MLP) in one pass; the
            # UNSCALED CAB trunk output joins between the halves with the
            # squeeze-excite gate (x conv_scale) as a per-sample channel
            # scale — no elementwise pass ever touches the map (the ablation
            # showed those passes were ~half of HAT's runtime).
            whole = None if not USE_WHOLE_HAB else fused_swin_block(
                y,
                blk["norm1"]["scale"], blk["norm1"]["bias"],
                blk["attn"]["qkv"]["kernel"].astype(y.dtype), blk["attn"]["qkv"]["bias"],
                blk["attn"]["proj"]["kernel"].astype(y.dtype), blk["attn"]["proj"]["bias"],
                bias if bias is not None else _raw_bias(), mask_k if shift else None,
                blk["norm2"]["scale"], blk["norm2"]["bias"],
                blk["mlp"]["fc1"]["kernel"].astype(y.dtype), blk["mlp"]["fc1"]["bias"],
                blk["mlp"]["fc2"]["kernel"].astype(y.dtype), blk["mlp"]["fc2"]["bias"],
                heads=heads, window_size=ws, extra=extra, extra_scale=escale,
                mask_mode=mask_mode, interpret=interpret,
            )
            if whole is not None:
                res = jnp.roll(whole, (shift, shift), axis=(1, 2)) if shift else whole
                continue
            if "attn" not in _ablate:
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
                if fused is None:
                    from studiosr_tpu.serving.swinir_fast import _xla_attention_block

                    fused = _xla_attention_block(
                        y, blk, bias if bias is not None else _raw_bias(), mask if shift else None, heads, ws
                    )
                y = fused
            if shift:
                y = jnp.roll(y, (shift, shift), axis=(1, 2))

            # CAB join folded into the MLP kernel (batch-1 serving): the
            # UNROLLED trunk y2 joins with the per-channel gate as an extra
            # kernel operand — one +M read instead of a 3M elementwise pass.
            if n == 1 and "cab" not in _ablate and "mlp" not in _ablate:
                flat = fused_mlp_block(
                    y.reshape(n * hgt * wdt, c),
                    blk["norm2"]["scale"],
                    blk["norm2"]["bias"],
                    blk["mlp"]["fc1"]["kernel"].astype(y.dtype),
                    blk["mlp"]["fc1"]["bias"],
                    blk["mlp"]["fc2"]["kernel"].astype(y.dtype),
                    blk["mlp"]["fc2"]["bias"],
                    extra=y2.reshape(n * hgt * wdt, c),
                    extra_scale=g.reshape(c) * jnp.asarray(conv_scale, g.dtype),
                    interpret=interpret,
                )
                res = flat.reshape(n, hgt, wdt, c)
                continue

            conv_x = conv_x if "cab" in _ablate else y2 * g
            res = y + conv_x * conv_scale

            if "mlp" in _ablate:
                continue
            flat = res.reshape(n * hgt * wdt, c)
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
            res = flat.reshape(n, hgt, wdt, c)

        if "ocab" in _ablate:
            if "conv" not in _ablate:
                res = _residual_conv(
                    res, layer["conv"], interpret=interpret, extra=feats,
                    prep_w=None if prep is None else prep["convs"].get(str(li)),
                )
                feats = res
            else:
                feats = res
            continue
        oa = layer["residual_group.overlap_attn"]
        from studiosr_tpu.ops.pallas.ocab import fused_ocab_block

        rpi_oca = relative_position_index_oca(ws, overlap_ratio)
        op = None if prep is None else prep["ocab"][str(li)]
        if op is None:
            oca_bias = gather_rel_bias(oa["relative_position_bias_table"], rpi_oca, heads)
        else:
            oca_bias = op["bias"]
        fused_oca = fused_ocab_block(
            res,
            oa["norm1"]["scale"], oa["norm1"]["bias"],
            oa["qkv"]["kernel"].astype(res.dtype), oa["qkv"]["bias"],
            oa["proj"]["kernel"].astype(res.dtype), oa["proj"]["bias"],
            oca_bias,
            oa["norm2"]["scale"], oa["norm2"]["bias"],
            oa["mlp"]["fc1"]["kernel"].astype(res.dtype), oa["mlp"]["fc1"]["bias"],
            oa["mlp"]["fc2"]["kernel"].astype(res.dtype), oa["mlp"]["fc2"]["bias"],
            heads=heads, ws=ws, overlap_ratio=overlap_ratio, interpret=interpret,
            prep=op,
        )
        res = fused_oca if fused_oca is not None else _ocab(res, oa, heads, ws, overlap_ratio)
        if "conv" not in _ablate:
            res = _residual_conv(
                res, layer["conv"], interpret=interpret, extra=feats,
                prep_w=None if prep is None else prep["convs"].get(str(li)),
            )
        feats = res

    if "tail" in _ablate:
        return feats
    feats = _layernorm(feats, params["norm"])
    x = _residual_conv(
        feats, params["conv_after_body"], interpret=interpret, extra=shallow,
        prep_w=None if prep is None else prep["convs"].get("after_body"),
    )
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
        from studiosr_tpu.ops.pallas import engagement

        engagement.structural_tail_decline(scale)
    s, i = scale, 0
    while s > 1 and (s & (s - 1)) == 0:
        x = _conv(x, up[str(2 * i)])
        x = pixel_shuffle(x, 2)
        s //= 2
        i += 1
    if s == 3:
        x = _conv(x, up["0"])
        x = pixel_shuffle(x, 3)
    x = _conv(x, params["conv_last"])

    x = (x + mean) * img_range
    return x[:, : h0 * scale, : w0 * scale, :]
