"""Fused x4 upsampler tail kernel (Pallas TPU): conv3x3 -> pixel_shuffle(2)
-> conv3x3 -> pixel_shuffle(2) -> conv3x3 in ONE HBM pass, computed in
quadrant-planar form.

The XLA tail materializes every intermediate at growing resolution
(reference chain ``studiosr/models/common.py:124-137`` + conv_last,
``swinir.py:391-400``): ~0.6 GB of HBM traffic and ~9.5 ms of the 64 ms
forward at a 256x256 input (STATUS.md round-2 dissection — the serving path
is bandwidth-bound). This kernel reads each input tile once (3-pixel halo)
and writes the finished tile subpixel-packed as (H, W, 48); one cheap XLA
depth-to-space finishes the job.

Why planar: Mosaic rejects every in-kernel element-interleave formulation of
pixel_shuffle (reshape "unsupported shape cast", interior pad, strided
slice, gather, sublane-offset concat — probed in scripts/exp_mosaic_probe.py).
Instead the fine maps are never materialized: a conv AFTER a shuffle is
algebraically a sum of convs over the quadrant planes with coarse-grid
shifts (subpixel-convolution identity), so every stage stays on the coarse
grid using only lane slices, lane concats and MXU dots:

* c0 = conv3x3(x) with output channels pre-permuted quadrant-contiguous;
* stage 2 (conv at 2H): each output quadrant (a2,b2) accumulates nine
  (rows, cb) x (cb, 4cb) dots over shifted c0 quadrant slices;
* stage 3 (conv_last at 4H): accumulates one (rows, cb) x (cb, 48) dot per
  used (sub-plane, coarse-shift) pair (36 of them) against per-pair packed
  conv_last weights.

(Shifted slices feed dots directly — Mosaic also rejects lane-concat of
sublane-shifted operands: "offset mismatch on non-concat dimension".)

Out-of-image conv outputs are re-zeroed between stages to match the true
chain's zero padding at every resolution.

Validated against the XLA tail in tests/ops/test_upsampler.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["fused_upsample_x4"]


def _quadrant_perm(cb: int) -> np.ndarray:
    """Torch pixel-shuffle channels (k*4 + a*2 + b) -> quadrant-contiguous
    lanes ((2a+b)*cb + k)."""
    perm = np.empty(cb * 4, np.int64)
    for a in range(2):
        for b in range(2):
            for k in range(cb):
                perm[(2 * a + b) * cb + k] = k * 4 + a * 2 + b
    return perm


def _fine_to_coarse(pos: int, r: int):
    """Fine offset ``pos`` (may be negative) -> (coarse shift, quadrant)."""
    return pos // r, pos % r


def _stage2_plan(a2: int, b2: int):
    """For output 2H-quadrant (a2,b2): the nine (dy,dx) taps -> which c0
    quadrant (a',b') at which coarse shift (Dy,Dx)."""
    plan = []
    for dy in range(3):
        for dx in range(3):
            Dy, ap = _fine_to_coarse(a2 + dy - 1, 2)
            Dx, bp = _fine_to_coarse(b2 + dx - 1, 2)
            plan.append((dy, dx, Dy, Dx, ap, bp))
    return plan


# The (sub-plane, coarse shift) pairs a 3x3 conv at 4H actually touches per
# axis: fine offsets -1..4 -> (quadrant, shift) with shift in {-1,0,1} only
# at the extremes.
_S3_AXIS = [(0, 0), (1, 0), (2, 0), (3, 0), (3, -1), (0, 1)]
_S3_INDEX = {pair: k for k, pair in enumerate(_S3_AXIS)}


def _stage3_weight(w2, cin: int, n_colors: int):
    """(36, cin, 16*n_colors) per-(sub-plane, shift)-pair conv_last weights.

    Block order: (row pair index)*6 + (col pair index) over _S3_AXIS.
    Output channels: (r, s, c) packed. Entry nonzero iff fine tap (dy,dx) of
    output subpixel (r,s) lands on that (sub-plane, coarse shift) pair."""
    cb = cin
    na = len(_S3_AXIS)
    big = jnp.zeros((na * na, cb, 16 * n_colors), jnp.float32)
    for r in range(4):
        for s in range(4):
            for dy in range(3):
                for dx in range(3):
                    Dy, rp = _fine_to_coarse(r + dy - 1, 4)
                    Dx, sp = _fine_to_coarse(s + dx - 1, 4)
                    blk = _S3_INDEX[(rp, Dy)] * na + _S3_INDEX[(sp, Dx)]
                    big = big.at[
                        blk, :, (r * 4 + s) * n_colors : (r * 4 + s + 1) * n_colors
                    ].add(w2[dy, dx].astype(jnp.float32))
    return big


def _edge_zero(arr, row_start, col_start, row_limit, col_limit):
    """Zero rows/cols whose global coordinate falls outside [0, limit): the
    true chain zero-pads at EVERY resolution, so conv outputs at virtual
    positions beyond the image must be exactly 0 before the next stage."""
    h, w, _ = arr.shape
    rg = jax.lax.broadcasted_iota(jnp.int32, (h, 1, 1), 0) + row_start
    cg = jax.lax.broadcasted_iota(jnp.int32, (1, w, 1), 1) + col_start
    ok = (rg >= 0) & (rg < row_limit) & (cg >= 0) & (cg < col_limit)
    return jnp.where(ok, arr, jnp.zeros_like(arr))


def _tail_kernel(
    x_hbm, w0_ref, b0_ref, w1s_ref, b1_ref, w3_ref, b3_ref, out_ref,
    *, tile, cin, n_colors, hw,
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t = tile
    h_img, w_img = hw
    i = pl.program_id(0)
    j = pl.program_id(1)

    cpad = max(cin, 128)

    def body(xs, sem):
        # DMA slices must be 8-aligned on spatial dims and 128-aligned on
        # the channel dim (Mosaic tiling): read t+8 rows/cols of the
        # (3,5)-padded, channel-padded input; use (t+6, t+6, cin).
        dma = pltpu.make_async_copy(
            x_hbm.at[0, pl.ds(i * t, t + 8), pl.ds(j * t, t + 8), :], xs, sem
        )
        dma.start()
        dma.wait()
        x = xs[: t + 6, : t + 6, :cin]  # global rows [i*t-3, i*t+t+3)

        # c0 = conv3x3(x): (t+4, t+4, 4cin), global rows [i*t-2, i*t+t+2).
        acc = None
        for dy in range(3):
            for dx in range(3):
                d = jax.lax.dot_general(
                    x[dy : dy + t + 4, dx : dx + t + 4, :], w0_ref[dy, dx],
                    dimension_numbers=(((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                acc = d if acc is None else acc + d
        c0 = (acc + b0_ref[0].astype(jnp.float32)).astype(x.dtype)
        c0 = _edge_zero(c0, i * t - 2, j * t - 2, h_img, w_img)

        # stage 2: out2[a2,b2] (t+2, t+2, 4cin), coarse rows [i*t-1, i*t+t+1).
        out2 = []
        for a2 in range(2):
            for b2 in range(2):
                o = None
                for k, (dy, dx, Dy, Dx, ap, bp) in enumerate(_stage2_plan(a2, b2)):
                    q = (2 * ap + bp) * cin
                    d = jax.lax.dot_general(
                        c0[1 + Dy : 1 + Dy + t + 2, 1 + Dx : 1 + Dx + t + 2, q : q + cin],
                        w1s_ref[3 * dy + dx],
                        dimension_numbers=(((2,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    o = d if o is None else o + d
                o = (o + b1_ref[0].astype(jnp.float32)).astype(x.dtype)
                # fine row 2*coarse+a2 is in-image iff coarse is in [0, h_img)
                o = _edge_zero(o, i * t - 1, j * t - 1, h_img, w_img)
                out2.append(o)

        # stage 3: accumulate one dot per used (sub-plane, coarse shift) pair.
        na = len(_S3_AXIS)
        o3 = None
        for ri, (rp, Dy) in enumerate(_S3_AXIS):
            for ci, (sp, Dx) in enumerate(_S3_AXIS):
                o2 = out2[(rp // 2) * 2 + (sp // 2)]
                lane = ((rp % 2) * 2 + (sp % 2)) * cin
                d = jax.lax.dot_general(
                    o2[1 + Dy : 1 + Dy + t, 1 + Dx : 1 + Dx + t, lane : lane + cin],
                    w3_ref[ri * na + ci],
                    dimension_numbers=(((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                o3 = d if o3 is None else o3 + d
        o3 = o3 + b3_ref[0].astype(jnp.float32)
        out_ref[0] = o3.astype(out_ref.dtype)

    pl.run_scoped(
        body,
        xs=pltpu.VMEM((t + 8, t + 8, max(cin, 128)), out_ref.dtype),
        sem=pltpu.SemaphoreType.DMA,
    )


def _pick_tile(h: int, w: int) -> int:
    # t must keep the t+8 DMA read 8-aligned -> multiples of 8.
    for t in (24, 16, 8):
        if h % t == 0 and w % t == 0:
            return t
    return 0


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_upsample_x4(
    x: jnp.ndarray,  # (1, H, W, cin) — output of conv_before_upsample + lrelu
    w0, b0,  # (3,3,cin,4*cin) conv before first shuffle
    w1, b1,  # (3,3,cin,4*cin) conv before second shuffle
    w2, b2,  # (3,3,cin,n_colors) conv_last
    interpret: bool = False,
):
    """x4 pixelshuffle tail in one pass. Returns (1, 4H, 4W, n_colors), or
    ``None`` when the shape doesn't fit the fused layout (caller falls back
    to the XLA tail)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from studiosr_tpu.ops.pallas import engagement

    n, h, w, cin = x.shape
    n_colors = w2.shape[-1]
    tile = _pick_tile(h, w)
    if n != 1 or tile == 0 or w0.shape[-1] != 4 * cin or w1.shape[-1] != 4 * cin:
        return engagement.fallback(
            "fused_upsample_x4",
            f"layout mismatch: shape {x.shape}, tile={tile}, "
            f"w0 out {w0.shape[-1]} vs {4 * cin}",
        )
    engagement.engaged("fused_upsample_x4")

    perm = _quadrant_perm(cin)
    w0p = w0[..., perm]
    b0p = b0[perm].reshape(1, -1)
    w1p = w1[..., perm]  # outputs quadrant-contiguous for stage-3 lane slicing
    b1q = b1[perm].reshape(1, -1)

    # Stage-2 weights indexed (3*dy + dx); the output-quadrant dependence
    # lives entirely in WHICH c0 slice feeds each tap (the plan).
    w1s = w1p.reshape(9, cin, 4 * cin)

    # Stage-3 sparse-dense weight + packed bias.
    w3 = _stage3_weight(w2, cin, n_colors)
    b3 = jnp.tile(b2.reshape(1, -1).astype(jnp.float32), (1, 16))

    xp = jnp.pad(x, ((0, 0), (3, 5), (3, 5), (0, max(cin, 128) - cin)))
    grid = (h // tile, w // tile)
    kernel = functools.partial(_tail_kernel, tile=tile, cin=cin, n_colors=n_colors, hw=(h, w))
    full = lambda *shape: pl.BlockSpec(shape, lambda i, j: (0,) * len(shape), memory_space=pltpu.VMEM)
    packed = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # manual halo DMA
            full(3, 3, cin, 4 * cin), full(1, 4 * cin),
            full(9, cin, 4 * cin), full(1, 4 * cin),
            full(36, cin, 16 * n_colors), full(1, 16 * n_colors),
        ],
        out_specs=pl.BlockSpec((1, tile, tile, 16 * n_colors), lambda i, j: (0, i, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, h, w, 16 * n_colors), x.dtype),
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")
        ),
        interpret=interpret,
    )(
        xp,
        w0p.astype(x.dtype), b0p.astype(jnp.float32),
        w1s.astype(x.dtype), b1q.astype(jnp.float32),
        w3.astype(x.dtype), b3,
    )
    # depth-to-space of the (r, s, c) packing.
    packed = packed.reshape(1, h, w, 4, 4, n_colors)
    packed = packed.transpose(0, 1, 3, 2, 4, 5)
    return packed.reshape(1, 4 * h, 4 * w, n_colors)
