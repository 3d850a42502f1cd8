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

__all__ = ["fused_upsample_x4", "fused_upsample_s"]


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


def _edge_zero(arr, row_start, col_start, row_limit, col_limit):
    """Zero rows/cols whose global coordinate falls outside [0, limit): the
    true chain zero-pads at EVERY resolution, so conv outputs at virtual
    positions beyond the image must be exactly 0 before the next stage."""
    h, w, _ = arr.shape
    rg = jax.lax.broadcasted_iota(jnp.int32, (h, 1, 1), 0) + row_start
    cg = jax.lax.broadcasted_iota(jnp.int32, (1, w, 1), 1) + col_start
    ok = (rg >= 0) & (rg < row_limit) & (cg >= 0) & (cg < col_limit)
    return jnp.where(ok, arr, jnp.zeros_like(arr))


# stage-3 (array index, coarse shift) combos per axis: fine 2H position
# p = (4H pos + tap - 1) // 2 in {-1..2} -> (array a2 = p & 1, shift = p >> 1).
_AX3 = [(1, -1), (0, 0), (1, 0), (0, 1)]


def _dy_pair(a2: int):
    """Stage-2 coarse row/col shifts reachable for output 2H-quadrant a2."""
    return (-1, 0) if a2 == 0 else (0, 1)


def _tail_kernel(
    x_hbm, w0s_ref, b0_ref, w1g_ref, b1_ref, w3g_ref, b3_ref, out_ref, xs2, sems,
    *, tile, cin, n_colors, hw,
):
    """Alignment discipline (round-3, see conv3x3._conv9): every dot's lhs
    free width is a multiple of 8 — stages run at padded widths t+16/t+8/t
    over a column-zero-extended input, junk columns never feed a valid
    output. Dots are grouped: stage 1 = 3 lane-stacked dy dots, stage 2 =
    2 dots per quadrant (Dy pair stacked on K), stage 3 = 16 dots over the
    hoisted (array, col-shift) slices. Old form: 9 + 36 + 36 dots on
    misaligned operands (relayout per dot); measured 5.97 ms -> this."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t = tile
    h_img, w_img = hw
    i = pl.program_id(0)
    j = pl.program_id(1)

    cpad = max(cin, 128)
    nj = pl.num_programs(1)
    npr = pl.num_programs(0) * nj
    lin = i * nj + j

    def _start(l, slot):
        # DMA slices must be 8-aligned on spatial dims and 128-aligned on
        # the channel dim (Mosaic tiling): read t+8 rows/cols of the
        # (3,5)-padded, channel-padded input. Double-buffered: program l
        # prefetches tile l+1 so the read overlaps this tile's dots.
        il, jl = l // nj, l % nj
        pltpu.make_async_copy(
            x_hbm.at[
                0,
                pl.ds(pl.multiple_of(il * t, 8), t + 8),
                pl.ds(pl.multiple_of(jl * t, 8), t + 8),
                :,
            ],
            xs2.at[slot],
            sems.at[slot],
        ).start()

    @pl.when(lin == 0)
    def _():
        _start(0, 0)

    @pl.when(lin + 1 < npr)
    def _():
        _start(lin + 1, (lin + 1) % 2)

    def body():
        pltpu.make_async_copy(
            x_hbm.at[0, pl.ds(0, t + 8), pl.ds(0, t + 8), :], xs2.at[lin % 2], sems.at[lin % 2]
        ).wait()
        x = xs2[lin % 2]  # rows [i*t-3, i*t+t+5), cols [j*t-3, j*t+t+5), cpad ch
        zc = jnp.zeros((t + 8, 8, cpad), x.dtype)
        xz = jnp.concatenate([zc, x, zc], axis=1)  # col v <-> img j*t-11+v

        # stage 1: c0 (t+4, t+16, 4cin); rows [i*t-2, ...), cols [j*t-10, ...)
        acc = None
        for dx in range(3):
            col = xz[:, dx : dx + t + 16, :]
            lhs = jnp.concatenate([col[dy : dy + t + 4] for dy in range(3)], axis=-1)
            d = jax.lax.dot_general(
                lhs, w0s_ref[dx],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = d if acc is None else acc + d
        c0 = (acc + b0_ref[0].astype(jnp.float32)).astype(x.dtype)
        c0 = _edge_zero(c0, i * t - 2, j * t - 10, h_img, w_img)

        # stage 2: out2[(a2,b2)] (t+2, t+8, 4cin); rows [i*t-1), cols [j*t-4).
        # Hoisted col slices (the only misaligned copies); Dy rides the
        # untiled row axis free, stacked in pairs along K.
        sl = {dxs: c0[:, 6 + dxs : 6 + dxs + t + 8, :] for dxs in (-1, 0, 1)}
        out2 = {}
        for a2 in range(2):
            dys = _dy_pair(a2)
            for b2 in range(2):
                o = None
                for ds, dxs in enumerate(_dy_pair(b2)):
                    lhs = jnp.concatenate(
                        [sl[dxs][1 + dy : 1 + dy + t + 2] for dy in dys], axis=-1
                    )  # (t+2, t+8, 2*4cin)
                    d = jax.lax.dot_general(
                        lhs, w1g_ref[2 * (2 * a2 + b2) + ds],
                        dimension_numbers=(((2,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    o = d if o is None else o + d
                o = (o + b1_ref[0].astype(jnp.float32)).astype(x.dtype)
                # fine row 2*coarse+a2 is in-image iff coarse is in [0, h_img)
                out2[(a2, b2)] = _edge_zero(o, i * t - 1, j * t - 4, h_img, w_img)

        # stage 3: 16 dots over (y-combo, x-combo); col slices hoisted per
        # (array, Dx), row shifts free.
        sl3 = {}
        for (ay, ax), o2 in [(k, v) for k, v in out2.items()]:
            for _, dxs in [(a, d) for (a, d) in _AX3 if a == ax]:
                sl3[(ay, ax, dxs)] = o2[:, 4 + dxs : 4 + dxs + t, :]
        o3 = None
        for iy, (ay, dys) in enumerate(_AX3):
            for ix, (ax, dxs) in enumerate(_AX3):
                d = jax.lax.dot_general(
                    sl3[(ay, ax, dxs)][1 + dys : 1 + dys + t],
                    w3g_ref[4 * iy + ix],
                    dimension_numbers=(((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                o3 = d if o3 is None else o3 + d
        o3 = o3 + b3_ref[0].astype(jnp.float32)
        out_ref[0] = o3.astype(out_ref.dtype)

    body()


def _pick_tile(h: int, w: int) -> int:
    # t must keep the t+8 DMA read 8-aligned -> multiples of 8.
    for t in (24, 16, 8):
        if h % t == 0 and w % t == 0:
            return t
    return 0


def prepare_upsample_x4_weights(w0, b0, w1, b1, w2, b2, dtype):
    """Pre-lay the x4 tail's quadrant-planar stage weights (the dict
    ``fused_upsample_x4`` takes via ``prep=``). The in-trace assembly is a
    chain of ~180 scatter-updates over 2-4 MB buffers that re-executes
    every forward (scan-body HLO audit) — built once at load time instead."""
    cin = w0.shape[2]
    n_colors = w2.shape[-1]
    return _build_x4_stage_weights(
        w0.astype(dtype), b0, w1.astype(dtype), b1, w2.astype(dtype), b2, cin, n_colors
    )


def _build_x4_stage_weights(w0, b0, w1, b1, w2, b2, cin, n_colors):
    perm = _quadrant_perm(cin)
    cpad = max(cin, 128)
    c4 = 4 * cin
    w0p = w0[..., perm]
    b0p = b0[perm].reshape(1, -1)
    w1p = w1[..., perm]  # outputs quadrant-contiguous for stage-3 lane slicing
    b1q = b1[perm].reshape(1, -1)

    # Stage-1 weights: dy taps lane-stacked per dx (3 dots in-kernel).
    w0sp = jnp.pad(w0p.astype(jnp.float32), ((0, 0), (0, 0), (0, cpad - cin), (0, 0)))
    w0s = w0sp.transpose(1, 0, 2, 3).reshape(3, 3 * cpad, c4)

    # Stage-2 grouped weights: per output quadrant (a2,b2) and col-shift
    # slot ds, the two row shifts of the quadrant's Dy pair ride a stacked
    # K axis; each tap's input-quadrant choice is embedded as the K block.
    w1g = jnp.zeros((8, 2 * c4, c4), jnp.float32)
    for qa in range(2):
        dys = _dy_pair(qa)
        for qb in range(2):
            dxs_pair = _dy_pair(qb)
            for dy in range(3):
                for dx in range(3):
                    Dy, ap = _fine_to_coarse(qa + dy - 1, 2)
                    Dx, bp = _fine_to_coarse(qb + dx - 1, 2)
                    ds = dxs_pair.index(Dx)
                    row = dys.index(Dy) * c4 + (2 * ap + bp) * cin
                    w1g = w1g.at[
                        2 * (2 * qa + qb) + ds, row : row + cin, :
                    ].add(w1p[dy, dx].astype(jnp.float32))

    # Stage-3 grouped weights: per (y-combo, x-combo) of _AX3, the
    # sub-quadrant lane selection is embedded as the K block.
    w3g = jnp.zeros((16, c4, 16 * n_colors), jnp.float32)
    ax_index = {pair: k for k, pair in enumerate(_AX3)}
    for r in range(4):
        for s in range(4):
            for dy in range(3):
                for dx in range(3):
                    py, px = r + dy - 1, s + dx - 1
                    qy, qx = py // 2, px // 2  # fine-2H index -> (array, shift)
                    iy = ax_index[(qy % 2, qy // 2)]
                    ix = ax_index[(qx % 2, qx // 2)]
                    row = (2 * (py % 2) + (px % 2)) * cin
                    w3g = w3g.at[
                        4 * iy + ix, row : row + cin,
                        (r * 4 + s) * n_colors : (r * 4 + s + 1) * n_colors,
                    ].add(w2[dy, dx].astype(jnp.float32))
    b3 = jnp.tile(b2.reshape(1, -1).astype(jnp.float32), (1, 16))
    return {"w0s": w0s, "b0p": b0p, "w1g": w1g, "b1q": b1q, "w3g": w3g, "b3": b3}


@functools.partial(jax.jit, static_argnames=("interpret", "batched_map"))
def fused_upsample_x4(
    x: jnp.ndarray,  # (1, H, W, cin) — output of conv_before_upsample + lrelu
    w0, b0,  # (3,3,cin,4*cin) conv before first shuffle
    w1, b1,  # (3,3,cin,4*cin) conv before second shuffle
    w2, b2,  # (3,3,cin,n_colors) conv_last
    interpret: bool = False,
    batched_map: bool = True,
    prep=None,  # optional prepare_upsample_x4_weights dict
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
    if n != 1 and batched_map and tile != 0 and w0.shape[-1] == 4 * cin and w1.shape[-1] == 4 * cin:
        # The kernel is single-image (its manual-DMA prefetch ring orders a
        # 2-D tile grid); batch via lax.map — the grid was sequential anyway,
        # so a per-image scan loses no parallelism (tiled serving tile_batch)
        # SINGLE-CHIP. Callers with a device-sharded batch (mesh-sharded
        # tiled inference) pass batched_map=False: the sequential map would
        # serialize the batch across chips, where the XLA tail runs
        # batch-parallel.
        return jax.lax.map(
            lambda one: fused_upsample_x4(one[None], w0, b0, w1, b1, w2, b2, interpret=interpret, prep=prep)[0], x
        )
    if n != 1 or tile == 0 or w0.shape[-1] != 4 * cin or w1.shape[-1] != 4 * cin:
        why = []
        if n != 1 and not batched_map:
            why.append("batched_map disabled (device-sharded batch)")
        if tile == 0:
            why.append(f"no valid tile for {h}x{w}")
        if w0.shape[-1] != 4 * cin or w1.shape[-1] != 4 * cin:
            why.append(f"ladder widths {w0.shape[-1]}/{w1.shape[-1]} != {4 * cin}")
        return engagement.fallback("fused_upsample_x4", "; ".join(why))
    engagement.engaged("fused_upsample_x4")

    cpad = max(cin, 128)
    c4 = 4 * cin
    if prep is None:
        prep = _build_x4_stage_weights(w0, b0, w1, b1, w2, b2, cin, n_colors)
    w0s, b0p, w1g, b1q, w3g, b3 = (prep[k] for k in ("w0s", "b0p", "w1g", "b1q", "w3g", "b3"))

    xp = jnp.pad(x, ((0, 0), (3, 5), (3, 5), (0, cpad - cin)))
    grid = (h // tile, w // tile)
    kernel = functools.partial(_tail_kernel, tile=tile, cin=cin, n_colors=n_colors, hw=(h, w))
    full = lambda *shape: pl.BlockSpec(shape, lambda i, j: (0,) * len(shape), memory_space=pltpu.VMEM)
    packed = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # manual halo DMA
            full(3, 3 * cpad, c4), full(1, c4),
            full(8, 2 * c4, c4), full(1, c4),
            full(16, c4, 16 * n_colors), full(1, 16 * n_colors),
        ],
        out_specs=pl.BlockSpec((1, tile, tile, 16 * n_colors), lambda i, j: (0, i, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, h, w, 16 * n_colors), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, tile + 8, tile + 8, cpad), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            # sequential grid order is what makes the +1 prefetch correct
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        xp,
        w0s.astype(x.dtype), b0p.astype(jnp.float32),
        w1g.astype(x.dtype), b1q.astype(jnp.float32),
        w3g.astype(x.dtype), b3,
    )
    # depth-to-space of the (r, s, c) packing.
    packed = packed.reshape(1, h, w, 4, 4, n_colors)
    packed = packed.transpose(0, 1, 3, 2, 4, 5)
    return packed.reshape(1, 4 * h, 4 * w, n_colors)


# ---------------------------------------------------------------------------
# Single-shuffle tails (x2 / x3 classical): conv3x3 -> pixel_shuffle(s) ->
# conv_last, in one HBM pass, same aligned-planar discipline as the x4
# kernel. Reference ladder: studiosr/models/common.py:124-137 (x2 uses one
# log2 step, x3 the single s^2 shuffle) + conv_last (swinir.py:363-366).
# ---------------------------------------------------------------------------


def _perm_s(cb: int, s: int) -> np.ndarray:
    """Torch pixel-shuffle channels (k*s^2 + a*s + b) -> quadrant-contiguous
    lanes ((s*a+b)*cb + k)."""
    perm = np.empty(cb * s * s, np.int64)
    for a in range(s):
        for b in range(s):
            for k in range(cb):
                perm[(s * a + b) * cb + k] = k * s * s + a * s + b
    return perm


def _ax_s(s: int):
    """(sub-plane, coarse shift) combos per axis for a 3x3 conv at sH:
    fine positions r+dy-1 in [-1, s] -> (p % s, p // s)."""
    seen = []
    for p in range(-1, s + 1):
        pair = (p % s, p // s)
        if pair not in seen:
            seen.append(pair)
    return seen


def _tail_kernel_s(
    x_hbm, w0s_ref, b0_ref, wg_ref, bg_ref, out_ref, *, tile, cin, n_colors, hw, s,
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t = tile
    h_img, w_img = hw
    i = pl.program_id(0)
    j = pl.program_id(1)
    cpad = max(cin, 128)
    ax = _ax_s(s)

    def body(xs, sem):
        dma = pltpu.make_async_copy(
            x_hbm.at[0, pl.ds(i * t, t + 8), pl.ds(j * t, t + 8), :], xs, sem
        )
        dma.start()
        dma.wait()
        x = xs[...]  # rows [i*t-3, i*t+t+5), cols [j*t-3, j*t+t+5)
        zc = jnp.zeros((t + 8, 8, cpad), x.dtype)
        xz = jnp.concatenate([zc, x, zc], axis=1)  # col v <-> img j*t-11+v

        # c0 (t+2, t+8, s^2*cin): rows [i*t-1, ...), cols [j*t-4, ...).
        acc = None
        for dx in range(3):
            col = xz[:, 6 + dx : 6 + dx + t + 8, :]
            lhs = jnp.concatenate([col[1 + dy : 1 + dy + t + 2] for dy in range(3)], axis=-1)
            d = jax.lax.dot_general(
                lhs, w0s_ref[dx],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = d if acc is None else acc + d
        c0 = (acc + b0_ref[0].astype(jnp.float32)).astype(x.dtype)
        c0 = _edge_zero(c0, i * t - 1, j * t - 4, h_img, w_img)

        # conv_last at sH: one dot per (y-combo, x-combo); col slices hoisted
        # per Dx, row shifts free.
        sl = {dxs: c0[:, 4 + dxs : 4 + dxs + t, :] for dxs in {d for _, d in ax}}
        o = None
        for iy, (_, dys) in enumerate(ax):
            for ix, (_, dxs) in enumerate(ax):
                d = jax.lax.dot_general(
                    sl[dxs][1 + dys : 1 + dys + t],
                    wg_ref[len(ax) * iy + ix],
                    dimension_numbers=(((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                o = d if o is None else o + d
        o = o + bg_ref[0].astype(jnp.float32)
        out_ref[0] = o.astype(out_ref.dtype)

    pl.run_scoped(
        body,
        xs=pltpu.VMEM((t + 8, t + 8, max(cin, 128)), out_ref.dtype),
        sem=pltpu.SemaphoreType.DMA,
    )


def prepare_upsample_s_weights(w0, b0, w2, b2, s, dtype):
    """Pre-lay the single-shuffle tail's stage weights (``prep=`` of
    :func:`fused_upsample_s`); see prepare_upsample_x4_weights."""
    cin = w0.shape[2]
    n_colors = w2.shape[-1]
    return _build_s_stage_weights(w0.astype(dtype), b0, w2.astype(dtype), b2, s, cin, n_colors)


def _build_s_stage_weights(w0, b0, w2, b2, s, cin, n_colors):
    perm = _perm_s(cin, s)
    cpad = max(cin, 128)
    cs = s * s * cin
    w0p = w0[..., perm]
    b0p = b0[perm].reshape(1, -1)
    w0sp = jnp.pad(w0p.astype(jnp.float32), ((0, 0), (0, 0), (0, cpad - cin), (0, 0)))
    w0s = w0sp.transpose(1, 0, 2, 3).reshape(3, 3 * cpad, cs)

    ax = _ax_s(s)
    na = len(ax)
    ax_index = {pair: k for k, pair in enumerate(ax)}
    wg = jnp.zeros((na * na, cs, s * s * n_colors), jnp.float32)
    for r in range(s):
        for s_ in range(s):
            for dy in range(3):
                for dx in range(3):
                    py, px = r + dy - 1, s_ + dx - 1
                    iy = ax_index[(py % s, py // s)]
                    ix = ax_index[(px % s, px // s)]
                    row = (s * (py % s) + (px % s)) * cin
                    wg = wg.at[
                        na * iy + ix, row : row + cin,
                        (r * s + s_) * n_colors : (r * s + s_ + 1) * n_colors,
                    ].add(w2[dy, dx].astype(jnp.float32))
    bg = jnp.tile(b2.reshape(1, -1).astype(jnp.float32), (1, s * s))
    return {"w0s": w0s, "b0p": b0p, "wg": wg, "bg": bg}


@functools.partial(jax.jit, static_argnames=("s", "interpret", "batched_map"))
def fused_upsample_s(
    x: jnp.ndarray,  # (1, H, W, cin) — output of conv_before_upsample + lrelu
    w0, b0,  # (3,3,cin,s^2*cin) conv before the shuffle
    w2, b2,  # (3,3,cin,n_colors) conv_last
    s: int = 2,
    interpret: bool = False,
    batched_map: bool = True,
    prep=None,  # optional prepare_upsample_s_weights dict
):
    """Single-shuffle tail (x2/x3 classical) in one pass. Returns
    (1, sH, sW, n_colors) or ``None`` on layout mismatch."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from studiosr_tpu.ops.pallas import engagement

    n, h, w, cin = x.shape
    n_colors = w2.shape[-1]
    tile = _pick_tile(h, w)
    if n != 1 and batched_map and tile != 0 and w0.shape[-1] == s * s * cin:
        # Batch via lax.map; see fused_upsample_x4 (sequential grid anyway —
        # single-chip only; sharded-batch callers pass batched_map=False).
        return jax.lax.map(
            lambda one: fused_upsample_s(one[None], w0, b0, w2, b2, s=s, interpret=interpret, prep=prep)[0], x
        )
    if n != 1 or tile == 0 or w0.shape[-1] != s * s * cin:
        why = []
        if n != 1 and not batched_map:
            why.append("batched_map disabled (device-sharded batch)")
        if tile == 0:
            why.append(f"no valid tile for {h}x{w}")
        if w0.shape[-1] != s * s * cin:
            why.append(f"ladder width {w0.shape[-1]} != {s * s * cin}")
        return engagement.fallback("fused_upsample_s", "; ".join(why))
    engagement.engaged("fused_upsample_s")

    cpad = max(cin, 128)
    cs = s * s * cin
    ax = _ax_s(s)
    na = len(ax)
    if prep is None:
        prep = _build_s_stage_weights(w0, b0, w2, b2, s, cin, n_colors)
    w0s, b0p, wg, bg = (prep[k] for k in ("w0s", "b0p", "wg", "bg"))

    xp = jnp.pad(x, ((0, 0), (3, 5), (3, 5), (0, cpad - cin)))
    grid = (h // tile, w // tile)
    kernel = functools.partial(
        _tail_kernel_s, tile=tile, cin=cin, n_colors=n_colors, hw=(h, w), s=s
    )
    full = lambda *shape: pl.BlockSpec(shape, lambda i, j: (0,) * len(shape), memory_space=pltpu.VMEM)
    packed = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # manual halo DMA
            full(3, 3 * cpad, cs), full(1, cs),
            full(na * na, cs, s * s * n_colors), full(1, s * s * n_colors),
        ],
        out_specs=pl.BlockSpec(
            (1, tile, tile, s * s * n_colors), lambda i, j: (0, i, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((1, h, w, s * s * n_colors), x.dtype),
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        xp,
        w0s.astype(x.dtype), b0p.astype(jnp.float32),
        wg.astype(x.dtype), bg,
    )
    # depth-to-space of the (r, s_, c) packing.
    packed = packed.reshape(1, h, w, s, s, n_colors)
    packed = packed.transpose(0, 1, 3, 2, 4, 5)
    return packed.reshape(1, s * h, s * w, n_colors)
