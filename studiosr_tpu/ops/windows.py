"""Window partitioning utilities for shifted-window attention models.

TPU-first counterparts of the reference helpers in
``studiosr/models/common.py:236-282``: window partition/reverse are pure
reshape/transposes (fused by XLA into the surrounding ops), while the shift
attention mask and relative-position index tables are computed in **numpy at
trace time** — image sizes are static under jit, so these become compile-time
constants instead of device work (the reference recomputes the mask on device
every forward, ``swinir.py:161``).
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

__all__ = [
    "window_partition",
    "window_reverse",
    "calculate_mask",
    "compress_mask",
    "relative_position_index",
    "relative_position_index_oca",
    "pad_to_multiple_reflect",
    "pad_to_multiple_flip",
]


def window_partition(x: jnp.ndarray, window_size: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B * nW, ws, ws, C) in row-major window order."""
    b, h, w, c = x.shape
    ws = window_size
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws, ws, c)


def window_reverse(windows: jnp.ndarray, window_size: int, h: int, w: int) -> jnp.ndarray:
    """(B * nW, ws, ws, C) -> (B, H, W, C), inverse of :func:`window_partition`."""
    ws = window_size
    b = windows.shape[0] // (h * w // ws // ws)
    x = windows.reshape(b, h // ws, w // ws, ws, ws, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, -1)


@lru_cache(maxsize=512)
def calculate_mask(x_size: tuple, window_size: int, shift_size: int) -> np.ndarray:
    """Shifted-window attention mask, (nW, ws*ws, ws*ws) with 0 / -100 fill.

    Same windows-from-the-same-region semantics as the reference
    (``common.py:250-274``) but computed host-side once per static shape.
    """
    h, w = x_size
    img_mask = np.zeros((h, w), dtype=np.float32)
    slices = (
        slice(0, -window_size),
        slice(-window_size, -shift_size),
        slice(-shift_size, None),
    )
    cnt = 0
    for hs in slices:
        for ws_ in slices:
            img_mask[hs, ws_] = cnt
            cnt += 1

    ws = window_size
    mask_windows = img_mask.reshape(h // ws, ws, w // ws, ws).transpose(0, 2, 1, 3).reshape(-1, ws * ws)
    attn_mask = mask_windows[:, None, :] - mask_windows[:, :, None]
    attn_mask = np.where(attn_mask != 0, -100.0, 0.0).astype(np.float32)
    return attn_mask


def compress_mask(mask: np.ndarray, nw_rows: int, nw_cols: int, chunk: int):
    """Compress a dense (nW, N, N) shift mask for block re-use in the fused
    attention kernels. Returns ``(mode, compressed)``.

    The dense mask is hugely redundant — with a cyclic shift, every window
    not in the last window-row/column carries the identical (all-zero) mask,
    yet the kernels stream the full operand once per shifted block: 17.8 MB
    f32 for SwinIR at a 264² map, 75.7 MB for HAT at 272² (HLO audit,
    scripts/exp_hlo_audit.py). Re-mapping repeated blocks to one index lets
    Mosaic skip the re-fetch between consecutive grid steps (its pipeline
    only issues a copy when an operand's block window changes).

    * ``("rows2", (2*chunk, N, N))`` — when ``chunk == nw_cols`` (whole-row
      blocks) and all interior window-rows are identical: block 0 = interior
      row, block 1 = last row. Kernel index map: ``i // (nw_rows - 1)``.
    * ``("cls4", (4*chunk, N, N))`` — when a row splits into >= 2
      chunk-window parts and part content depends only on its edge class:
      [interior, right, bottom, corner] parts.
      Kernel index map: ``2 * (i // (nw_rows-1)) + (j // (n_parts-1))``.
    * ``(None, None)`` — no compression applies (fall back to dense).

    The equality checks are exact (numpy, trace-time constants), so a
    compressed layout is bit-identical to the dense one by construction.
    """
    n = mask.shape[-1]
    if mask.shape[0] != nw_rows * nw_cols or chunk <= 0 or nw_cols % chunk:
        return None, None
    m = mask.reshape(nw_rows, nw_cols, n, n)
    if chunk == nw_cols and nw_rows >= 2:
        if all(np.array_equal(m[r], m[0]) for r in range(1, nw_rows - 1)):
            return "rows2", np.concatenate([m[0], m[-1]], axis=0)
    n_parts = nw_cols // chunk
    if n_parts >= 2 and nw_rows >= 2:
        reps = [m[0, :chunk], m[0, -chunk:], m[-1, :chunk], m[-1, -chunk:]]
        ok = all(
            np.array_equal(
                m[r, p * chunk : (p + 1) * chunk],
                reps[2 * (r == nw_rows - 1) + (p == n_parts - 1)],
            )
            for r in range(nw_rows)
            for p in range(n_parts)
        )
        if ok:
            return "cls4", np.concatenate(reps, axis=0)
    return None, None


@lru_cache(maxsize=64)
def relative_position_index(window_size: int) -> np.ndarray:
    """(ws*ws, ws*ws) gather indices into the (2ws-1)^2 rel-pos bias table.

    Matches the reference buffer computation (``swinir.py:57-67``,
    ``hat.py:480-495``) but host-side.
    """
    coords = np.stack(np.meshgrid(np.arange(window_size), np.arange(window_size), indexing="ij"))
    coords = coords.reshape(2, -1)
    relative = coords[:, :, None] - coords[:, None, :]
    relative = relative.transpose(1, 2, 0)
    relative[:, :, 0] += window_size - 1
    relative[:, :, 1] += window_size - 1
    relative[:, :, 0] *= 2 * window_size - 1
    return relative.sum(-1).astype(np.int32)


def gather_rel_bias(table, rpi: np.ndarray, heads: int):
    """(table_len, heads) rel-pos bias table -> (heads, nq, nk) bias via the
    numpy index grid from :func:`relative_position_index` (nq == nk) or
    :func:`relative_position_index_oca` (nk extended). One definition for
    the six serving/prep call sites."""
    nq, nk = rpi.shape
    return table[jnp.asarray(rpi.reshape(-1))].reshape(nq, nk, heads).transpose(2, 0, 1)


@lru_cache(maxsize=64)
def relative_position_index_oca(window_size: int, overlap_ratio: float) -> np.ndarray:
    """(ws*ws, wse*wse) rel-pos index for overlapping cross-attention.

    Query tokens live on the ws grid, key/value tokens on the extended
    ws + overlap grid (``hat.py:497-517``).
    """
    ws_ori = window_size
    ws_ext = window_size + int(overlap_ratio * window_size)

    coords_ori = np.stack(np.meshgrid(np.arange(ws_ori), np.arange(ws_ori), indexing="ij")).reshape(2, -1)
    coords_ext = np.stack(np.meshgrid(np.arange(ws_ext), np.arange(ws_ext), indexing="ij")).reshape(2, -1)

    relative = coords_ext[:, None, :] - coords_ori[:, :, None]
    relative = relative.transpose(1, 2, 0)
    relative[:, :, 0] += ws_ori - ws_ext + 1
    relative[:, :, 1] += ws_ori - ws_ext + 1
    relative[:, :, 0] *= ws_ori + ws_ext - 1
    return relative.sum(-1).astype(np.int32)


def pad_to_multiple_reflect(x: jnp.ndarray, multiple: int) -> jnp.ndarray:
    """Reflect-pad NHWC bottom/right to a window multiple (``common.py:277-282``)."""
    _, h, w, _ = x.shape
    pad_h = (multiple - h % multiple) % multiple
    pad_w = (multiple - w % multiple) % multiple
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)), mode="reflect")
    return x


def pad_to_multiple_flip(x: jnp.ndarray, multiple: int) -> jnp.ndarray:
    """Flip-concat padding used by SwinIR at eval time (``swinir.py:249-255``).

    Always extends to the *next* multiple (even when already aligned).
    """
    _, h, w, _ = x.shape
    pad_h = (h // multiple + 1) * multiple - h
    pad_w = (w // multiple + 1) * multiple - w
    x = jnp.concatenate([x, jnp.flip(x, axis=1)], axis=1)[:, : h + pad_h]
    x = jnp.concatenate([x, jnp.flip(x, axis=2)], axis=2)[:, :, : w + pad_w]
    return x
