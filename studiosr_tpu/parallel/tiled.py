"""Tiled-patch inference: static-shape, batched, optionally mesh-sharded.

The reference runs every image through one whole-image forward
(``studiosr/models/common.py:36-48``), which under XLA would recompile per
image shape and cap the largest processable image at HBM size. This pipeline
replaces it for large inputs (SURVEY.md §7 step 6):

  pad -> static tile batch (overlapping) -> batched forward -> overlap-discard
  reassembly

* ONE compiled program per (tile, batch) shape — image size only changes the
  number of tiles;
* tiles are processed in fixed-size batches (padded with zeros at the tail),
  keeping the MXU fed;
* with a mesh, the tile batch is sharded over devices — a spatial (SP-like)
  decomposition of one image across chips; overlap-discard plays the role of
  halo exchange (each tile carries its own halo).

Window models are exactly tile-consistent when ``tile`` is a window multiple;
outputs can differ from whole-image inference only through cross-window
context beyond the overlap, which ``tile_overlap`` controls.
"""

from __future__ import annotations

import math
import os
from collections import deque

import numpy as np

__all__ = ["tiled_inference", "tile_grid"]

# Concurrent D2H streams for the device-loop frame fetch (measured on the
# relay: 12.5 MB/s single-stream, 28.8 with two, ~49 effective with four —
# transfers parallelize even though they serialize against dispatches; 8
# streams measured WORSE, 2608 vs 1893 ms/frame at 720p, so 4 is the knee).
# Harmless on fast hosts (PCIe moves the frame in one chunk regardless).
_FETCH_STREAMS = int(os.environ.get("STUDIOSR_FETCH_STREAMS", "4"))


def tile_grid(size: int, tile: int, stride: int) -> np.ndarray:
    """Start offsets covering [0, size) with final tile snapped to the edge."""
    if size <= tile:
        return np.array([0])
    starts = list(range(0, size - tile + 1, stride))
    if starts[-1] != size - tile:
        starts.append(size - tile)
    return np.array(starts)


def tiled_inference(
    model,
    image: np.ndarray,
    tile: int = 128,
    tile_overlap: int = 16,
    tile_batch: int = 8,
    mesh=None,
    device_loop: bool | None = None,
) -> np.ndarray:
    """uint8 HWC -> upscaled uint8 HWC via overlapping tiles.

    Drop-in alternative to ``model.inference`` for large images. ``tile`` and
    ``tile_overlap`` are in LR pixels; tiles overlap by ``2*tile_overlap``
    and only each tile's interior (non-halo) region is written to the output,
    except at image borders where the halo is kept.

    ``device_loop`` selects where the tile loop runs:

    * ``True`` — the whole pipeline (tile extraction, batched forward via
      ``lax.map``, overlap-discard reassembly) is ONE jitted program; the
      image crosses the host boundary exactly twice (uint8 LR in, uint8 HR
      out). This removes the per-batch dispatch/fetch overhead that
      dominates host-loop tiling on relay-attached chips (~260 ms/batch
      measured), at the cost of one compile per padded-image shape — the
      right mode for fixed-shape streams (video frames).
    * ``False`` — host loop, one dispatch per tile batch (pipelined, uint8
      both ways). The right mode for one-off odd-shaped images and for
      multi-host jobs. Both loops support ``mesh`` sharding (fused models
      ride shard_map per the manual-SPMD contract).
    * ``None`` (default) — device loop on a single process when the tile
      count is small enough that unrolled reassembly stays cheap to compile.
    """
    scale = model.scale
    h, w, c = image.shape

    tile = min(tile, max(h, w))
    # Clamp the overlap too: an image smaller than the default tile shrank
    # `tile` above, and the unclamped default overlap would drive the stride
    # negative (one small frame crashing a variably-sized stream).
    tile_overlap = min(tile_overlap, (tile - 1) // 2)
    stride = tile - 2 * tile_overlap
    assert stride > 0, "tile_overlap too large for tile size"

    # Pad so every tile fits (reflect, like the window models' own padding;
    # fall back to edge replication when the pad exceeds the dimension —
    # e.g. a short-wide image with a large tile).
    pad_h = max(0, tile - h)
    pad_w = max(0, tile - w)
    if pad_h or pad_w:
        mode = "reflect" if (pad_h < h and pad_w < w) else "edge"
        padded = np.pad(image, ((0, pad_h), (0, pad_w), (0, 0)), mode=mode)
    else:
        padded = image
    ph, pw = padded.shape[:2]

    ys = tile_grid(ph, tile, stride)
    xs = tile_grid(pw, tile, stride)
    coords = [(y, x) for y in ys for x in xs]

    n = len(coords)
    batch = min(tile_batch, int(2 ** math.ceil(math.log2(max(1, n)))))
    if mesh is not None:
        n_dev = mesh.size
        batch = -(-max(batch, n_dev) // n_dev) * n_dev  # multiple of the device count

    import jax

    if mesh is not None and jax.process_count() > 1:
        # Cross-process spatial decomposition cannot complete here: every
        # process holds the identical full image, so the multihost
        # shard_batch branch would misread each copy as that process's
        # LOCAL slice (each tile computed P times), and the sharded output
        # spans non-addressable devices the host fetch cannot read. Pods
        # parallelize serving across images instead: each process runs its
        # own frames on its local devices (mesh=None, or a mesh over
        # jax.local_devices()).
        raise ValueError(
            "tiled_inference(mesh=...) with jax.process_count() > 1: pass a "
            "mesh over this process's local devices (or mesh=None) and "
            "shard IMAGES across processes instead"
        )

    if device_loop is None:
        # Default on when unrolled reassembly stays cheap to compile.
        device_loop = n <= 512
    if device_loop:
        return _device_tiled(model, padded, coords, tile, tile_overlap, batch, h, w, mesh=mesh)

    tiles = np.stack([padded[y : y + tile, x : x + tile] for y, x in coords])

    out_tile = tile * scale
    output = np.zeros((ph * scale, pw * scale, c), dtype=np.uint8)

    def _write(sr: np.ndarray, start: int) -> None:
        for j, (y, x0) in enumerate(coords[start : start + batch]):
            oy, ox = y * scale, x0 * scale
            # Interior region: discard the halo except at the borders.
            top = 0 if y == 0 else tile_overlap * scale
            left = 0 if x0 == 0 else tile_overlap * scale
            bottom = out_tile if y + tile >= ph else out_tile - tile_overlap * scale
            right = out_tile if x0 + tile >= pw else out_tile - tile_overlap * scale
            output[oy + top : oy + bottom, ox + left : ox + right] = sr[j, top:bottom, left:right]

    # Host<->device traffic rides as uint8 both ways (normalize and
    # round/clip/cast live inside the jitted program, Model.forward_uint8),
    # and up to `inflight` batches are dispatched ahead of the transfer:
    # JAX dispatch is async, so batch k's D2H copy + host reassembly overlap
    # batch k+1's compute instead of serializing on the per-fetch RPC
    # latency (~24 ms on a relay-attached chip, per-batch compile excluded).
    inflight: deque = deque()
    depth = 2

    def _drain() -> None:
        sr_dev, start = inflight.popleft()
        _write(np.asarray(sr_dev), start)

    for start in range(0, n, batch):
        chunk = tiles[start : start + batch]
        if len(chunk) < batch:  # zero-pad the tail batch to the static shape
            fill = np.zeros((batch - len(chunk), tile, tile, c), np.uint8)
            chunk = np.concatenate([chunk, fill])
        x = chunk
        if mesh is not None:
            from studiosr_tpu.parallel.mesh import shard_batch

            x = shard_batch(x, mesh)
            # sharded=True: no per-image tail lax.map (it would serialize
            # the device-sharded batch); tails take the batch-parallel XLA
            # path, block kernels ride the grid batch dim as usual.
        if model.needs_manual_spmd(mesh):
            # Fused serving on a >1-device mesh MUST go through shard_map:
            # Mosaic kernels cannot be GSPMD-auto-partitioned (base.py
            # needs_manual_spmd). Per-shard the full fused path engages,
            # tails included.
            sr_dev = model.manual_forward_uint8(x, mesh)
        else:
            sr_dev = model.forward_uint8(x, sharded=mesh is not None)
        try:
            sr_dev.copy_to_host_async()
        except (AttributeError, NotImplementedError):  # backend-optional
            pass
        inflight.append((sr_dev, start))
        if len(inflight) > depth:
            _drain()
    while inflight:
        _drain()

    return output[: h * scale, : w * scale]


def _device_tiled(
    model, padded: np.ndarray, coords, tile: int, tile_overlap: int, batch: int, h: int, w: int, mesh=None
):
    """One-jit tiled inference: the padded uint8 LR image goes to the device
    once; tile extraction (static ``lax.slice`` per tile — coords are
    host-static), the batched forward (``lax.map`` over fixed-size batches,
    so the model compiles once and HBM holds one batch of activations), and
    overlap-discard reassembly (static ``.at[].set`` writes in the same
    order as the host loop, so snapped-edge overlaps resolve identically)
    all live in one compiled program; the uint8 HR image comes back once.

    With a ``mesh``, each ``lax.map`` batch is sharded over the data axis —
    one image spatially decomposed across chips (SP over ICI) in a single
    dispatch. Fused models run the batch under ``shard_map`` (manual SPMD —
    Mosaic kernels cannot be GSPMD-partitioned) where the full fused path
    INCLUDING the per-image tails engages per shard; unfused models take
    the GSPMD path with a sharding constraint. Reassembly runs replicated.

    Recompiles per (padded shape, tile, overlap, batch) — reused across a
    fixed-shape stream. The cache also keys on ``model._jit_forward`` so
    ``enable_fused``/``half`` rebuild it.
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    scale = model.scale
    ph, pw, c = padded.shape
    n = len(coords)
    n_b = -(-n // batch)
    out_tile = tile * scale
    # Dict cache per geometry (a stream alternating two frame shapes — e.g.
    # portrait/landscape stills — must keep BOTH compiled programs live;
    # a single-entry cache dropped the jitted callable on every key change
    # and re-paid the 30s-15min remote compile per frame). Reset as a whole
    # when the serving configuration (_jit_forward) is rebuilt.
    key = (ph, pw, c, tile, tile_overlap, batch, mesh, _FETCH_STREAMS)
    cache = getattr(model, "_tiled_fwd_cache", None)
    if cache is None or cache[0] is not model._jit_forward:
        cache = (model._jit_forward, {})
        model._tiled_fwd_cache = cache
    if key not in cache[1]:
        coords_t = tuple((int(y), int(x)) for y, x in coords)
        ts = tile_overlap * scale
        if mesh is not None:
            from studiosr_tpu.parallel.mesh import data_sharding

            batch_sh = data_sharding(mesh, 4)
        manual = model.needs_manual_spmd(mesh)
        if manual:
            # Fused serving on a >1-device mesh must run under shard_map
            # (Mosaic kernels cannot be GSPMD-auto-partitioned — base.py
            # needs_manual_spmd); per-shard the full fused path engages.
            smap = type(model).shard_map_batch(
                lambda v, b, p: model._forward_uint8(v, b, sharded=False, prep=p), mesh
            )

        def run(variables, img, prep=None):
            tiles = [lax.slice(img, (y, x, 0), (y + tile, x + tile, c)) for y, x in coords_t]
            tiles += [jnp.zeros((tile, tile, c), img.dtype)] * (n_b * batch - n)
            stack = jnp.stack(tiles).reshape(n_b, batch, tile, tile, c)

            def fwd(b):
                if manual:
                    return smap(variables, b, prep)
                if mesh is not None:
                    b = lax.with_sharding_constraint(b, batch_sh)
                return model._forward_uint8(variables, b, sharded=mesh is not None, prep=prep)

            srs = lax.map(fwd, stack)
            srs = srs.reshape(n_b * batch, out_tile, out_tile, c)
            out = jnp.zeros((ph * scale, pw * scale, c), jnp.uint8)
            for j, (y, x0) in enumerate(coords_t):
                oy, ox = y * scale, x0 * scale
                top = 0 if y == 0 else ts
                left = 0 if x0 == 0 else ts
                bottom = out_tile if y + tile >= ph else out_tile - ts
                right = out_tile if x0 + tile >= pw else out_tile - ts
                out = out.at[oy + top : oy + bottom, ox + left : ox + right].set(srs[j, top:bottom, left:right])
            # Emit the frame as row-band chunks: the host fetches them on
            # concurrent streams (measured 12.5 -> 28.8 MB/s with 2 on the
            # relay, where single-stream D2H dominates large-frame serving).
            streams = max(1, min(_FETCH_STREAMS, ph * scale))
            splits = [(i * (ph * scale)) // streams for i in range(1, streams)]
            return tuple(jnp.split(out, splits, axis=0))
        cache[1][key] = jax.jit(run)

    fn = cache[1][key]
    prep = model.serving_prep()
    if prep is not None:
        chunks = fn(model.variables, padded, prep)
    else:
        chunks = fn(model.variables, padded)
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(len(chunks)) as pool:
        parts = list(pool.map(np.asarray, chunks))
    out = np.concatenate(parts, axis=0)
    return out[: h * scale, : w * scale]
