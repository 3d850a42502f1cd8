"""Dissect device-loop tiled serving: compute vs D2H transfer.

    python scripts/exp_tiled_device.py --hr-size 720 1280 --tile 128

Times, for the one-jit device-loop tiled program (parallel/tiled.py):
  (a) raw H2D + D2H bandwidth at the frame's sizes (uint8);
  (b) the tiled program with a SCALAR fetch (pure device compute);
  (c) the full tiled_inference call (compute + 44 MB-class HR fetch).
On a relay-attached chip (c) - (b) is the transfer cost; production hosts
move the same bytes over PCIe at GB/s.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="swinir")
    p.add_argument("--scale", type=int, default=4)
    p.add_argument("--hr-size", type=int, nargs=2, default=[720, 1280], metavar=("H", "W"))
    p.add_argument("--tile", type=int, default=128)
    p.add_argument("--tile-overlap", type=int, default=16)
    p.add_argument("--tile-batch", type=int, default=8)
    p.add_argument("--reps", type=int, default=3)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from studiosr_tpu.utils.helpers import enable_compilation_cache
    from studiosr_tpu.zoo.registry import get_model_class

    enable_compilation_cache()
    h, w = args.hr_size
    s = args.scale

    # (a) raw transfer bandwidth at the frame's shapes. Each D2H rep fetches
    # a DISTINCT device array: jax.Array caches its host copy, so re-fetching
    # the same array measures nothing.
    lr_host = np.random.default_rng(0).integers(0, 256, (h, w, 3), dtype=np.uint8)
    best = float("inf")
    for _ in range(args.reps):
        t0 = time.perf_counter()
        jax.device_put(lr_host).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    print(f"  H2D LR: {lr_host.nbytes/1e6:.1f} MB in {best*1e3:.0f} ms = {lr_host.nbytes/1e6/best:.1f} MB/s",
          flush=True)

    nbytes = h * s * w * s * 3
    fresh = jax.jit(lambda i: jnp.full((h * s, w * s, 3), i, jnp.uint8))
    best = float("inf")
    for i in range(args.reps):
        a = fresh(i).block_until_ready()
        t0 = time.perf_counter()
        np.asarray(a)
        best = min(best, time.perf_counter() - t0)
    print(f"  D2H HR: {nbytes/1e6:.1f} MB in {best*1e3:.0f} ms = {nbytes/1e6/best:.1f} MB/s", flush=True)

    # Do two concurrent fetch streams parallelize, or does the relay
    # serialize the data plane? (If ~2x: thread the tiled fetch.)
    from concurrent.futures import ThreadPoolExecutor

    half = jax.jit(lambda i: jnp.full((h * s // 2, w * s, 3), i, jnp.uint8))
    best = float("inf")
    with ThreadPoolExecutor(2) as pool:
        for i in range(args.reps):
            a1 = half(2 * i + 100).block_until_ready()
            a2 = half(2 * i + 101).block_until_ready()
            t0 = time.perf_counter()
            list(pool.map(np.asarray, [a1, a2]))
            best = min(best, time.perf_counter() - t0)
    print(f"  D2H HR 2 threads: {nbytes/1e6:.1f} MB in {best*1e3:.0f} ms = {nbytes/1e6/best:.1f} MB/s",
          flush=True)

    cls = get_model_class(args.model)
    try:
        model = cls.build(scale=s, fast_init=True)
    except TypeError:
        model = cls.build(scale=s)
    model.half()
    if hasattr(model, "enable_fused"):
        model.enable_fused(True)

    kw = dict(tile=args.tile, tile_overlap=args.tile_overlap, tile_batch=args.tile_batch, device_loop=True)
    model.inference_tiled(lr_host, **kw)  # compile + warm

    # (b) pure device compute: same cached program, scalar fetch
    run = model._tiled_fwd_cache[1]
    padded = jax.device_put(lr_host)  # tile covers the frame: no host pad needed at these sizes
    probe = jax.jit(lambda v, img: run(v, img)[::97, ::97, :].astype(jnp.int32).sum())
    float(probe(model.variables, padded))  # warm
    best = float("inf")
    for _ in range(args.reps):
        t0 = time.perf_counter()
        float(probe(model.variables, padded))
        best = min(best, time.perf_counter() - t0)
    mp = h * w / 1e6
    print(f"  device-only tiled: {best*1e3:.0f} ms/frame = {mp/best:.3f} MP/s", flush=True)

    # (c) full call (compute + HR fetch + crop)
    best = float("inf")
    for _ in range(args.reps):
        t0 = time.perf_counter()
        model.inference_tiled(lr_host, **kw)
        best = min(best, time.perf_counter() - t0)
    print(f"  full tiled_inference: {best*1e3:.0f} ms/frame = {mp/best:.3f} MP/s", flush=True)


if __name__ == "__main__":
    main()
