"""End-to-end large-image serving benchmark (tiled pipeline, wall clock).

    python scripts/bench_tiled.py --model swinir --hr-size 720 1280 \
        --tile 128 --tile-batch 8

Measures what a production user sees for a big frame (e.g. 720p -> 4K x4):
``Model.inference_tiled`` wall-clock INCLUDING host-side tile carve/reassembly
and the per-batch device round-trips (~24 ms RPC each on this relay) — unlike
bench.py's chained-scan protocol, which isolates device time for the
fixed-shape headline. Also times whole-image ``inference`` at the same shape
when it fits, so the tiled pipeline's overhead/benefit is on record.

Reference counterpart: the reference serves every image whole
(``studiosr/models/common.py:36-48``) and recompile-per-shape is a non-issue
for torch; here tiling is the static-shape answer (parallel/tiled.py).
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
    p.add_argument("--whole", action="store_true", help="also time whole-image inference at this shape")
    p.add_argument("--host-loop", action="store_true", help="force the host tile loop (one dispatch per batch)")
    args = p.parse_args()

    import numpy as np

    from studiosr_tpu.utils.helpers import enable_compilation_cache
    from studiosr_tpu.zoo.registry import get_model_class

    enable_compilation_cache()

    h, w = args.hr_size
    cls = get_model_class(args.model)
    try:
        model = cls.build(scale=args.scale, fast_init=True)
    except TypeError:
        model = cls.build(scale=args.scale)
    model.half()
    if hasattr(model, "enable_fused"):
        model.enable_fused(True)

    rng = np.random.default_rng(0)
    image = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    mp = h * w / 1e6

    def run_tiled():
        return model.inference_tiled(
            image, tile=args.tile, tile_overlap=args.tile_overlap, tile_batch=args.tile_batch,
            device_loop=False if args.host_loop else None,
        )

    print(f"{args.model} x{args.scale}: {h}x{w} LR ({mp:.2f} MP) -> {h*args.scale}x{w*args.scale}")
    t0 = time.perf_counter()
    run_tiled()  # compile + warm
    print(f"  tiled first call (compile+warm): {time.perf_counter() - t0:.1f} s")
    times = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        run_tiled()
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(
        f"  tiled (tile={args.tile}, ov={args.tile_overlap}, batch={args.tile_batch}): "
        f"{best*1e3:.1f} ms/frame = {mp/best:.3f} MP/s  (all reps: {[f'{t*1e3:.0f}' for t in times]})"
    )

    if args.whole:
        t0 = time.perf_counter()
        model.inference(image)
        print(f"  whole first call (compile+warm): {time.perf_counter() - t0:.1f} s")
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            model.inference(image)
            times.append(time.perf_counter() - t0)
        best = min(times)
        print(f"  whole-image: {best*1e3:.1f} ms/frame = {mp/best:.3f} MP/s")


if __name__ == "__main__":
    main()
