"""Micro-bench: fused_cab_body band sweep (HAT CAB trunk kernel).

The in-context HAT dissection pins the CAB branch at ~1.7 ms/block vs a
0.57 ms stream bound (STATUS.md round-2). Candidates: band-4 halo
amplification (LN runs on t+4 rows, conv1 on t+2 — 2x/1.5x at t=4) and the
tap-loop relayout copies (now hoisted). This sweeps row bands with the
64 MB VMEM escape in place.

    python scripts/exp_cab_micro.py --bands 4 8 16
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--bands", nargs="+", type=int, default=[4, 8, 16])
    parser.add_argument("--size", type=int, default=256)
    parser.add_argument("--dim", type=int, default=180)
    parser.add_argument("--cm", type=int, default=60)
    parser.add_argument("--ablate", nargs="+", default=[],
                        help="stage-skip sets, comma-joined per entry, e.g. ln conv1,conv2")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from studiosr_tpu.ops.pallas.conv3x3 import fused_cab_body
    from studiosr_tpu.utils.helpers import enable_compilation_cache

    enable_compilation_cache()
    reps = 20
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    h = w = args.size
    c, cm = args.dim, args.cm

    x = jnp.asarray(rng.standard_normal((1, h, w, c)), dt)
    s = jnp.ones((c,), dt)
    b = jnp.zeros((c,), dt)
    w1 = jnp.asarray(rng.standard_normal((3, 3, c, cm)) * 0.05, dt)
    b1 = jnp.zeros((cm,), jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((3, 3, cm, c)) * 0.05, dt)
    b2 = jnp.zeros((c,), jnp.float32)

    variants = [("", frozenset())] + [(a, frozenset(a.split(","))) for a in args.ablate]
    for band in args.bands:
        for tag, ablate in variants:
            def f(inp, band=band, ablate=ablate):
                def body(carry, _):
                    y2, csum = fused_cab_body(carry, s, b, w1, b1, w2, b2, band=band, ablate=ablate)
                    return (y2 + carry * jnp.asarray(1e-6, dt)).astype(dt), csum

                r, _ = jax.lax.scan(body, inp, jnp.arange(reps))
                return r.mean()

            g = jax.jit(f)
            t0 = time.perf_counter()
            float(g(x))
            compile_s = time.perf_counter() - t0
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(g(x))
                best = min(best, time.perf_counter() - t0)
            print(
                f"band {band:3d} ablate[{tag:18s}]: {best / reps * 1e3:7.3f} ms/call  (compile {compile_s:.0f}s)",
                flush=True,
            )


if __name__ == "__main__":
    main()
