"""A/B the window-pair attention kernel vs the per-head kernel on TPU.

    python scripts/exp_attn_pairs.py            # pairs kernel (auto-dispatch)
    python scripts/exp_attn_pairs.py --v5       # force per-head kernel
    python scripts/exp_attn_pairs.py --chunk 8  # override pair chunk budget

Uses bench.py's chained-scan protocol (one compile, one scalar fetch).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--v5", action="store_true", help="force the per-head kernel")
    parser.add_argument("--chunk", type=int, default=0, help="pair-kernel chunk override (windows)")
    parser.add_argument("--size", type=int, default=256)
    parser.add_argument("--reps", type=int, default=8)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from studiosr_tpu.models import SwinIR
    from studiosr_tpu.ops.pallas import swin_block
    from studiosr_tpu.utils.helpers import enable_compilation_cache

    enable_compilation_cache()

    if args.v5:
        swin_block.PAIR_SCORE_VMEM_BUDGET = 0  # no even chunk fits -> per-head kernel
    elif args.chunk:
        # Budget that admits exactly `chunk` windows (heads=6, n=64).
        swin_block.PAIR_SCORE_VMEM_BUDGET = 6 * 64 * 64 * 8 * args.chunk

    h = w = args.size
    model = SwinIR.build(scale=4, fast_init=True).half()
    model.enable_fused(True)
    x = jnp.asarray(np.random.default_rng(0).random((1, h, w, 3), np.float32), jnp.bfloat16)
    variables = jax.device_put(model.variables)

    def chained(v, inp):
        def body(carry, _):
            out = model._forward(v, inp + carry.astype(inp.dtype) * jnp.bfloat16(1e-6))
            return out.mean(), None

        s, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), jnp.arange(args.reps))
        return s

    f = jax.jit(chained)
    t0 = time.perf_counter()
    float(f(variables, x))
    print(f"compile+first: {time.perf_counter() - t0:.1f}s", flush=True)

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(f(variables, x))
        best = min(best, time.perf_counter() - t0)
    ms = best / args.reps * 1e3
    tag = "v5-per-head" if args.v5 else f"pairs(chunk={args.chunk or 'auto'})"
    print(f"{tag}: {ms:.1f} ms/img  {(h * w) / 1e6 / (ms / 1e3):.3f} MP/s")


if __name__ == "__main__":
    main()
