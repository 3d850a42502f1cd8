"""Micro-benchmark one fused attention-block kernel call on a full map.

    python scripts/exp_block_micro.py --mode pairs --chunk 16 --shift
    python scripts/exp_block_micro.py --mode v5

Times a single fused_window_attention_block on (1, 256, 256, 180) bf16 (the
SwinIR classical shape), chained REPS times through lax.scan.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--mode", default="pairs", choices=["pairs", "v5"])
    parser.add_argument("--chunk", type=int, default=0)
    parser.add_argument("--shift", action="store_true")
    parser.add_argument("--size", type=int, default=256)
    parser.add_argument("--heads", type=int, default=6)
    parser.add_argument("--dim", type=int, default=180)
    parser.add_argument("--reps", type=int, default=50)
    parser.add_argument("--mlp", action="store_true", help="time fused_mlp_block instead")
    parser.add_argument("--whole", action="store_true", help="time fused_swin_block (attn+MLP)")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from studiosr_tpu.ops.pallas import swin_block
    from studiosr_tpu.ops.windows import calculate_mask
    from studiosr_tpu.utils.helpers import enable_compilation_cache

    enable_compilation_cache()

    if args.mode == "v5":
        swin_block.PAIR_SCORE_VMEM_BUDGET = 0
    elif args.chunk:
        swin_block.PAIR_SCORE_VMEM_BUDGET = args.heads * 64 * 64 * 8 * args.chunk

    h = w = args.size
    c, heads, ws = args.dim, args.heads, 8
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    x = jnp.asarray(rng.standard_normal((1, h, w, c)), dt)
    ln_s = jnp.ones((c,), dt)
    ln_b = jnp.zeros((c,), dt)
    wqkv = jnp.asarray(rng.standard_normal((c, 3 * c)) * 0.05, dt)
    bqkv = jnp.zeros((3 * c,), dt)
    wproj = jnp.asarray(rng.standard_normal((c, c)) * 0.05, dt)
    bproj = jnp.zeros((c,), dt)
    bias = jnp.asarray(rng.standard_normal((heads, ws * ws, ws * ws)) * 0.02, jnp.float32)
    mask = jnp.asarray(calculate_mask((h, w), ws, ws // 2)) if args.shift else None

    if args.mlp or args.whole:
        hidden = int(c * 2)
        w1 = jnp.asarray(rng.standard_normal((c, hidden)) * 0.05, dt)
        b1 = jnp.zeros((hidden,), dt)
        w2 = jnp.asarray(rng.standard_normal((hidden, c)) * 0.05, dt)
        b2 = jnp.zeros((c,), dt)

    if args.whole:
        def one(y):
            return swin_block.fused_swin_block(
                y, ln_s, ln_b, wqkv, bqkv, wproj, bproj, bias, mask,
                ln_s, ln_b, w1, b1, w2, b2, heads=heads, window_size=ws,
            )
    elif args.mlp:
        def one(y):
            flat = y.reshape(h * w, c)
            out = swin_block.fused_mlp_block(flat, ln_s, ln_b, w1, b1, w2, b2)
            return out.reshape(1, h, w, c)
    else:
        def one(y):
            return swin_block.fused_window_attention_block(
                y, ln_s, ln_b, wqkv, bqkv, wproj, bproj, bias, mask, heads=heads, window_size=ws
            )

    def chained(inp):
        def body(carry, _):
            out = one(carry)
            return out * jnp.asarray(0.999, dt), None

        s, _ = jax.lax.scan(body, inp, jnp.arange(args.reps))
        return s.mean()

    f = jax.jit(chained)
    t0 = time.perf_counter()
    float(f(x))
    print(f"compile+first: {time.perf_counter() - t0:.1f}s", flush=True)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(f(x))
        best = min(best, time.perf_counter() - t0)
    ms = best / args.reps * 1e3
    kind = "whole" if args.whole else ("mlp" if args.mlp else args.mode)
    print(f"{kind}(chunk={args.chunk or 'auto'}, shift={args.shift}): {ms:.3f} ms/block")


if __name__ == "__main__":
    main()
