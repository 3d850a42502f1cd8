"""Whole-stripe chunk experiment: widen the pair kernel's chunk limit so a
33-windows-per-row eval map runs as ONE program per stripe (chunk 33) or the
current 3 (chunk 11). Round-2 measured chunk 33 ~5% faster but at 5x compile
time under the old 16 MB VMEM assumptions; the 64 MB limit is now standard.

    python scripts/exp_chunk33.py --max-chunk 34
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--max-chunk", type=int, default=34)
    parser.add_argument("--budget", type=int, default=9_000_000)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from studiosr_tpu.ops.pallas import swin_block
    from studiosr_tpu.utils.helpers import enable_compilation_cache

    enable_compilation_cache()
    swin_block.MAX_CHUNK_WINDOWS = args.max_chunk
    swin_block.PAIR_SCORE_VMEM_BUDGET = args.budget

    from studiosr_tpu.models import SwinIR

    reps = 8
    model = SwinIR.build(scale=4, fast_init=True).half()
    model.enable_fused(True)
    x = jnp.asarray(np.random.default_rng(0).random((1, 256, 256, 3), np.float32), jnp.bfloat16)
    variables = jax.device_put(model.variables)

    def chained(v, inp):
        def body(c, _):
            out = model._forward(v, inp + c.astype(inp.dtype) * jnp.bfloat16(1e-6))
            return out.mean(), None

        s, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), jnp.arange(reps))
        return s

    f = jax.jit(chained)
    t0 = time.perf_counter()
    float(f(variables, x))
    print(f"compile {time.perf_counter() - t0:.0f}s", flush=True)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(f(variables, x))
        best = min(best, time.perf_counter() - t0)
    per = best / reps
    print(
        f"max_chunk={args.max_chunk} budget={args.budget}: "
        f"{per * 1e3:.2f} ms/img = {256 * 256 / 1e6 / per:.4f} MP/s"
    )


if __name__ == "__main__":
    main()
