"""fused_resblock vs XLA at EDSR's real width (256 feats, res_scale 0.1).

Round 2 left the ResBlock kernel unwired (VMEM-OOM at band 16; slower than
XLA at the configs that fit). The aligned-width + stacked-dot rework may
flip that — EDSR has 32 of these back to back.

    python scripts/exp_resblock256.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from studiosr_tpu.ops.pallas.conv3x3 import fused_resblock
    from studiosr_tpu.utils.helpers import enable_compilation_cache

    enable_compilation_cache()
    reps = 20
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    c = 256
    x = jnp.asarray(rng.standard_normal((1, 256, 256, c)), dt)
    w1 = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.05, dt)
    b1 = jnp.zeros((c,), jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.05, dt)
    b2 = jnp.zeros((c,), jnp.float32)

    def xla_res(t):
        y = jax.lax.conv_general_dilated(
            t, w1, (1, 1), [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC")
        ) + b1.astype(t.dtype)
        y = jnp.maximum(y, 0)
        y = jax.lax.conv_general_dilated(
            y, w2, (1, 1), [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC")
        ) + b2.astype(t.dtype)
        return t + 0.1 * y

    def timeit(name, op):
        def f(inp):
            def body(cr, _):
                return op(cr).astype(dt), None

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
        print(f"{name:28s}: {best / reps * 1e3:7.3f} ms  (compile {compile_s:.0f}s)", flush=True)

    timeit("XLA ResBlock 256ch", xla_res)
    for band in (8, 16):
        timeit(
            f"pallas ResBlock 256ch b={band}",
            lambda t, band=band: fused_resblock(t, w1, b1, w2, b2, res_scale=0.1, band=band),
        )


if __name__ == "__main__":
    main()
