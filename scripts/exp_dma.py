"""Characterize Pallas DMA throughput vs block shape on the SwinIR map.

    python scripts/exp_dma.py

Times (a) chained XLA multiplies (the achievable-bandwidth baseline),
(b) copy-only pallas kernels at several block shapes over a
(1, 256, 256, 180) bf16 map. Diagnoses the 0.59 ms copy floor seen in the
attention-kernel ablation (exp_attn_ablate.py level 0).
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from studiosr_tpu.utils.helpers import enable_compilation_cache

    enable_compilation_cache()

    h = w = 256
    c = 180
    reps = 50
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, h, w, c)), jnp.bfloat16)
    mb = x.size * 2 / 1e6

    def time_fn(f, inp):
        g = jax.jit(f)
        float(g(inp))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(g(inp))
            best = min(best, time.perf_counter() - t0)
        return best / reps * 1e3

    def chain(op):
        def f(inp):
            def body(carry, _):
                return op(carry), None

            r, _ = jax.lax.scan(body, inp, jnp.arange(reps))
            return r.mean()

        return f

    ms = time_fn(chain(lambda t: t * jnp.asarray(0.999, t.dtype)), x)
    print(f"XLA multiply:            {ms:.3f} ms  ({2 * mb / ms:.0f} GB/s)")

    def copy_kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...] * jnp.asarray(0.999, x_ref.dtype)

    def pallas_copy(block, grid, reshape=None):
        def op(t):
            t2 = t.reshape(reshape) if reshape else t
            out = pl.pallas_call(
                copy_kernel,
                grid=grid,
                in_specs=[pl.BlockSpec(block, lambda *ids: ids + (0,) * (len(block) - len(ids)), memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(block, lambda *ids: ids + (0,) * (len(block) - len(ids)), memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct(t2.shape, t2.dtype),
                compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",) * len(grid)),
            )(t2)
            return out.reshape(t.shape) if reshape else out

        return op

    # stripe-chunk blocks like the attention kernel
    for name, block, grid, reshape in [
        ("(1,8,128,180) g64", (1, 8, 128, 180), (1, 32, 2), None),
        ("(1,8,256,180) g32", (1, 8, 256, 180), (1, 32), None),
        ("(1,32,256,180) g8", (1, 32, 256, 180), (1, 8), None),
        ("2D (2048,180) g32", (2048, 180), (32,), (h * w, c)),
        ("2D (8192,180) g8", (8192, 180), (8,), (h * w, c)),
        ("2D (1024,1440) g8", (1024, 1440), (8,), (h * w // 8, c * 8)),
    ]:
        ms = time_fn(chain(pallas_copy(block, grid, reshape)), x)
        print(f"pallas copy {name}: {ms:.3f} ms  ({2 * mb / ms:.0f} GB/s)", flush=True)


if __name__ == "__main__":
    main()
