"""Probe: what sets the ~90 GB/s bf16 streaming ceiling on this chip?

    python scripts/exp_stream_shape.py

exp_int8_stream.py showed the per-pass floor is NOT a byte wall: f32
streams the same logical map in only 1.35x the bf16 time (135 vs 91
logical GB/s), and v5e HBM is nominally ~800 GB/s — the copy kernels run
at <25% of peak. Suspects: the C=180 lane padding (180 -> 256 lanes, 42%
waste + split tiles), block heights that straddle the (16,128) bf16 tile,
per-grid-step overhead, and operand count. This sweeps channel counts,
block heights, 2-D vs 4-D layouts, and grid depths with the same chained
protocol. If some layout streams 2-3x faster, re-laying the serving map
is worth more than every remaining in-kernel lever combined.
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

    reps = 50
    rng = np.random.default_rng(0)

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
            return r.astype(jnp.float32).mean()

        return f

    def copy_kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...]

    def pallas_copy(shape, block, grid, dtype):
        x = jnp.asarray(rng.standard_normal(shape), dtype)

        nd = len(block)

        def index_map(*ids):
            return ids + (0,) * (nd - len(ids))

        op = lambda t: pl.pallas_call(
            copy_kernel,
            grid=grid,
            in_specs=[pl.BlockSpec(block, index_map, memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(block, index_map, memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(shape, dtype),
            compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",) * len(grid)),
        )(t)
        ms = time_fn(chain(op), x)
        n_elem = int(np.prod(shape))
        bpe = jnp.dtype(dtype).itemsize
        # physical bytes: last dim padded to 128-lane multiples, 2nd-minor to
        # the dtype's sublane tile (8 f32 / 16 bf16 / 32 int8)
        sub = {4: 8, 2: 16, 1: 32}[bpe]
        lanes = -(-shape[-1] // 128) * 128
        rows = -(-int(np.prod(shape[:-1])) // sub) * sub
        phys_mb = rows * lanes * bpe / 1e6
        log_mb = n_elem * bpe / 1e6
        print(
            f"{str(dtype):>8} {str(shape):>22} blk {str(block):>22} grid {str(grid):>12}: "
            f"{ms:.3f} ms  logical {2 * log_mb / ms:.0f} GB/s  physical {2 * phys_mb / ms:.0f} GB/s",
            flush=True,
        )
        return ms

    bf16 = jnp.bfloat16
    HW = 256 * 256

    print("== channel count (2-D rows x C, 16-row-multiple blocks) ==", flush=True)
    for c in (128, 180, 192, 256):
        pallas_copy((HW, c), (2048, c), (HW // 2048,), bf16)

    print("== block height (2-D, C=256) ==", flush=True)
    for rows_blk in (256, 512, 1024, 4096, 8192, 16384):
        pallas_copy((HW, 256), (rows_blk, 256), (HW // rows_blk,), bf16)

    print("== 4-D NHWC stripes (the serving layout), heights 8/16/32 ==", flush=True)
    for hb in (8, 16, 32):
        for c in (180, 256):
            pallas_copy((1, 256, 256, c), (1, hb, 256, c), (1, 256 // hb), bf16)

    print("== wide lanes (fold W into lanes: fewer, fatter rows) ==", flush=True)
    pallas_copy((2048, 2304), (256, 2304), (8,), bf16)  # 256*256*180 as 2048x2304
    pallas_copy((4096, 1440), (512, 1440), (8,), bf16)
    pallas_copy((16384, 360), (2048, 360), (8,), bf16)

    print("== f32 for the best shapes ==", flush=True)
    pallas_copy((HW, 256), (2048, 256), (32,), jnp.float32)
    pallas_copy((2048, 2304), (256, 2304), (8,), jnp.float32)

    print("== multiple ops per pass: does read+write overlap? (2 in, 1 out) ==", flush=True)

    def add_kernel(a_ref, b_ref, o_ref):
        o_ref[...] = a_ref[...] + b_ref[...]

    shape, block, grid = (HW, 256), (2048, 256), (32,)
    x = jnp.asarray(rng.standard_normal(shape), bf16)

    op = lambda t: pl.pallas_call(
        add_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(block, lambda i: (i, 0), memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(block, lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(shape, bf16),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
    )(t, t)
    ms = time_fn(chain(op), x)
    mb = HW * 256 * 2 / 1e6
    print(f"    add 2in/1out (65536,256): {ms:.3f} ms  ({3 * mb / ms:.0f} GB/s streamed)", flush=True)


if __name__ == "__main__":
    main()
