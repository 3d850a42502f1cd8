"""Decompose the ~0.5 ms per-iteration floor of the chained micro protocol.

    python scripts/exp_latency.py

exp_stream_shape.py found per-pass copy time is ~0.49 ms regardless of
bytes (33 MB and 134 MB round trips within 35% of each other) — so the
chained-scan protocol carries a fixed per-iteration cost that has been
read as a "bandwidth floor" since round 2. Candidate components:
  (a) lax.scan machinery (carry double-buffer copies),
  (b) cross-kernel data-dependency serialization latency
      (pipeline fill/drain per pallas_call),
  (c) true streaming time.
Tests:
  1. size sweep, chained scan         -> where does time leave the floor?
  2. tiny-work chained scan           -> pure per-iteration floor
  3. Python-unrolled dependent chain  -> scan overhead removed, dependence kept
  4. independent calls, summed        -> dependence removed (XLA may overlap)
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
    rng = np.random.default_rng(0)
    bf16 = jnp.bfloat16

    def copy_kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...] * jnp.asarray(0.999, x_ref.dtype)

    def make_copy(shape, block_rows):
        grid = (shape[0] // block_rows,)
        return lambda t: pl.pallas_call(
            copy_kernel,
            grid=grid,
            in_specs=[pl.BlockSpec((block_rows, shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((block_rows, shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(shape, bf16),
            compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
        )(t)

    def timeit(g, *inp, norm=1):
        float(g(*inp))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(g(*inp))
            best = min(best, time.perf_counter() - t0)
        return best / norm * 1e3

    reps = 50

    def chained_scan(op, shape):
        x = jnp.asarray(rng.standard_normal(shape), bf16)

        def f(inp):
            def body(carry, _):
                return op(carry), None

            r, _ = jax.lax.scan(body, inp, jnp.arange(reps))
            return r.astype(jnp.float32).mean()

        return timeit(jax.jit(f), x, norm=reps)

    print("== 1. size sweep (chained scan, block 2048 rows, C=256) ==", flush=True)
    for rows in (4096, 16384, 65536, 131072, 262144, 524288):
        blk = min(2048, rows)
        ms = chained_scan(make_copy((rows, 256), blk), (rows, 256))
        mb = rows * 256 * 2 / 1e6
        print(f"  ({rows:>7},256): {ms:.3f} ms/pass  ({2 * mb / ms:.0f} GB/s)", flush=True)

    print("== 2. tiny work (256x256 = 0.13 MB) chained scan ==", flush=True)
    ms = chained_scan(make_copy((256, 256), 256), (256, 256))
    print(f"  (256,256): {ms:.3f} ms/pass  <- pure per-iteration floor", flush=True)

    print("== 2b. tiny XLA-only op chained scan (no pallas) ==", flush=True)
    x = jnp.asarray(rng.standard_normal((256, 256)), bf16)

    def f_xla(inp):
        def body(carry, _):
            return carry * jnp.asarray(0.999, carry.dtype), None

        r, _ = jax.lax.scan(body, inp, jnp.arange(reps))
        return r.astype(jnp.float32).mean()

    print(f"  (256,256) XLA multiply: {timeit(jax.jit(f_xla), x, norm=reps):.3f} ms/pass", flush=True)

    big_shape = (65536, 256)
    mb = big_shape[0] * 256 * 2 / 1e6
    print("== 3. Python-unrolled dependent chain (no scan), 20 reps ==", flush=True)
    unroll = 20
    op = make_copy(big_shape, 2048)
    x = jnp.asarray(rng.standard_normal(big_shape), bf16)

    def f_unroll(inp):
        y = inp
        for _ in range(unroll):
            y = op(y)
        return y.astype(jnp.float32).mean()

    ms = timeit(jax.jit(f_unroll), x, norm=unroll)
    print(f"  (65536,256) unrolled: {ms:.3f} ms/pass  ({2 * mb / ms:.0f} GB/s)", flush=True)

    print("== 3b. unrolled tiny dependent chain ==", flush=True)
    op_t = make_copy((256, 256), 256)
    xt = jnp.asarray(rng.standard_normal((256, 256)), bf16)

    def f_unroll_t(inp):
        y = inp
        for _ in range(unroll):
            y = op_t(y)
        return y.astype(jnp.float32).mean()

    print(f"  (256,256) unrolled: {timeit(jax.jit(f_unroll_t), xt, norm=unroll):.3f} ms/pass", flush=True)

    print("== 4. independent calls (20 inputs, no dependence), summed ==", flush=True)
    xs = jnp.asarray(rng.standard_normal((unroll,) + big_shape), bf16)

    def f_indep(many):
        return sum(op(many[i]).astype(jnp.float32).mean() for i in range(unroll))

    ms = timeit(jax.jit(f_indep), xs, norm=unroll)
    print(f"  (65536,256) independent: {ms:.3f} ms/pass  ({2 * mb / ms:.0f} GB/s)", flush=True)

    print("== 4b. independent tiny calls ==", flush=True)
    xts = jnp.asarray(rng.standard_normal((unroll, 256, 256)), bf16)

    def f_indep_t(many):
        return sum(op_t(many[i]).astype(jnp.float32).mean() for i in range(unroll))

    print(f"  (256,256) independent: {timeit(jax.jit(f_indep_t), xts, norm=unroll):.3f} ms/pass", flush=True)


if __name__ == "__main__":
    main()
