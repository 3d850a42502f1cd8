"""Probe: does an int8 map stream ~2x faster than bf16 on this chip?

    python scripts/exp_int8_stream.py

Motivation: every fusion lever on the SwinIR serving path is measured
closed (STATUS.md round-3) and the whole-block kernel sits at ~0.98 ms
against a ~0.56 ms bf16 copy floor — the path is stream-bound. The only
remaining way to move the floor itself is fewer BYTES per map pass.
This probe times copy-only Pallas kernels over the same logical
(1, 256, 256, 180) map at f32 / bf16 / int8, plus the realistic
quantized-serving patterns (int8 in -> bf16 compute -> int8 out, and the
mixed boundaries), using the exp_dma.py chained-scan protocol.
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
    rng = np.random.default_rng(0)
    base = rng.standard_normal((1, h, w, c))
    logical_mb = h * w * c / 1e6  # elements in millions (per-elem bytes vary)

    def time_fn(f, *inp):
        g = jax.jit(f)
        float(g(*inp))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(g(*inp))
            best = min(best, time.perf_counter() - t0)
        return best / reps * 1e3

    def chain(op, out_to_in=None):
        """Chain reps applications with a data dependency.

        op: x -> y (same shape/dtype unless out_to_in maps y back to x's space).
        """

        def f(inp):
            def body(carry, _):
                y = op(carry)
                return (out_to_in(y) if out_to_in else y), None

            r, _ = jax.lax.scan(body, inp, jnp.arange(reps))
            return r.astype(jnp.float32).mean()

        return f

    block_of = {"f32": (1, 8, 256, 180), "bf16": (1, 8, 256, 180), "int8": (1, 8, 256, 180)}
    grid = (1, 32)

    def pallas_map(kernel, out_dtype, block_in, block_out):
        def op(t):
            return pl.pallas_call(
                kernel,
                grid=grid,
                in_specs=[pl.BlockSpec(block_in, lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(block_out, lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct(t.shape, out_dtype),
                compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",) * len(grid)),
            )(t)

        return op

    def copy_kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...]

    def scale_kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...] * jnp.asarray(0.999, x_ref.dtype)

    def dq_compute_q_kernel(x_ref, o_ref):
        # int8 in -> dequant bf16 -> elementwise compute -> requant -> int8 out
        v = x_ref[...].astype(jnp.bfloat16) * jnp.bfloat16(0.05)
        v = v * jnp.bfloat16(0.999) + jnp.bfloat16(0.01)
        q = jnp.clip(jnp.round((v * jnp.bfloat16(20.0)).astype(jnp.float32)), -127, 127)
        o_ref[...] = q.astype(jnp.int8)

    def dq_kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...].astype(jnp.bfloat16) * jnp.bfloat16(0.05)

    def q_kernel(x_ref, o_ref):
        q = jnp.clip(jnp.round((x_ref[...] * jnp.bfloat16(20.0)).astype(jnp.float32)), -127, 127)
        o_ref[...] = q.astype(jnp.int8)

    xs = {
        "f32": jnp.asarray(base, jnp.float32),
        "bf16": jnp.asarray(base, jnp.bfloat16),
        "int8": jnp.asarray(np.clip(np.round(base * 20), -127, 127), jnp.int8),
    }
    bytes_of = {"f32": 4, "bf16": 2, "int8": 1}

    print(f"map: (1,{h},{w},{c}) = {logical_mb:.1f} M elements; block (1,8,256,180) grid {grid}", flush=True)

    for name in ("f32", "bf16", "int8"):
        x = xs[name]
        blk = block_of[name]
        ms = time_fn(chain(pallas_map(copy_kernel, x.dtype, blk, blk)), x)
        gbs = 2 * logical_mb * bytes_of[name] / 1e3 / (ms / 1e3)
        print(f"pallas copy  {name:5}: {ms:.3f} ms  ({gbs:.0f} GB/s)", flush=True)

    for name in ("bf16", "int8"):
        x = xs[name]
        blk = block_of[name]
        k = scale_kernel if name == "bf16" else dq_compute_q_kernel
        ms = time_fn(chain(pallas_map(k, x.dtype, blk, blk)), x)
        gbs = 2 * logical_mb * bytes_of[name] / 1e3 / (ms / 1e3)
        print(f"pallas comp  {name:5}: {ms:.3f} ms  ({gbs:.0f} GB/s)", flush=True)

    # Mixed boundaries: int8 -> bf16 (dequant read) and bf16 -> int8 (quant write)
    blk = block_of["int8"]
    ms = time_fn(
        chain(
            pallas_map(dq_kernel, jnp.bfloat16, blk, blk),
            out_to_in=pallas_map(q_kernel, jnp.int8, blk, blk),
        ),
        xs["int8"],
    )
    print(f"pallas dq+q roundtrip (int8->bf16->int8, 2 kernels): {ms:.3f} ms", flush=True)

    # XLA elementwise over int8 vs bf16 for reference
    for name in ("bf16", "int8"):
        x = xs[name]
        if name == "int8":
            op = lambda t: jnp.clip(t.astype(jnp.int16) * 1, -127, 127).astype(jnp.int8)
        else:
            op = lambda t: t * jnp.asarray(0.999, t.dtype)
        ms = time_fn(chain(op), x)
        gbs = 2 * logical_mb * bytes_of[name] / 1e3 / (ms / 1e3)
        print(f"XLA elemwise {name:5}: {ms:.3f} ms  ({gbs:.0f} GB/s)", flush=True)


if __name__ == "__main__":
    main()
