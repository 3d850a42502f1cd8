"""Micro-bench: fused upsampler tail + streaming conv vs their XLA chains.

    python scripts/exp_tail_micro.py
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

    from studiosr_tpu.ops.pallas.conv3x3 import fused_conv3x3, fused_resblock
    from studiosr_tpu.ops.pallas.upsampler import fused_upsample_x4
    from studiosr_tpu.ops.pixel_shuffle import pixel_shuffle
    from studiosr_tpu.utils.helpers import enable_compilation_cache

    enable_compilation_cache()
    reps = 20
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16

    def timeit(name, f, *args):
        g = jax.jit(f)
        jax.block_until_ready(g(*args))
        float(jnp.asarray(g(*args)).ravel()[0])
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(jnp.asarray(g(*args)).ravel()[0])
            best = min(best, time.perf_counter() - t0)
        print(f"{name:28s}: {best / reps * 1e3:7.3f} ms", flush=True)

    def chain(op, x):
        def f(inp):
            def body(c, _):
                return op(c), None

            r, _ = jax.lax.scan(body, inp, jnp.arange(reps))
            return r.mean()

        return f, x

    # --- x4 tail on (1,256,256,64)
    x = jnp.asarray(rng.standard_normal((1, 256, 256, 64)), dt)
    w0 = jnp.asarray(rng.standard_normal((3, 3, 64, 256)) * 0.05, dt)
    b0 = jnp.zeros(256, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((3, 3, 64, 3)) * 0.05, dt)
    b2 = jnp.zeros(3, jnp.float32)

    def conv(t, k, b):
        return jax.lax.conv_general_dilated(
            t, k.astype(t.dtype), (1, 1), [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC")
        ) + b.astype(t.dtype)

    def xla_tail(t):
        y = pixel_shuffle(conv(t, w0, b0), 2)
        y = pixel_shuffle(conv(y, w0, b0), 2)
        y = conv(y, w2, b2)
        # reduce back to input shape to keep the chain shape-stable
        return t * (1 + y.mean() * jnp.asarray(0, t.dtype))

    def fused_tail(t):
        y = fused_upsample_x4(t, w0, b0, w0, b0, w2, b2)
        return t * (1 + y.mean() * jnp.asarray(0, t.dtype))

    timeit("XLA x4 tail", *chain(xla_tail, x))
    timeit("fused x4 tail", *chain(fused_tail, x))

    # --- conv3x3 on (1,256,256,180)
    xc = jnp.asarray(rng.standard_normal((1, 256, 256, 180)), dt)
    wc = jnp.asarray(rng.standard_normal((3, 3, 180, 180)) * 0.05, dt)
    bc = jnp.zeros(180, jnp.float32)
    timeit("XLA conv3x3 180ch", *chain(lambda t: conv(t, wc, bc), xc))
    timeit("pallas conv3x3 180ch", *chain(lambda t: fused_conv3x3(t, wc, bc), xc))

    # --- ResBlock on (1,256,256,64) (EDSR-baseline shape)
    xr = jnp.asarray(rng.standard_normal((1, 256, 256, 64)), dt)
    wr = jnp.asarray(rng.standard_normal((3, 3, 64, 64)) * 0.05, dt)
    br = jnp.zeros(64, jnp.float32)

    def xla_resblock(t):
        h = jnp.maximum(conv(t, wr, br), 0)
        return t + conv(h, wr, br)

    timeit("XLA ResBlock 64ch", *chain(xla_resblock, xr))
    timeit("pallas ResBlock 64ch", *chain(lambda t: fused_resblock(t, wr, br, wr, br), xr))


if __name__ == "__main__":
    main()
