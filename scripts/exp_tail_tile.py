"""Tail-kernel tile sweep + conv3x3 row-band sweep (deep grids pipeline
DMA against compute across steps — smaller programs may win).

    python scripts/exp_tail_tile.py
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

    from studiosr_tpu.ops.pallas import conv3x3, upsampler
    from studiosr_tpu.utils.helpers import enable_compilation_cache

    enable_compilation_cache()
    reps = 20
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16

    def timeit(name, fn, *args):
        g = jax.jit(fn)
        float(jnp.asarray(g(*args)).ravel()[0])
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(jnp.asarray(g(*args)).ravel()[0])
            best = min(best, time.perf_counter() - t0)
        print(f"{name:28s}: {best / reps * 1e3:7.3f} ms", flush=True)

    # ---- tail tiles ----
    h = w = 264
    cin, n_colors = 64, 3
    x = jnp.asarray(rng.standard_normal((1, h, w, cin)), dt)
    w0 = jnp.asarray(rng.standard_normal((3, 3, cin, 4 * cin)) * 0.05, dt)
    b0 = jnp.zeros((4 * cin,), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((3, 3, cin, 4 * cin)) * 0.05, dt)
    b1 = jnp.zeros((4 * cin,), jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((3, 3, cin, n_colors)) * 0.05, dt)
    b2 = jnp.zeros((n_colors,), jnp.float32)

    for t in (24, 8):
        upsampler._pick_tile = lambda hh, ww, t=t: t if (hh % t == 0 and ww % t == 0) else 0
        upsampler.fused_upsample_x4.clear_cache()

        def f(inp, t=t):
            def body(c, _):
                y = upsampler.fused_upsample_x4(c, w0, b0, w1, b1, w2, b2)
                return (c * (1 + y.mean() * jnp.asarray(1e-6, jnp.float32)).astype(dt)), None

            r, _ = jax.lax.scan(body, inp, jnp.arange(reps))
            return r.mean()

        timeit(f"tail x4 tile={t}", f, x)

    # ---- conv3x3 row bands ----
    c = 180
    xc = jnp.asarray(rng.standard_normal((1, 256, 256, c)), dt)
    wc = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.05, dt)
    bc = jnp.zeros((c,), jnp.float32)
    for band in (16, 8):
        conv3x3.ROW_BAND = band
        conv3x3.fused_conv3x3.clear_cache()

        def g(inp):
            def body(cr, _):
                return conv3x3.fused_conv3x3(cr, wc, bc).astype(dt), None

            r, _ = jax.lax.scan(body, inp, jnp.arange(reps))
            return r.mean()

        timeit(f"conv3x3 180ch band={band}", g, xc)


if __name__ == "__main__":
    main()
