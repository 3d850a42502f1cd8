"""Fresh in-context EDSR measurement: linen/XLA forward vs the streaming
serving path (scripts/experiments/edsr_fast.py) after the round-3
aligned-width + stacked-dot conv kernel rework (fused_resblock 256ch band 8
micro: 2.315 vs XLA 2.402 ms — round 2's band-4 path lost 73.4 vs 62.0).

    python scripts/exp_edsr_incontext.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts", "experiments"))


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from edsr_fast import edsr_fast_forward
    from studiosr_tpu.models.edsr import EDSR
    from studiosr_tpu.utils.helpers import enable_compilation_cache

    enable_compilation_cache()
    reps = 20
    model = EDSR.build(scale=4)
    model.half()
    variables = model.variables
    config = model.config
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((1, 256, 256, 3)), jnp.bfloat16)

    module = model.module

    def linen(v, t):
        return module.apply(v, t)

    def fast(v, t):
        return edsr_fast_forward(v, t, config)

    def timeit(name, op):
        def f(v, t):
            def body(cr, _):
                y = op(v, cr)
                # data dependency without perturbing the input numerics
                return cr + (y[:, : cr.shape[1], : cr.shape[2], :] * jnp.asarray(1e-12, y.dtype)).astype(cr.dtype), None

            r, _ = jax.lax.scan(body, t, jnp.arange(reps))
            return r.astype(jnp.float32).mean()

        g = jax.jit(f)
        t0 = time.perf_counter()
        float(g(variables, x))
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(g(variables, x))
            best = min(best, time.perf_counter() - t0)
        print(f"{name:24s}: {best / reps * 1e3:7.2f} ms/img  (compile {compile_s:.0f}s)", flush=True)

    timeit("EDSR linen/XLA", linen)
    timeit("EDSR streaming (band 8)", fast)


if __name__ == "__main__":
    main()
