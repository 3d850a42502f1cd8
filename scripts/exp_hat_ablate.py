"""In-context dissection of the fused HAT forward on TPU.

    python scripts/exp_hat_ablate.py
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

    from studiosr_tpu.models import HAT
    from studiosr_tpu.serving.hat_fast import hat_fast_forward
    from studiosr_tpu.utils.helpers import enable_compilation_cache

    enable_compilation_cache()
    reps = 16
    h = w = 256
    model = HAT.build(scale=4, fast_init=True).half()
    x = jnp.asarray(np.random.default_rng(0).random((1, h, w, 3), np.float32), jnp.bfloat16)
    variables = jax.device_put(model.variables)
    model.enable_fused(True)
    prep = model.serving_prep()  # serving config: pre-laid weights

    variants = [
        ("full", frozenset()),
        ("no cab", frozenset({"cab"})),
        ("no attn", frozenset({"attn"})),
        ("no mlp", frozenset({"mlp"})),
        ("no ocab", frozenset({"ocab"})),
        ("no conv", frozenset({"conv"})),
        ("no tail", frozenset({"tail"})),
        ("nothing", frozenset({"cab", "attn", "mlp", "ocab", "conv", "tail"})),
    ]
    for name, ab in variants:
        def chained(v, p, inp, ab=ab):
            def body(carry, _):
                out = hat_fast_forward(v, inp + carry.astype(inp.dtype) * jnp.bfloat16(1e-6), model.config, prep=p, _ablate=ab)
                return out.astype(jnp.float32).mean(), None

            s, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), jnp.arange(reps))
            return s

        f = jax.jit(chained)
        float(f(variables, prep, x))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(f(variables, prep, x))
            best = min(best, time.perf_counter() - t0)
        print(f"{name:12s}: {best / reps * 1e3:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
