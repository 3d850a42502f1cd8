"""A/B: HAT serving with vs without load-time weight pre-layout, same reps.

Isolates prepare_hat_serving's win from protocol changes (reps raise the
RPC-additive floor; see STATUS.md session 7). Run on the TPU."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from studiosr_tpu.models.hat import HAT
from studiosr_tpu.utils.helpers import enable_compilation_cache

REPS = 16


def main():
    enable_compilation_cache()
    model = HAT.build(scale=4, fast_init=True).half().enable_fused(True)
    x = jnp.asarray(np.random.default_rng(0).random((1, 256, 256, 3)), jnp.bfloat16)
    variables = jax.device_put(model.variables)
    prep = model.serving_prep()

    def chained(v, p, inp):
        def body(c, _):
            kw = {} if p is None else {"prep": p}
            out = model._forward(v, inp + c.astype(inp.dtype) * 1e-6, **kw)
            return out.mean(), None

        s, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), jnp.arange(REPS))
        return s

    for tag, p in (("prep", prep), ("noprep", None)):
        f = jax.jit(chained)
        t0 = time.perf_counter()
        float(f(variables, p, x))
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(f(variables, p, x))
            best = min(best, time.perf_counter() - t0)
        print(f"hat x4 256 bf16 {tag:7s}: {best / REPS * 1000:7.2f} ms/img (compile {compile_s:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
