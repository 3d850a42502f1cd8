"""Re-measure USE_WHOLE_HAB at the round-3 state (everything stream-bound).

Round-2 measured whole-HAB neutral (133.8 vs 130.8 ms) — but that was when
the CAB kernel compute-dominated. After the aligned-width CAB fix the
attn/CAB/MLP trio sits at its 7-passes-per-block traffic floor (62.6 of
87.0 ms, exp_hat_ablate round 3), so collapsing attn+join+MLP from 5 to 3
map passes should now show: predicted ~18 ms.

    python scripts/exp_whole_hab2.py
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
    from studiosr_tpu.serving import hat_fast
    from studiosr_tpu.utils.helpers import enable_compilation_cache

    enable_compilation_cache()
    reps = 8
    h = w = 256
    model = HAT.build(scale=4, fast_init=True).half()
    x = jnp.asarray(np.random.default_rng(0).random((1, h, w, 3), np.float32), jnp.bfloat16)
    variables = jax.device_put(model.variables)

    for flag in (False, True):
        hat_fast.USE_WHOLE_HAB = flag

        def chained(v, inp):
            def body(carry, _):
                out = hat_fast.hat_fast_forward(
                    v, inp + carry.astype(inp.dtype) * jnp.bfloat16(1e-6), model.config
                )
                return out.astype(jnp.float32).mean(), None

            s, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), jnp.arange(reps))
            return s

        f = jax.jit(chained)
        t0 = time.perf_counter()
        float(f(variables, x))
        print(f"whole_hab={flag}: compile+first {time.perf_counter() - t0:.0f}s", flush=True)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(f(variables, x))
            best = min(best, time.perf_counter() - t0)
        print(f"whole_hab={flag}: {best / reps * 1e3:7.1f} ms", flush=True)
        jax.clear_caches()


if __name__ == "__main__":
    main()
