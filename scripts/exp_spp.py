"""Serving-shape stripes-per-program A/B for the pair attention kernel.

    python scripts/exp_spp.py

exp_dissect2.py puts the whole-block kernel at 0.872 ms/app real (bench
geometry) with an MXU floor ~0.25 ms — most of the rest is per-stage
relayout/VPU plus possible per-grid-step fixed cost. Training-shape spp=8
measured much slower (round 2), but serving is a different regime: this
re-measures spp in {1, 3, 11} on the (1, 264, 264, 180) map (33 stripes)
with the RPC-calibrated reps-200 protocol.
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

    from studiosr_tpu.ops.pallas.swin_block import fused_window_attention_block
    from studiosr_tpu.utils.helpers import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.default_rng(0)
    bf16 = jnp.bfloat16
    H = W = 264
    C, heads, ws = 180, 6, 8

    def t(shape, scale=0.05):
        return jnp.asarray(rng.standard_normal(shape) * scale, bf16)

    x = t((1, H, W, C), 1.0)
    n = ws * ws
    w = dict(
        ln_scale=t((C,), 1.0) + 1, ln_bias=t((C,)),
        wqkv=t((C, 3 * C)), bqkv=t((3 * C,)), wproj=t((C, C)), bproj=t((C,)),
        bias=t((heads, n, n)),
    )

    def timed(f, *inp):
        g = jax.jit(f)
        float(g(*inp))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(g(*inp))
            best = min(best, time.perf_counter() - t0)
        return best * 1e3

    reps = 200

    def null_fn(s):
        def body(carry, _):
            return carry * jnp.float32(0.9999), None

        r, _ = jax.lax.scan(body, s, jnp.arange(reps))
        return r

    rpc = timed(null_fn, jnp.float32(1.0))
    print(f"RPC: {rpc:.1f} ms", flush=True)

    for spp in (1, 3, 11):
        def f(inp, spp=spp):
            def body(carry, _):
                y = fused_window_attention_block(
                    carry, w["ln_scale"], w["ln_bias"], w["wqkv"], w["bqkv"],
                    w["wproj"], w["bproj"], w["bias"], None,
                    heads=heads, window_size=ws, spp=spp,
                )
                return y, None

            r, _ = jax.lax.scan(body, inp, jnp.arange(reps))
            return r.astype(jnp.float32).mean()

        total = timed(f, x)
        print(f"spp={spp:2d}: total {total:7.1f} ms -> {(total - rpc) / reps:.3f} ms/app", flush=True)


if __name__ == "__main__":
    main()
