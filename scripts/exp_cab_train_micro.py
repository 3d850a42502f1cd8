"""Micro-bench: HAT CAB branch at the TRAINING shape — where do its
0.154 s/step (36 blocks, batch 32, 64px, bf16) actually go?

Variants (scan-chained, one dispatch; loss = sum(out * r), grads wrt
params AND x — the in-step structure):

  xla          LN + conv-gelu-conv + SE gate, plain autodiff (current path)
  xla_nogate   gate ablated (timing-only)        -> gate fwd+bwd cost
  xla_noln     LN ablated (timing-only)          -> LN fwd+bwd cost
  fwd_xla      forward only (full chain)         -> fwd/bwd split
  fwd_pallas   fused_cab_body forward only       -> Pallas fwd headroom
  vjp          ops.cab_vjp custom-VJP path (once built)

    python scripts/exp_cab_train_micro.py --variants xla xla_nogate fwd_xla fwd_pallas
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--variants", nargs="+",
                        default=["xla", "xla_nogate", "xla_noln", "fwd_xla", "fwd_pallas"])
    parser.add_argument("--batch", type=int, default=32)
    parser.add_argument("--size", type=int, default=64)
    parser.add_argument("--reps", type=int, default=32)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from studiosr_tpu.ops.pallas.conv3x3 import fused_cab_body
    from studiosr_tpu.utils.helpers import enable_compilation_cache

    enable_compilation_cache()
    reps = args.reps
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    b_, h, w, c, cm = args.batch, args.size, args.size, 180, 60
    csq = c // 30  # squeeze_factor 30

    x = jnp.asarray(rng.standard_normal((b_, h, w, c)), dt)
    r = jnp.asarray(rng.standard_normal((b_, h, w, c)), dt)
    params = {
        "s": jnp.ones((c,), dt), "bt": jnp.zeros((c,), dt),
        "w1": jnp.asarray(rng.standard_normal((3, 3, c, cm)) * 0.05, dt),
        "b1": jnp.zeros((cm,), dt),
        "w2": jnp.asarray(rng.standard_normal((3, 3, cm, c)) * 0.05, dt),
        "b2": jnp.zeros((c,), dt),
        "wa": jnp.asarray(rng.standard_normal((1, 1, c, csq)) * 0.05, dt),
        "ba": jnp.zeros((csq,), dt),
        "wb": jnp.asarray(rng.standard_normal((1, 1, csq, c)) * 0.05, dt),
        "bb": jnp.zeros((c,), dt),
    }

    def ln_f32(xx, s, bt):
        x32 = xx.astype(jnp.float32)
        mu = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
        return ((x32 - mu) * jax.lax.rsqrt(var + 1e-5) * s.astype(jnp.float32)
                + bt.astype(jnp.float32)).astype(xx.dtype)

    def convp(xx, ww, bb):
        p = ww.shape[0] // 2
        return jax.lax.conv_general_dilated(
            xx, ww, (1, 1), [(p, p), (p, p)],
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + bb

    def cab_math(xx, p, use_ln=True, use_gate=True):
        ln = ln_f32(xx, p["s"], p["bt"]) if use_ln else xx
        y = convp(ln, p["w1"], p["b1"])
        y = jax.nn.gelu(y, approximate=False)
        y = convp(y, p["w2"], p["b2"])
        if use_gate:
            g = jnp.mean(y, axis=(1, 2), keepdims=True)
            g = jax.nn.relu(convp(g, p["wa"], p["ba"]))
            g = jax.nn.sigmoid(convp(g, p["wb"], p["bb"]))
            y = y * g
        return y

    def build(variant):
        if variant in ("xla", "xla_nogate", "xla_noln"):
            use_gate = variant != "xla_nogate"
            use_ln = variant != "xla_noln"

            def loss(xx, p):
                return jnp.sum(cab_math(xx, p, use_ln, use_gate).astype(jnp.float32)
                               * r.astype(jnp.float32))

            grad = jax.grad(loss, argnums=(0, 1))

            def step(carry, _):
                dx, dp = grad(carry, params)
                return (carry + dx.astype(dt) * jnp.asarray(1e-6, dt)), jnp.sum(dp["b2"].astype(jnp.float32))

        elif variant == "fwd_xla":
            def step(carry, _):
                y = cab_math(carry, params)
                return (carry + y * jnp.asarray(1e-6, dt)).astype(dt), jnp.sum(y.astype(jnp.float32)[0, 0, 0])

        elif variant == "fwd_pallas":
            def step(carry, _):
                y2, csum = fused_cab_body(
                    carry, params["s"], params["bt"], params["w1"],
                    params["b1"].astype(jnp.float32), params["w2"],
                    params["b2"].astype(jnp.float32), band=4)
                g = jnp.mean(csum, axis=-1) * 0  # placeholder: gate finished in XLA
                y = y2 + g[:, None, None, None].astype(dt)
                return (carry + y * jnp.asarray(1e-6, dt)).astype(dt), jnp.sum(csum[0])

        elif variant == "vjp":
            from studiosr_tpu.ops.cab_vjp import cab_ln_gate

            def loss(xx, p):
                y = cab_ln_gate(xx, p["s"], p["bt"], p["w1"], p["b1"], p["w2"], p["b2"],
                                p["wa"], p["ba"], p["wb"], p["bb"])
                return jnp.sum(y.astype(jnp.float32) * r.astype(jnp.float32))

            grad = jax.grad(loss, argnums=(0, 1))

            def step(carry, _):
                dx, dp = grad(carry, params)
                return (carry + dx.astype(dt) * jnp.asarray(1e-6, dt)), jnp.sum(dp["b2"].astype(jnp.float32))

        else:
            raise ValueError(variant)

        def f(inp):
            out, aux = jax.lax.scan(step, inp, jnp.arange(reps))
            return out.astype(jnp.float32).mean() + aux.mean()

        return jax.jit(f)

    for variant in args.variants:
        g = build(variant)
        t0 = time.perf_counter()
        float(g(x))
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(g(x))
            best = min(best, time.perf_counter() - t0)
        per = best / reps * 1e3
        print(f"{variant:12s}: {per:7.3f} ms/call x36 blocks = {per * 36 / 1e3:6.3f} s-equiv"
              f"  (compile {compile_s:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
