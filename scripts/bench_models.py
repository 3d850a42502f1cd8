"""Per-model inference throughput sweep on the current backend.

    python scripts/bench_models.py --models edsr rcan swinir hat --size 256

Prints one line per (model, dtype) with per-image latency and MP/s using the
chained-scan timing protocol from bench.py (amortizes host RPC overhead).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import time


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from studiosr_tpu.utils.helpers import enable_compilation_cache
    from studiosr_tpu.zoo.registry import get_model_class

    enable_compilation_cache()

    parser = argparse.ArgumentParser()
    parser.add_argument("--models", nargs="+", default=["edsr", "rcan", "swinir", "hat"])
    parser.add_argument("--size", type=int, default=256)
    parser.add_argument("--scale", type=int, default=4)
    parser.add_argument("--reps", type=int, default=4)
    parser.add_argument("--batch", type=int, default=1, help="images per forward (batched serving throughput)")
    parser.add_argument("--f32", action="store_true", help="also time float32")
    parser.add_argument("--no-fused", action="store_true", help="keep the linen/XLA path")
    args = parser.parse_args()

    h = w = args.size
    for name in args.models:
        cls = get_model_class(name)

        modes = [("bf16", True)] + ([("f32", False)] if args.f32 else [])
        for tag, half in modes:
            # fresh model per mode: half()/enable_fused mutate in place and
            # cannot be reverted for the f32 row
            try:
                model = cls.build(scale=args.scale, fast_init=True)
            except TypeError:
                model = cls.build(scale=args.scale)
            if half:
                model.half()
                if hasattr(model, "enable_fused") and not args.no_fused:
                    model.enable_fused(True)
            x = jnp.asarray(
                np.random.default_rng(0).random((args.batch, h, w, 3)), jnp.bfloat16 if half else jnp.float32
            )
            variables = jax.device_put(model.variables)
            prep = model.serving_prep()  # load-time weight pre-layout where supported

            def chained(v, p, inp):
                def body(c, _):
                    kw = {} if p is None else {"prep": p}
                    out = model._forward(v, inp + c.astype(inp.dtype) * 1e-6, **kw)
                    return out.mean(), None

                s, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), jnp.arange(args.reps))
                return s

            f = jax.jit(chained)
            t0 = time.perf_counter()
            float(f(variables, prep, x))
            compile_s = time.perf_counter() - t0
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                float(f(variables, prep, x))
                best = min(best, time.perf_counter() - t0)
            per_image = best / (args.reps * args.batch)
            print(
                f"{name:8s} {tag:5s} x{args.scale} @{h}x{w} b{args.batch}: {per_image * 1000:8.2f} ms/img  "
                f"{h * w / 1e6 / per_image:6.3f} MP/s  (compile {compile_s:.0f}s)",
                flush=True,
            )


if __name__ == "__main__":
    main()
