"""Measure the shard_map (manual SPMD) wrapper cost on the fused serving
path at the bench shape, on the real chip with a 1-device mesh.

    python scripts/exp_manual_overhead.py [--reps 32]

Multi-chip fused serving rides shard_map (Model.needs_manual_spmd). This
A/Bs the bench protocol (chained scan, SwinIR classical x4 256 bf16 fused,
pre-laid weights) with and without the per-forward shard_map wrapper —
quantifying what each chip of a pod pays relative to single-chip serving.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import PartitionSpec as P

    from studiosr_tpu.models import SwinIR
    from studiosr_tpu.parallel import get_mesh
    from studiosr_tpu.utils.helpers import enable_compilation_cache

    enable_compilation_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--reps", type=int, default=32)
    args = p.parse_args()
    reps = args.reps

    h = w = 256
    model = SwinIR.build(scale=4, fast_init=True).half()
    model.enable_fused(True)
    x = jnp.asarray(np.random.default_rng(0).random((1, h, w, 3), np.float32), jnp.bfloat16)
    variables = jax.device_put(model.variables)
    prep = model.serving_prep()
    mesh = get_mesh(jax.devices()[:1])

    smap = jax.shard_map(
        lambda v, pp, b: model._forward(v, b, prep=pp),
        mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=P(),
        check_vma=False,
    )

    def make_chained(fwd):
        def chained(v, pp, inp):
            def body(carry, _):
                out = fwd(v, pp, inp + carry.astype(inp.dtype) * jnp.bfloat16(1e-6))
                return out.mean(), None

            s, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), jnp.arange(reps))
            return s

        return jax.jit(chained)

    for name, fwd in (("plain jit", lambda v, pp, b: model._forward(v, b, prep=pp)), ("shard_map", smap)):
        f = make_chained(fwd)
        float(f(variables, prep, x))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(f(variables, prep, x))
            best = min(best, time.perf_counter() - t0)
        print(f"{name:10s}: {best / reps * 1e3:7.2f} ms/fwd", flush=True)


if __name__ == "__main__":
    main()
