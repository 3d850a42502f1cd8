"""RCAN batch-scaling dissection: is ChannelAttention the b4 regression?

    python scripts/exp_rcan_ablate.py --batch 4

RCAN serves 1.39 MP/s at b1 but 0.77 at b4 (EDSR, the same trunk WITHOUT
channel attention, improves 1.05 -> 1.15) — and HAN inherits the trunk, so
its b4 regression is RCAN's. Ablation variants (timing-only, wrong math):

  full        — as shipped
  no CA gate  — squeeze-excite replaced by identity (removes the per-block
                global avg-pool reduction + (N,1,1,C) gate chain)
  CA, no pool — gate math kept on a constant vector (removes only the
                full-map mean reduction)
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

    import studiosr_tpu.models.blocks as blocks
    from studiosr_tpu.models import RCAN
    from studiosr_tpu.utils.helpers import enable_compilation_cache

    enable_compilation_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--reps", type=int, default=4)
    args = p.parse_args()

    model = RCAN.build(scale=4, fast_init=True).half()
    x = jnp.asarray(
        np.random.default_rng(0).random((args.batch, args.size, args.size, 3), np.float32), jnp.bfloat16
    )
    variables = jax.device_put(model.variables)
    orig = blocks.ChannelAttention.__call__

    def _dot_pool(xx):
        # Full-map mean as an MXU ones-vector contraction instead of a VPU
        # spatial reduce — probes whether XLA's reduce lowering (vs the gate
        # *structure*) is the b4 cliff.
        n, h, w, c = xx.shape
        ones = jnp.ones((h * w,), xx.dtype)
        m = jnp.einsum("nsc,s->nc", xx.reshape(n, h * w, c), ones) / (h * w)
        return xx * jnp.clip(m.astype(xx.dtype)[:, None, None, :], 0, 1)

    def _slice_pool(xx):
        # Tiny static-slice pool + full broadcast multiply: if this is as
        # slow as the full pool, the multiply DEPENDENCY (materialize +
        # re-read) is the cost, not the reduction breadth.
        return xx * jnp.clip(jnp.mean(xx[:, :8, :8], axis=(1, 2), keepdims=True), 0, 1)

    variants = [
        ("full", orig),
        ("no CA gate", lambda self, xx: xx),
        # pool kept, gate convs dropped (paramless — compact methods can't be
        # monkeypatched with param-creating functions): isolates the full-map
        # mean reduction from the (N,1,1,C) conv chain.
        ("pool only", lambda self, xx: xx * jnp.clip(jnp.mean(xx, axis=(1, 2), keepdims=True), 0, 1)),
        ("dot pool", lambda self, xx: _dot_pool(xx)),
        ("slice pool", lambda self, xx: _slice_pool(xx)),
    ]
    for name, fn in variants:
        blocks.ChannelAttention.__call__ = fn
        try:

            def chained(v, inp):
                def body(carry, _):
                    out = model._forward(v, inp + carry.astype(inp.dtype) * jnp.bfloat16(1e-6))
                    return out.astype(jnp.float32).mean(), None

                s, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), jnp.arange(args.reps))
                return s

            f = jax.jit(chained)
            float(f(variables, x))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(f(variables, x))
                best = min(best, time.perf_counter() - t0)
            print(f"b{args.batch} {name:12s}: {best / args.reps * 1e3:7.1f} ms", flush=True)
        except Exception as e:  # noqa: BLE001 — variant-level isolation
            print(f"b{args.batch} {name:12s}: FAILED {type(e).__name__}: {e}", flush=True)
        finally:
            blocks.ChannelAttention.__call__ = orig


if __name__ == "__main__":
    main()
