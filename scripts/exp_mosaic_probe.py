"""Compile-probe Mosaic support for layout ops needed by pixel-shuffle.

    python scripts/exp_mosaic_probe.py

Each probe compiles a tiny kernel on the TPU and reports OK / the Mosaic
error class. Results drive the _ps2 implementation choice (STATUS.md).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from studiosr_tpu.utils.helpers import enable_compilation_cache

    enable_compilation_cache()
    x = jnp.asarray(np.random.default_rng(0).standard_normal((16, 16, 128)), jnp.bfloat16)

    def probe(name, fn, out_shape):
        def kernel(x_ref, o_ref):
            o_ref[...] = fn(x_ref[...]).astype(o_ref.dtype)

        try:
            call = pl.pallas_call(
                kernel,
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct(out_shape, x.dtype),
            )
            jax.block_until_ready(jax.jit(call)(x))
            print(f"{name:40s}: OK", flush=True)
        except Exception as e:
            msg = str(e).split("\n")
            key = next((l for l in msg if "unsupported" in l.lower() or "not implemented" in l.lower()), msg[0])
            print(f"{name:40s}: FAIL {key[:110]}", flush=True)

    h, w, c = x.shape
    cb = c // 2
    probe("lane-split (h,w,2cb)->(h,2w,cb)", lambda t: t.reshape(h, 2 * w, cb), (h, 2 * w, cb))
    probe("transpose (1,0,2)", lambda t: jnp.transpose(t, (1, 0, 2)), (w, h, c))
    probe("mid expand (h,w,1,c)", lambda t: t[:, :, None, :], (h, w, 1, c))
    probe("axis1 expand (h,1,w,c)", lambda t: t[:, None], (h, 1, w, c))
    probe(
        "row interleave (leading concat+merge)",
        lambda t: jnp.concatenate([t[:, None, :, :cb], t[:, None, :, cb:]], axis=1).reshape(2 * h, w, cb),
        (2 * h, w, cb),
    )
    probe(
        "interior pad axis1",
        lambda t: jax.lax.pad(t, jnp.bfloat16(0), ((0, 0, 0), (0, 0, 1), (0, 0, 0))),
        (h, 2 * w - 1, c),
    )
    probe(
        "sublane gather via iota-select roll",
        lambda t: pltpu.roll(t, 1, 1),
        (h, w, c),
    )
    # strided sublane slice (even columns)
    probe("strided sublane slice [::2]", lambda t: t[:, ::2, :], (h, w // 2, c))


def probes2() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    x2 = jnp.asarray(np.random.default_rng(0).standard_normal((256, 128)), jnp.bfloat16)

    def probe(name, fn, out_shape):
        def kernel(x_ref, o_ref):
            o_ref[...] = fn(x_ref[...]).astype(o_ref.dtype)

        try:
            call = pl.pallas_call(
                kernel,
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct(out_shape, x2.dtype),
            )
            jax.block_until_ready(jax.jit(call)(x2))
            print(f"{name:40s}: OK", flush=True)
        except Exception as e:
            msg = str(e).split("\n")
            key = next((l for l in msg if "unsupported" in l.lower() or "not implemented" in l.lower() or "Only" in l), msg[0])
            print(f"{name:40s}: FAIL {key[:110]}", flush=True)

    r, c = x2.shape

    def row_gather(t):
        idx = jax.lax.broadcasted_iota(jnp.int32, (r, 1), 0)
        perm = (idx * 2) % r + (idx * 2) // r  # interleave halves
        return jnp.take_along_axis(t, jnp.broadcast_to(perm, (r, c)), axis=0)

    probe("2D take_along_axis rows", row_gather, (r, c))

    def row_gather_take(t):
        idx = jax.lax.broadcasted_iota(jnp.int32, (r, 1), 0).reshape(r)
        perm = (idx * 2) % r + (idx * 2) // r
        return jnp.take(t, perm, axis=0)

    probe("2D jnp.take rows", row_gather_take, (r, c))

    def dyn_gather(t):
        idx = jax.lax.broadcasted_iota(jnp.int32, (r, 1), 0).reshape(r)
        perm = (idx * 2) % r + (idx * 2) // r
        return t[perm]

    probe("2D t[perm] rows", dyn_gather, (r, c))


if __name__ == "__main__":
    probes2()
