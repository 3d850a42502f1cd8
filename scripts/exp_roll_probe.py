"""Probe for the roll-folding design (round 3): build the +4-row-offset
stripe from two half-height (4-row) BlockSpec operands over the same array
(leading-dim blocks have no alignment constraint; the index maps wrap with
mod), and roll the W (sublane) axis in-register via pltpu.roll — f32 only
(Mosaic: "Rotate with non-32-bit data" is not implemented; manual HBM DMA
of a 180-channel slice is also rejected: "Slice shape along dimension 3
must be aligned to tiling (128)"). Validates vs jnp.roll and times it.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from studiosr_tpu.utils.helpers import enable_compilation_cache

enable_compilation_cache()

H = W = 264
C = 180
WS = 8
S = 4
N = H // WS


def kernel(a_ref, b_ref, out_ref):
    # rows [i*WS+S, i*WS+S+WS) via two half-stripes; concat on the untiled
    # leading dim is a plain major-dim concat (legal, unlike sublane-offset
    # concats).
    x = jnp.concatenate([a_ref[0], b_ref[0]], axis=0)  # (WS, W, C)
    # W-roll by -S in-register: result[w] = x[(w+S) mod W]; rotate in f32
    # (bf16 rotate unimplemented; bf16->f32->bf16 is lossless).
    y = pltpu.roll(x.astype(jnp.float32), W - S, 1).astype(x.dtype)
    out_ref[0] = y * 2.0


@jax.jit
def run(x):
    return pl.pallas_call(
        kernel,
        grid=(N,),
        in_specs=[
            pl.BlockSpec((1, S, W, C), lambda i: (0, 2 * i + 1, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, W, C), lambda i: (0, (2 * i + 2) % (2 * N), 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, WS, W, C), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
    )(x, x)


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, H, W, C)), jnp.bfloat16)
    t0 = time.time()
    y = np.asarray(run(x))
    print(f"compile+run {time.time() - t0:.1f}s", flush=True)
    ref = np.roll(np.asarray(x, np.float32), (-S, -S), axis=(1, 2)) * 2.0
    dev = np.abs(y.astype(np.float32) - ref).max()
    print("max dev vs jnp.roll:", dev)
    assert dev < 1e-2, "MISMATCH"

    # light timing: chain REPS calls with a data dependency
    def chained(op):
        @jax.jit
        def chain(x):
            def body(c, _):
                return op(c), ()

            out, _ = jax.lax.scan(body, x, None, length=50)
            return out.astype(jnp.float32).mean()

        chain(x).block_until_ready()
        t0 = time.time()
        chain(x).block_until_ready()
        return (time.time() - t0) / 50 * 1e3

    print(f"offset-read+roll kernel: {chained(run):.3f} ms/pass")
    print(
        "XLA standalone roll:     "
        f"{chained(lambda c: jnp.roll(c, (-S, -S), axis=(1, 2)) * 1.0000001):.3f} ms/pass"
    )


if __name__ == "__main__":
    main()
