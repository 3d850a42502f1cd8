"""Per-stage cost dissection of the window-pair attention kernel.

    python scripts/exp_attn_ablate.py --levels 1 2 3 4 5 6 7 8 9

Each level L builds a kernel that runs only the first L stages of
_attn_block_kernel_pairs and writes a reduction of the last stage (keeps the
work alive, adds ~nothing). Consecutive diffs = per-stage cost.

Stages: 1 LN, 2 window-carve transpose, 3 qkv matmul, 4 q/k/v head stack,
5 score dot, 6 bias+softmax, 7 AV dot, 8 unstack+reverse transpose, 9 proj.
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_kernel(level, heads, ws, dp, dtype):
    import jax
    import jax.numpy as jnp

    def kernel(x_ref, s_ref, b_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref, bias2_ref, out_ref):
        from studiosr_tpu.ops.pallas.swin_block import _ln as _layernorm

        _, _, w, c = x_ref.shape
        nw = w // ws
        n = ws * ws
        n2 = 2 * n
        pairs = nw // 2
        s = heads * dp

        def emit(t):
            out_ref[0] = jnp.full((ws, w, c), jnp.mean(t.astype(jnp.float32)), out_ref.dtype)

        x = x_ref[0]
        if level == 0:  # pure copy: pipeline + DMA floor
            out_ref[0] = x
            return
        ln = _layernorm(x.astype(jnp.float32), s_ref[0].astype(jnp.float32), b_ref[0].astype(jnp.float32))
        if level == 1:
            return emit(ln)
        ln_windows = ln.astype(x.dtype).reshape(ws, nw, ws, c).transpose(1, 0, 2, 3).reshape(nw * n, c)
        if level == 2:
            return emit(ln_windows)
        qkv = (
            jnp.dot(ln_windows, wqkv_ref[...], preferred_element_type=jnp.float32)
            + bqkv_ref[0].astype(jnp.float32)
        ).astype(x.dtype)
        if level == 3:
            return emit(qkv)

        def stack(off):
            return jnp.concatenate(
                [qkv[:, off + h * dp : off + (h + 1) * dp].reshape(pairs, n2, dp) for h in range(heads)], axis=0
            )

        q, k, v = stack(0), stack(s), stack(2 * s)
        if level == 4:
            return emit(q + k + v)
        scores = jax.lax.dot_general(
            q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        if level == 5:
            return emit(scores)
        scores = scores.reshape(heads, pairs, n2, n2) + bias2_ref[...].astype(jnp.float32)[:, None]
        scores = scores.reshape(heads * pairs, n2, n2)
        scores = scores - jnp.max(scores, axis=-1, keepdims=True)
        probs = jnp.exp(scores)
        denom = jnp.sum(probs, axis=-1, keepdims=True)
        if level == 6:
            return emit(probs + denom)
        av = jax.lax.dot_general(
            probs.astype(x.dtype), v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        av = (av / denom).astype(x.dtype)
        if level == 7:
            return emit(av)
        attn = jnp.concatenate([av[h * pairs : (h + 1) * pairs].reshape(nw * n, dp) for h in range(heads)], axis=1)
        attn = attn.reshape(nw, ws, ws, s).transpose(1, 0, 2, 3).reshape(ws * w, s)
        if level == 8:
            return emit(attn)
        proj = (
            jnp.dot(attn, wproj_ref[...], preferred_element_type=jnp.float32) + bproj_ref[0].astype(jnp.float32)
        )
        out_ref[0] = (x.astype(jnp.float32) + proj.reshape(ws, w, c)).astype(out_ref.dtype)

    return kernel


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--levels", type=int, nargs="+", default=[1, 2, 3, 4, 5, 6, 7, 8, 9])
    parser.add_argument("--size", type=int, default=256)
    parser.add_argument("--chunk", type=int, default=16)
    parser.add_argument("--reps", type=int, default=50)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from studiosr_tpu.ops.pallas.swin_block import _pad_head_weights, _pair_embed_bias
    from studiosr_tpu.utils.helpers import enable_compilation_cache

    enable_compilation_cache()

    h = w = args.size
    c, heads, ws = 180, 6, 8
    n = ws * ws
    d = c // heads
    dp = 32
    s = heads * dp
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    x = jnp.asarray(rng.standard_normal((1, h, w, c)), dt)
    ln_s = jnp.ones((1, c), dt)
    ln_b = jnp.zeros((1, c), dt)
    wqkv = jnp.asarray(rng.standard_normal((c, 3 * c)) * 0.05, dt)
    bqkv = jnp.zeros((3 * c,), dt)
    wproj = jnp.asarray(rng.standard_normal((c, c)) * 0.05, dt)
    bproj = jnp.zeros((1, c), dt)
    bias = jnp.asarray(rng.standard_normal((heads, n, n)) * 0.02, jnp.float32)
    wqkv_pad, bqkv_pad, wproj_pad = _pad_head_weights(wqkv, bqkv, wproj, heads, d, dp)
    bias2 = _pair_embed_bias(bias, n)

    chunk = args.chunk
    cw = chunk * ws
    grid = (1, h // ws, (w // ws) // chunk)
    full = lambda *shape: pl.BlockSpec(shape, lambda bi, i, j: (0,) * len(shape), memory_space=pltpu.VMEM)

    for level in args.levels:
        kern = make_kernel(level, heads, ws, dp, dt)
        call = pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, ws, cw, c), lambda bi, i, j: (bi, i, j, 0), memory_space=pltpu.VMEM),
                full(1, c), full(1, c), full(c, 3 * s), full(1, 3 * s), full(s, c), full(1, c),
                full(heads, 2 * n, 2 * n),
            ],
            out_specs=pl.BlockSpec((1, ws, cw, c), lambda bi, i, j: (bi, i, j, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "parallel"),
                vmem_limit_bytes=100 * 1024 * 1024,  # match the real kernel's escape
            ),
        )

        def chained(inp):
            def body(carry, _):
                out = call(carry, ln_s, ln_b, wqkv_pad, bqkv_pad.reshape(1, -1), wproj_pad, bproj, bias2)
                return out * jnp.asarray(0.999, dt), None

            r, _ = jax.lax.scan(body, inp, jnp.arange(args.reps))
            return r.mean()

        f = jax.jit(chained)
        float(f(x))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(f(x))
            best = min(best, time.perf_counter() - t0)
        print(f"level {level}: {best / args.reps * 1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
