"""Head-packed attention dot probe (VERDICT r3 #6): can one big dot per
stripe beat the per-head batched (hp, 128, 32) dots that set the SwinIR
kernel floor?

Context (STATUS.md): single-big-head WRONG-MATH measurement bounds the
headroom at ~0.23 ms/block (0.475 vs 0.71 per-block micro, round-2 era).
Every EXACT packing pays for it: 6x dot FLOPs (block-diagonal zeros) or
operand construction. This probe measures the exact formulations:

  A. baseline: batched per-head dots, (hp=heads*pairs, 2N, dp) — the
     shipped kernel's chain (_pairs_attn_stripe core).
  B. row-pack: heads stacked on the row axis, (pairs, heads*2N, dp) ->
     block-diag (heads*2N, heads*2N) scores; off-head blocks killed by a
     -100 bias constant. 6x score memory -> pair-chunked.
  C. lane-pack: scores (2N, heads*2N) via q_packed (2N, heads*dp) @
     K_bd (heads*dp, heads*2N) with K_bd/V_bd built block-diagonal
     in-kernel; score memory unchanged, 6x dot FLOPs + construction.

All variants run inside one pallas kernel per stripe (grid over stripes,
operands VMEM-resident per step), reps-chained in one jit; same-reps deltas
are the decision signal (absolutes carry ~24ms/reps RPC).

Run: python scripts/exp_headpack.py [--reps 64] [--stripes 8]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


HEADS = 6
DP = 32
N2 = 128  # pair-packed rows (2 windows x 64 tokens)
PAIRS = 17  # 33 windows/row at the bench geometry -> 17 pairs (1 dummy)
HP = HEADS * PAIRS


def _chain(fn, q, k, v, reps):
    import jax
    import jax.numpy as jnp

    def body(carry, _):
        out = fn(q + carry.astype(q.dtype) * jnp.bfloat16(1e-6), k, v)
        return out.astype(jnp.float32).mean(), None

    def run(q, k, v):
        s, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), jnp.arange(reps))
        return s

    return jax.jit(run)


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from studiosr_tpu.utils.helpers import enable_compilation_cache

    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=64)
    ap.add_argument("--stripes", type=int, default=8)
    ap.add_argument("--variants", nargs="*", default=None)
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()

    S = args.stripes
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((S, HP, N2, DP), np.float32) * 0.2, jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((S, HP, N2, DP), np.float32) * 0.2, jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((S, HP, N2, DP), np.float32) * 0.2, jnp.bfloat16)

    # Block-diagonal -100 bias for the packed variants (trace-time constant).
    R = HEADS * N2
    blk = np.full((R, R), -100.0, np.float32)
    for h in range(HEADS):
        blk[h * N2 : (h + 1) * N2, h * N2 : (h + 1) * N2] = 0.0
    blk_bias = jnp.asarray(blk, jnp.bfloat16)

    def kernel_A(q_ref, k_ref, v_ref, b_ref, o_ref):
        qq, kk, vv = q_ref[0], k_ref[0], v_ref[0]
        scores = jax.lax.dot_general(
            qq, kk, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        probs = jnp.exp(jnp.minimum(scores, 80.0))
        denom = jnp.sum(probs, axis=-1, keepdims=True)
        av = jax.lax.dot_general(
            probs.astype(qq.dtype), vv, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        o_ref[0] = (av / denom).astype(o_ref.dtype)

    def kernel_B(q_ref, k_ref, v_ref, b_ref, o_ref, *, chunk):
        # rows-packed: (pairs, heads*2N, dp); pair-chunked scores.
        for p0 in range(0, PAIRS, chunk):
            pc = min(chunk, PAIRS - p0)
            # gather heads of this pair chunk: (pc, R, dp)
            qs = jnp.concatenate(
                [q_ref[0, h * PAIRS + p0 : h * PAIRS + p0 + pc] for h in range(HEADS)], axis=1
            )
            ks = jnp.concatenate(
                [k_ref[0, h * PAIRS + p0 : h * PAIRS + p0 + pc] for h in range(HEADS)], axis=1
            )
            vs = jnp.concatenate(
                [v_ref[0, h * PAIRS + p0 : h * PAIRS + p0 + pc] for h in range(HEADS)], axis=1
            )
            scores = jax.lax.dot_general(
                qs, ks, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ) + b_ref[...].astype(jnp.float32)
            probs = jnp.exp(jnp.minimum(scores, 80.0))
            denom = jnp.sum(probs, axis=-1, keepdims=True)
            av = jax.lax.dot_general(
                probs.astype(qs.dtype), vs, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            av = (av / denom).astype(o_ref.dtype)
            for h in range(HEADS):
                o_ref[0, h * PAIRS + p0 : h * PAIRS + p0 + pc] = av[:, h * N2 : (h + 1) * N2]

    def kernel_C(q_ref, k_ref, v_ref, b_ref, o_ref):
        # lane-pack: per pair, q (2N, heads*dp); K_bd (heads*dp, R), V_bd (R, heads*dp)
        s = HEADS * DP
        for p in range(PAIRS):
            qp = jnp.concatenate([q_ref[0, h * PAIRS + p] for h in range(HEADS)], axis=1)  # (2N, s)
            # K_bd: block h occupies rows h*dp:(h+1)*dp, cols h*2N:(h+1)*2N.
            # Static pad+concat construction (dynamic_update_slice on values
            # is not lowerable in Mosaic).
            kbd = jnp.concatenate(
                [
                    jnp.pad(k_ref[0, h * PAIRS + p].T, ((h * DP, s - (h + 1) * DP), (0, 0)))
                    for h in range(HEADS)
                ],
                axis=1,
            )  # lane-concat of (s, 2N) column blocks at 128-multiples
            vbd = jnp.concatenate(
                [
                    jnp.pad(v_ref[0, h * PAIRS + p], ((h * N2, R - (h + 1) * N2), (0, 0)))
                    for h in range(HEADS)
                ],
                axis=1,
            )  # (R, s): lane-concat of (R, dp) blocks — dp=32 lanes each
            scores = jnp.dot(qp, kbd, preferred_element_type=jnp.float32)  # (2N, R)
            probs = jnp.exp(jnp.minimum(scores, 80.0))
            # segmented denominators: per-head 2N-col sums, via reshape-free
            # slicing (lane reshape splits are Mosaic-illegal).
            av = jnp.dot(probs.astype(qp.dtype), vbd, preferred_element_type=jnp.float32)  # (2N, s)
            for h in range(HEADS):
                den = jnp.sum(probs[:, h * N2 : (h + 1) * N2], axis=-1, keepdims=True)
                o_ref[0, h * PAIRS + p] = (av[:, h * DP : (h + 1) * DP] / den).astype(o_ref.dtype)

    def make(kernel):
        from jax.experimental.pallas import tpu as pltpu

        call = pl.pallas_call(
            kernel,
            grid=(S,),
            in_specs=[pl.BlockSpec((1, HP, N2, DP), lambda i: (i, 0, 0, 0))] * 3
            + [pl.BlockSpec((R, R), lambda i: (0, 0))],
            out_specs=pl.BlockSpec((1, HP, N2, DP), lambda i: (i, 0, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((S, HP, N2, DP), jnp.bfloat16),
            interpret=args.interpret,
            compiler_params=None
            if args.interpret
            else pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        )
        return lambda q, k, v: call(q, k, v, blk_bias)

    variants = {
        "A_batched": make(kernel_A),
        "B_rowpack_c2": make(functools.partial(kernel_B, chunk=2)),
        "B_rowpack_c4": make(functools.partial(kernel_B, chunk=4)),
        "C_lanepack": make(kernel_C),
    }

    # Correctness: all variants must agree with A.
    ref = np.asarray(variants["A_batched"](q, k, v), np.float32)
    for name, fn in variants.items():
        out = np.asarray(fn(q, k, v), np.float32)
        err = np.abs(out - ref).max()
        status = "OK" if err < 0.02 else "MISMATCH"
        print(f"parity {name:14s}: max dev vs A = {err:.5f} {status}")
        if status != "OK" and name != "A_batched":
            raise SystemExit(f"{name} wrong math")

    if args.interpret:
        return

    for name, fn in variants.items():
        if args.variants and not any(s in name for s in args.variants):
            continue
        c = _chain(fn, q, k, v, args.reps)
        float(c(q, k, v))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(c(q, k, v))
            best = min(best, time.perf_counter() - t0)
        per_stripe = best / args.reps / S * 1e3
        print(f"{name:14s}: {best/args.reps*1e3:8.3f} ms/call  {per_stripe:7.4f} ms/stripe", flush=True)


if __name__ == "__main__":
    main()
