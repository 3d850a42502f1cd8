"""Fresh kernel dissection with the RPC artifact calibrated out.

    python scripts/exp_dissect2.py

exp_latency.py showed every timed dispatch+fetch carries a fixed ~24 ms
RPC cost, so historical micro numbers (reps=50 -> +0.48 ms/call,
reps=8 -> +3 ms/call) overstate absolute per-call times; only deltas were
trustworthy. This re-measures the serving kernels at the DRIVER BENCH
GEOMETRY (264x264 map, chunk 33) with reps=200 and an in-situ null-program
RPC calibration, then compares:

  * whole-block kernel, one application per scan iteration
  * whole-block kernel, six applications per scan iteration (an RSTB's
    chain) — detects any scan-boundary vs in-chain cost difference
  * attention-only and MLP-only kernels
  * the XLA roll pass at map scale

Output: real (RPC-subtracted) ms per application for each.
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

    from studiosr_tpu.ops.pallas.swin_block import (
        fused_mlp_block,
        fused_swin_block,
        fused_window_attention_block,
    )
    from studiosr_tpu.utils.helpers import enable_compilation_cache

    enable_compilation_cache()

    rng = np.random.default_rng(0)
    bf16 = jnp.bfloat16
    H = W = 264  # flip-padded eval map of a 256 input: 33 windows/row
    C, heads, ws = 180, 6, 8
    n = ws * ws
    hidden = 2 * C

    def t(shape, scale=0.05):
        return jnp.asarray(rng.standard_normal(shape) * scale, bf16)

    x = t((1, H, W, C), 1.0)
    weights = dict(
        ln1_scale=t((C,), 1.0) + 1, ln1_bias=t((C,)),
        wqkv=t((C, 3 * C)), bqkv=t((3 * C,)), wproj=t((C, C)), bproj=t((C,)),
        bias=t((heads, n, n)),
        ln2_scale=t((C,), 1.0) + 1, ln2_bias=t((C,)),
        w1=t((C, hidden)), b1=t((hidden,)), w2=t((hidden, C)), b2=t((C,)),
    )

    def timed(f, *inp, reps):
        g = jax.jit(f)
        float(g(*inp))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(g(*inp))
            best = min(best, time.perf_counter() - t0)
        return best * 1e3  # total ms

    # --- null-program RPC calibration ---
    def null_fn(s):
        def body(carry, _):
            return carry * jnp.float32(0.9999), None

        r, _ = jax.lax.scan(body, s, jnp.arange(200))
        return r

    rpc_ms = timed(null_fn, jnp.float32(1.0), reps=200)
    print(f"RPC (null 200-iter scan total): {rpc_ms:.1f} ms", flush=True)

    def scan_chain(op, napp):
        def f(inp):
            def body(carry, _):
                y = carry
                for _ in range(napp):
                    y = op(y)
                return y, None

            r, _ = jax.lax.scan(body, inp, jnp.arange(reps_iters))
            return r.astype(jnp.float32).mean()

        return f

    def block_op(y):
        return fused_swin_block(
            y, weights["ln1_scale"], weights["ln1_bias"],
            weights["wqkv"], weights["bqkv"], weights["wproj"], weights["bproj"],
            weights["bias"], None,
            weights["ln2_scale"], weights["ln2_bias"],
            weights["w1"], weights["b1"], weights["w2"], weights["b2"],
            heads=heads, window_size=ws,
        )

    cases = []
    reps_iters = 200
    total = timed(scan_chain(block_op, 1), x, reps=reps_iters)
    per = (total - rpc_ms) / (reps_iters * 1)
    print(f"whole-block x1/iter : total {total:7.1f} ms -> {per:.3f} ms/app", flush=True)
    cases.append(("block", per))

    reps_iters = 34
    total = timed(scan_chain(block_op, 6), x, reps=reps_iters)
    per = (total - rpc_ms * (34 / 200) - (rpc_ms - rpc_ms * (34 / 200))) / (reps_iters * 6)
    # note: RPC is per timed call, independent of iteration count
    per = (total - rpc_ms) / (reps_iters * 6)
    print(f"whole-block x6/iter : total {total:7.1f} ms -> {per:.3f} ms/app", flush=True)
    cases.append(("block chain6", per))

    def attn_op(y):
        return fused_window_attention_block(
            y, weights["ln1_scale"], weights["ln1_bias"],
            weights["wqkv"], weights["bqkv"], weights["wproj"], weights["bproj"],
            weights["bias"], None, heads=heads, window_size=ws,
        )

    reps_iters = 200
    total = timed(scan_chain(attn_op, 1), x, reps=reps_iters)
    print(f"attention-only      : total {total:7.1f} ms -> {(total - rpc_ms) / reps_iters:.3f} ms/app", flush=True)

    def mlp_op(y):
        flat = y.reshape(H * W, C)
        out = fused_mlp_block(
            flat, weights["ln2_scale"], weights["ln2_bias"],
            weights["w1"], weights["b1"], weights["w2"], weights["b2"],
        )
        return out.reshape(y.shape)

    total = timed(scan_chain(mlp_op, 1), x, reps=reps_iters)
    print(f"mlp-only            : total {total:7.1f} ms -> {(total - rpc_ms) / reps_iters:.3f} ms/app", flush=True)

    def roll_op(y):
        return jnp.roll(y, (-4, -4), axis=(1, 2))

    total = timed(scan_chain(roll_op, 1), x, reps=reps_iters)
    print(f"XLA roll pass       : total {total:7.1f} ms -> {(total - rpc_ms) / reps_iters:.3f} ms/app", flush=True)


if __name__ == "__main__":
    main()
