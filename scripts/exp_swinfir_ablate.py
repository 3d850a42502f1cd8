"""In-context dissection of SwinFIR's SFB spectral path on TPU.

    python scripts/exp_swinfir_ablate.py

Round-3 sweep: SwinFIR fused = 72.8 ms at 256x256 x4 bf16 vs SwinIR 48.2 —
the ~25 ms delta is the 7 SFBs, ~3x their FLOP/stream budget. Suspects: the
12 separate f32 DFT einsums (relayout per einsum, f32 traffic in a bf16
trunk). Variants measured here:

  split          round-3 formulation (6 dots per transform, f32 operands)
  merged         cos/sin stacked into single dots, bf16 operands (ops/dft.py
                 DFT_IMPL="merged", the new default)
  no-dft         rfft/irfft stubbed to cheap slices/zeros (timing-only,
                 wrong math) — the lower bound with all convs kept

Also prints the merged-vs-split full-forward max|dev| (both bf16) so the
dtype change's numerical effect is on record.
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

    import studiosr_tpu.ops.dft as dft
    from studiosr_tpu.models import SwinFIR
    from studiosr_tpu.utils.helpers import enable_compilation_cache

    enable_compilation_cache()
    reps = 8
    h = w = 256
    model = SwinFIR.build(scale=4, fast_init=True).half().enable_fused(True)
    x = jnp.asarray(np.random.default_rng(0).random((1, h, w, 3), np.float32), jnp.bfloat16)
    variables = jax.device_put(model.variables)

    real_rfft, real_irfft = dft.rfft2_mxu, dft.irfft2_mxu

    def stub_rfft(t):
        kw = t.shape[2] // 2 + 1
        return t[:, :, :kw, :], t[:, :, :kw, :]

    def stub_irfft(re, im, w_out):
        b, hh, _, c = re.shape
        return jnp.zeros((b, hh, w_out, c), re.dtype) + re[:, :, :1, :]

    from studiosr_tpu.serving import swinir_fast

    outs = {}
    for name in ("split", "merged", "xla-sconv", "no-dft"):
        swinir_fast.SFB_STREAM_S = name != "xla-sconv"
        if name == "no-dft":
            dft.rfft2_mxu, dft.irfft2_mxu = stub_rfft, stub_irfft
            dft.DFT_IMPL = "merged"
        else:
            dft.rfft2_mxu, dft.irfft2_mxu = real_rfft, real_irfft
            dft.DFT_IMPL = "split" if name == "split" else "merged"

        def chained(v, inp):
            def body(carry, _):
                out = model._forward(v, inp + carry.astype(inp.dtype) * jnp.bfloat16(1e-6))
                return out.mean(), None

            s, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), jnp.arange(reps))
            return s

        f = jax.jit(chained)
        float(f(variables, x))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(f(variables, x))
            best = min(best, time.perf_counter() - t0)
        ms = best / reps * 1e3
        mp_s = (h * w * 16) / 1e6 / (best / reps)
        print(f"{name:10s}: {ms:7.1f} ms  ({mp_s:.2f} MP/s)", flush=True)

        if name in ("split", "merged"):
            g = jax.jit(model._forward)
            outs[name] = np.asarray(g(variables, x), np.float32)

    dft.rfft2_mxu, dft.irfft2_mxu = real_rfft, real_irfft
    dft.DFT_IMPL = "merged"
    swinir_fast.SFB_STREAM_S = True
    dev = np.abs(outs["merged"] - outs["split"])
    print(f"merged-vs-split full forward: max|dev| {dev.max():.5f}  mean {dev.mean():.6f}")


if __name__ == "__main__":
    main()
