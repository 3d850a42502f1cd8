"""Standalone timing of HAN's CSAM gate variants on TPU.

    python scripts/exp_csam_micro.py

In-context ablation attributes ~45 of HAN's 100 ms to CSAM — a 29-term
elementwise stencil whose traffic budget is ~1 ms. Time it standalone in
several formulations to find what the chip is actually doing.
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

    from studiosr_tpu.utils.helpers import enable_compilation_cache

    enable_compilation_cache()
    h = w = 256
    c = 64
    reps = 32
    x0 = jnp.asarray(np.random.default_rng(0).random((1, h, w, c), np.float32), jnp.bfloat16)
    kern = jnp.asarray(np.random.default_rng(1).standard_normal((3, 3, 3)), jnp.bfloat16) * 0.1

    def stencil_3shift(x):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        acc = None
        for kc in range(3):
            s = None
            for kh in range(3):
                for kw in range(3):
                    term = kern[kc, kh, kw] * xp[:, kh : kh + h, kw : kw + w, :]
                    s = term if s is None else s + term
            if kc != 1:
                sp = jnp.pad(s, ((0, 0), (0, 0), (0, 0), (1, 1)))
                s = sp[..., kc : kc + c]
            acc = s if acc is None else acc + s
        return acc

    def gate_full(x):
        g = jax.nn.sigmoid(stencil_3shift(x))
        return x * g + x

    def hw_stencil_only(x):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        s = None
        for kh in range(3):
            for kw in range(3):
                term = kern[1, kh, kw] * xp[:, kh : kh + h, kw : kw + w, :]
                s = term if s is None else s + term
        return s

    def lane_shifts_only(x):
        sp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 1)))
        return kern[0, 0, 0] * sp[..., 0:c] + kern[1, 0, 0] * x + kern[2, 0, 0] * sp[..., 2 : 2 + c]

    def sigmoid_gate_only(x):
        return x * jax.nn.sigmoid(x) + x

    def conv3d_xla(x):
        # the original formulation: C-major volume + 3-D conv
        vol = x.transpose(0, 3, 1, 2)[..., None]
        out = jax.lax.conv_general_dilated(
            vol.astype(jnp.bfloat16),
            kern[..., None, None].astype(jnp.bfloat16),
            (1, 1, 1),
            [(1, 1)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
        return out[..., 0].transpose(0, 2, 3, 1)

    for name, fn in [
        ("full CSAM gate (stencil,3shift)", gate_full),
        ("27-term stencil only", stencil_3shift),
        ("9-term H/W stencil", hw_stencil_only),
        ("2 lane shifts + mix", lane_shifts_only),
        ("sigmoid gate only", sigmoid_gate_only),
        ("XLA 3-D conv (orig)", conv3d_xla),
    ]:

        def chained(inp, f=fn):
            def body(carry, _):
                out = f(inp + carry.astype(inp.dtype) * jnp.bfloat16(1e-6))
                return out.astype(jnp.float32).mean(), None

            s, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), jnp.arange(reps))
            return s

        g = jax.jit(chained)
        float(g(x0))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(g(x0))
            best = min(best, time.perf_counter() - t0)
        print(f"{name:34s}: {best / reps * 1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
