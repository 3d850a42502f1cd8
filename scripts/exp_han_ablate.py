"""In-context dissection of the HAN forward on TPU.

    python scripts/exp_han_ablate.py [--size 256]

HAN is 106.1 ms in the round-3 sweep vs 47.3 for RCAN, whose trunk it
shares (10 ResidualGroups x 20 RCAB). The extra ~59 ms sits somewhere in
the holistic-attention head: the LAM bilinear form over the 11-layer
stack (two (11, H*W*C) matmuls + a 92 MB stack relayout), the CSAM 3-D
conv gate (a 1-in/1-out-channel stencil XLA cannot MXU-tile), or the
704->64 fusion convs. Locate it before building anything.

Ablation is by monkeypatching module methods before trace (timing-only,
wrong math).
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

    import studiosr_tpu.models.han as hn
    from studiosr_tpu.models import HAN
    from studiosr_tpu.utils.helpers import enable_compilation_cache

    enable_compilation_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--reps", type=int, default=4)
    p.add_argument("--only", nargs="*", default=None, help="substring filter on variant names")
    args = p.parse_args()

    h = w = args.size
    reps = args.reps
    model = HAN.build(scale=4, fast_init=True).half()
    x = jnp.asarray(np.random.default_rng(0).random((args.batch, h, w, 3), np.float32), jnp.bfloat16)
    variables = jax.device_put(model.variables)

    orig_lam = hn.LAM.__call__
    orig_csam = hn.CSAM.__call__
    orig_rg = hn.ResidualGroup.__call__
    import flax.linen as nn

    from studiosr_tpu.models.blocks import Upsampler, conv, mean_shift

    class _HanNoStack(hn.HANModule):
        """Trunk as a pure RCAN-style chain: no 11-map stack is ever formed,
        so nothing keeps the intermediate RG outputs live. Isolates "stack
        liveness" from "trunk compute" at batch > 1 (timing-only: LAM/fusion
        replaced by one conv on the final map; param tree is a subset, so
        the HAN variables apply)."""

        @nn.compact
        def __call__(self, x, train=False):
            x = mean_shift(x, self.img_range, sign=-1)
            x = conv(self.n_feats, 3, name="head.0")(x)
            res = x
            for g in range(self.n_resgroups):
                res = hn.ResidualGroup(self.n_feats, 3, self.reduction, self.n_resblocks, name=f"body.{g}")(res)
            res = conv(self.n_feats, 3, name=f"body.{self.n_resgroups}")(res)
            out = jnp.concatenate([res, res], axis=-1)
            res = conv(self.n_feats, 3, name="last")(out) + x
            x = Upsampler(self.scale, self.n_feats, name="tail.0")(res)
            x = conv(self.n_colors, 3, name="tail.1")(x)
            return mean_shift(x, self.img_range, sign=1)

    def lam_no_energy(self, stack):
        # keep the remix einsum's traffic, drop the energy einsum + softmax
        b, n = stack.shape[:2]
        flat = stack.reshape(b, n, -1)
        attention = jnp.full((b, n, n), 1.0 / n, flat.dtype)
        return jnp.einsum("bnm,bmd->bnd", attention, flat).reshape(stack.shape) + stack

    def csam_no_stencil(self, x):
        # keep an elementwise gate pass on the res->concat path, drop the
        # 29-term stencil: isolates "stencil reads" from "extra stage".
        return x * jax.nn.sigmoid(x) + x

    def csam_barrier_in(self, x):
        # timing-only stencil (fixed weights) with the input materialized
        _, h2, w2, c2 = x.shape
        x = jax.lax.optimization_barrier(x)
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        acc = None
        for kc in range(3):
            s = None
            for kh in range(3):
                for kw in range(3):
                    s_t = (0.01 * (kc * 9 + kh * 3 + kw + 1)) * xp[:, kh : kh + h2, kw : kw + w2, :]
                    s = s_t if s is None else s + s_t
            if kc != 1:
                sp = jnp.pad(s, ((0, 0), (0, 0), (0, 0), (1, 1)))
                s = sp[..., kc : kc + c2]
            acc = s if acc is None else acc + s
        return x * jax.nn.sigmoid(acc) + x

    def patches(ab):
        out = {}
        if "lam" in ab:
            out[(hn.LAM, "__call__")] = lambda self, stack: stack
        if "lam_energy" in ab:
            out[(hn.LAM, "__call__")] = lam_no_energy
        if "csam" in ab:
            out[(hn.CSAM, "__call__")] = lambda self, x: x
        if "csam_no_stencil" in ab:
            out[(hn.CSAM, "__call__")] = csam_no_stencil
        if "csam_barrier_in" in ab:
            out[(hn.CSAM, "__call__")] = csam_barrier_in
        if "trunk" in ab:
            out[(hn.ResidualGroup, "__call__")] = lambda self, x: x
        return out

    originals = {
        (hn.LAM, "__call__"): orig_lam,
        (hn.CSAM, "__call__"): orig_csam,
        (hn.ResidualGroup, "__call__"): orig_rg,
    }
    fields = {
        k: getattr(model.module, k)
        for k in type(model.module).__dataclass_fields__
        if k not in ("parent", "name")
    }
    no_stack_module = _HanNoStack(**fields)

    variants = [
        ("full", frozenset()),
        ("no LAM (stack+fusion kept)", frozenset({"lam"})),
        ("LAM sans energy einsums", frozenset({"lam_energy"})),
        ("no CSAM", frozenset({"csam"})),
        ("CSAM sans stencil (1-read gate)", frozenset({"csam_no_stencil"})),
        ("CSAM stencil, input barrier", frozenset({"csam_barrier_in"})),
        ("no trunk groups", frozenset({"trunk"})),
        ("no LAM + no CSAM", frozenset({"lam", "csam"})),
        ("no stack (pure RCAN-style chain)", frozenset({"no_stack"})),
    ]
    if args.only:
        variants = [v for v in variants if any(tok in v[0] for tok in args.only)]

    for name, ab in variants:
        pt = patches(ab)
        for key, fn in pt.items():
            setattr(key[0], key[1], fn)
        fwd = (lambda v, xx: no_stack_module.apply(v, xx)) if "no_stack" in ab else model._forward
        try:

            def chained(v, inp):
                def body(carry, _):
                    out = fwd(v, inp + carry.astype(inp.dtype) * jnp.bfloat16(1e-6))
                    return out.astype(jnp.float32).mean(), None

                s, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), jnp.arange(reps))
                return s

            f = jax.jit(chained)
            float(f(variables, x))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(f(variables, x))
                best = min(best, time.perf_counter() - t0)
            print(f"{name:40s}: {best / reps * 1e3:7.1f} ms", flush=True)
        finally:
            for key in pt:
                setattr(key[0], key[1], originals[key])


if __name__ == "__main__":
    main()
