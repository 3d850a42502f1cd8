"""In-context dissection of the MaxSR forward on TPU.

    python scripts/exp_maxsr_ablate.py [--size 256]

MaxSR is the slowest model in the round-3 sweep (127 ms / 0.52 MP/s at
256x256 x4 bf16) and still runs pure XLA. Before building any kernel,
locate where the time goes: the 16 MBConv inverted bottlenecks (hidden
512ch at full resolution — heavy HBM traffic), the 32 attention pairs
(XLA materializes (256,4,256,256) f32 score maps), the SE global-pool
gates, or the HFFB/upsample tail.

Ablation is by monkeypatching module methods before trace (timing-only,
wrong math) — MaxSR has no serving path with an _ablate hook.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# This script IS the experimental build the MBCONV_ABLATE guard exists for
# (models/maxsr.py _mbconv_ablate).
os.environ["STUDIOSR_EXPERIMENTAL_ABLATIONS"] = "1"


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    import studiosr_tpu.models.maxsr as mx
    from studiosr_tpu.models import MaxSR
    from studiosr_tpu.utils.helpers import enable_compilation_cache

    enable_compilation_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--reps", type=int, default=4)
    p.add_argument("--fused", action="store_true", help="ablate the enable_fused(True) serving path")
    p.add_argument("--variants", nargs="*", default=None, help="substring filter on variant names")
    args = p.parse_args()

    h = w = args.size
    reps = args.reps
    model = MaxSR.build(scale=4, fast_init=True).half()
    if args.fused:
        model.enable_fused(True)
    x = jnp.asarray(np.random.default_rng(0).random((1, h, w, 3), np.float32), jnp.bfloat16)
    variables = jax.device_put(model.variables)

    orig_attn_core = mx.attention_core
    orig_mbconv = mx.MBConv.__call__
    orig_pair = mx._AttentionPair.__call__
    orig_se = mx.SqueezeExcitation.__call__
    orig_attn = mx._Attention.__call__
    orig_ff = mx._FeedForward.__call__

    import studiosr_tpu.ops.pallas.window_attn as wa

    orig_wa = wa.window_attention_pallas

    def no_attn_core(q, k, v, bias=None, mask=None, **kw):
        # keep qkv/proj dots, drop the score/softmax/AV chain
        return q

    def patches(ab):
        out = {}
        if "attn_core" in ab:
            out[(mx, "attention_core")] = no_attn_core
            out[(wa, "window_attention_pallas")] = no_attn_core
        if "mbconv" in ab:
            out[(mx.MBConv, "__call__")] = lambda self, x, train=False: x
        if "pair" in ab:
            out[(mx._AttentionPair, "__call__")] = lambda self, x, wh, ww: x
        if "se" in ab:
            out[(mx.SqueezeExcitation, "__call__")] = lambda self, x: x
        if "attn" in ab:
            out[(mx._Attention, "__call__")] = lambda self, t: t
        if "ff" in ab:
            out[(mx._FeedForward, "__call__")] = lambda self, t: t
        if "bias" in ab:
            # trace-time knob in the model (flax compact __call__ cannot be
            # monkeypatched with a param-creating function — wrong scope)
            out[(mx, "ABLATE_BIAS")] = True
        if "dw_diag" in ab:
            out[(mx, "DW_IMPL")] = "diag_dense"
        inner = ab & {"dw", "expand", "project", "bn"}
        if inner:
            out[(mx, "MBCONV_ABLATE")] = frozenset(inner)
        return out

    variants = [
        ("full", frozenset()),
        ("no rel-pos bias (gather+add)", frozenset({"bias"})),
        ("no attn core (dots kept)", frozenset({"attn_core"})),
        ("no attention (qkv+core+proj)", frozenset({"attn"})),
        ("no feed-forward", frozenset({"ff"})),
        ("no attention pairs (attn+ff+LN+part)", frozenset({"pair"})),
        ("no SE gates", frozenset({"se"})),
        ("no MBConv", frozenset({"mbconv"})),
        ("stem+HFFB+tail only", frozenset({"mbconv", "pair"})),
        # MBConv-internal dissection (trace-time knobs in the model):
        ("mb: no depthwise conv", frozenset({"dw"})),
        ("mb: no expand 1x1", frozenset({"expand"})),
        ("mb: no project 1x1", frozenset({"project"})),
        ("mb: no BatchNorms", frozenset({"bn"})),
        # Exact-math candidate: depthwise as diagonal dense MXU conv.
        ("mb: dw_diag_dense (exact)", frozenset({"dw_diag"})),
    ]
    originals = {
        (mx, "ABLATE_BIAS"): False,
        (mx, "MBCONV_ABLATE"): frozenset(),
        (mx, "DW_IMPL"): "depthwise",
        (wa, "window_attention_pallas"): orig_wa,
        (mx, "attention_core"): orig_attn_core,
        (mx.MBConv, "__call__"): orig_mbconv,
        (mx._AttentionPair, "__call__"): orig_pair,
        (mx.SqueezeExcitation, "__call__"): orig_se,
        (mx._Attention, "__call__"): orig_attn,
        (mx._FeedForward, "__call__"): orig_ff,
    }

    for name, ab in variants:
        if args.variants and not any(s in name for s in args.variants):
            continue
        pt = patches(ab)
        for key, fn in pt.items():
            setattr(key[0], key[1], fn)
        try:

            def chained(v, inp):
                def body(carry, _):
                    out = model._forward(v, inp + carry.astype(inp.dtype) * jnp.bfloat16(1e-6))
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
