"""Compare XLA compiled cost_analysis between HAN variants on TPU.

    python scripts/exp_han_cost.py [--size 256]

The in-context ablation attributes ~45 ms to the CSAM stencil even though it
measures 0.92 ms standalone (STATUS.md round-3 "HAN dissection"). Two rival
explanations:
  (a) traffic — the stencil's presence adds ~GBs of HBM bytes (un-fused
      shifted reads / materialized pads);
  (b) schedule/layout poisoning — its pad/slice pattern flips a layout or
      fusion decision that slows the *trunk* convs.
The compiled program's own cost model separates them: (a) shows up as a
bytes-accessed delta, (b) as same-bytes-but-slower (cost model won't see it)
or as changed fusion/op counts in the optimized HLO.
"""

from __future__ import annotations

import argparse
import os
import re
import sys
from collections import Counter

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
    args = p.parse_args()

    h = w = args.size
    model = HAN.build(scale=4, fast_init=True).half()
    x = jnp.asarray(np.random.default_rng(0).random((1, h, w, 3), np.float32), jnp.bfloat16)
    variables = jax.device_put(model.variables)

    orig_csam = hn.CSAM.__call__

    def run(name, patch):
        hn.CSAM.__call__ = patch if patch is not None else orig_csam
        try:
            f = jax.jit(lambda v, inp: model._forward(v, inp))
            lowered = f.lower(variables, x)
            compiled = lowered.compile()
            cost = compiled.cost_analysis()
            if isinstance(cost, list):
                cost = cost[0]
            txt = compiled.as_text()
            ops = Counter(re.findall(r"= \S+ ([a-z-]+)\(", txt))
            fusions = Counter(re.findall(r'kind=(\w+)', txt))
            print(f"--- {name} ---", flush=True)
            for k in ("bytes accessed", "flops", "transcendentals", "optimal_seconds"):
                if k in cost:
                    print(f"  {k:20s}: {cost[k]:.4g}")
            top = ", ".join(f"{o}:{n}" for o, n in ops.most_common(12))
            print(f"  ops: {top}")
            print(f"  fusion kinds: {dict(fusions)}")
            # biggest fusion computations by number of lines (proxy for size)
            return cost, ops, txt
        finally:
            hn.CSAM.__call__ = orig_csam

    results = {}
    results["banded"] = run("full (CSAM_IMPL=banded)", None)
    hn.CSAM_IMPL = "stencil"
    try:
        results["stencil"] = run("full (CSAM_IMPL=stencil)", orig_csam)
    finally:
        hn.CSAM_IMPL = "banded"
    results["none"] = run("no CSAM", lambda self, xx: xx)

    base = results["none"]
    for name in ("banded", "stencil"):
        cost, ops, txt = results[name]
        db = cost.get("bytes accessed", 0) - base[0].get("bytes accessed", 0)
        df = cost.get("flops", 0) - base[0].get("flops", 0)
        print(f"\n{name} minus no-CSAM: bytes {db/1e9:.3f} GB, flops {df/1e9:.3f} G")
        print(f"  op-count delta: {dict(ops - base[1])}")
        print(f"  op-count delta (reverse): {dict(base[1] - ops)}")
        with open(f"/tmp/han_{name}.hlo", "w") as fh:
            fh.write(txt)
    with open("/tmp/han_none.hlo", "w") as fh:
        fh.write(base[2])
    print("optimized HLO written to /tmp/han_{banded,stencil,none}.hlo")


if __name__ == "__main__":
    main()
