"""Audit the optimized HLO of the fused serving forward for glue passes.

    python scripts/exp_hlo_audit.py [--model swinir] [--size 256]

With the RPC artifact identified (exp_latency.py: ~24 ms per timed
dispatch+fetch, true streaming 200-350 GB/s), the remaining question is
what the in-context per-block cost (~0.98 ms) is made of. This compiles
the fused serving forward and inventories the optimized HLO: every
non-trivial op between the Pallas custom-calls, sized in bytes — layout
copies, transposes, and fusions at map scale are candidate glue passes
XLA inserts around the kernels.
"""

from __future__ import annotations

import argparse
import collections
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def shape_bytes(shape_str: str) -> int:
    """Parse an HLO shape like 'bf16[1,264,264,180]{3,2,1,0}' -> logical bytes."""
    m = re.match(r"(\w+)\[([\d,]*)\]", shape_str)
    if not m:
        return 0
    dtype, dims = m.group(1), m.group(2)
    bpe = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "s8": 1, "u8": 1, "pred": 1, "f16": 2, "s16": 2, "u16": 2}.get(dtype, 4)
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * bpe


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", default="swinir")
    parser.add_argument("--size", type=int, default=256)
    parser.add_argument("--min-mb", type=float, default=1.0, help="only list ops touching >= this many MB")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from studiosr_tpu.utils.helpers import enable_compilation_cache

    enable_compilation_cache()

    if args.model == "swinir":
        from studiosr_tpu.models import SwinIR

        model = SwinIR.build(scale=4, fast_init=True).half()
    elif args.model == "hat":
        from studiosr_tpu.models import HAT

        model = HAT.build(scale=4, fast_init=True).half()
    else:
        raise SystemExit(f"unknown model {args.model}")
    model.enable_fused(True)

    h = w = args.size
    x = jnp.asarray(np.random.default_rng(0).random((1, h, w, 3), np.float32), jnp.bfloat16)
    variables = jax.device_put(model.variables)

    prep = model.serving_prep()  # audit the pre-laid serving configuration
    kw = {} if prep is None else {"prep": prep}
    lowered = jax.jit(lambda v, a: model._forward(v, a, **kw)).lower(variables, x)
    compiled = lowered.compile()
    hlo = compiled.as_text()

    # Inventory top-level (entry-computation) instructions by opcode, sized by
    # output shape; fusions count their root output.
    op_bytes = collections.Counter()
    op_count = collections.Counter()
    biglines = []
    in_entry = False
    for line in hlo.splitlines():
        if line.startswith("ENTRY "):
            in_entry = True
            continue
        if in_entry and line.startswith("}"):
            in_entry = False
        if not in_entry:
            continue
        m = re.match(r"\s+(%?[\w.\-]+)\s*=\s*(\S+)\s+([\w\-]+)\(", line)
        if not m:
            continue
        shape_str, opcode = m.group(2), m.group(3)
        b = shape_bytes(shape_str)
        op_bytes[opcode] += b
        op_count[opcode] += 1
        if b >= args.min_mb * 1e6 and opcode not in ("parameter",):
            # keep the line, truncated
            biglines.append((b, line.strip()[:240]))

    print("== opcode inventory (entry computation, output bytes) ==")
    for opcode, b in op_bytes.most_common():
        print(f"  {opcode:25s} x{op_count[opcode]:4d}  {b/1e6:10.1f} MB out")

    print(f"\n== ops with >= {args.min_mb} MB output ==")
    for b, line in sorted(biglines, reverse=True)[:80]:
        print(f"  {b/1e6:8.1f} MB  {line}")

    n_cc = op_count.get("custom", 0) + op_count.get("custom-call", 0)
    print(f"\ncustom-calls (pallas kernels): {n_cc}")
    total = sum(op_bytes.values())
    print(f"total entry output bytes: {total/1e6:.1f} MB")


if __name__ == "__main__":
    main()
