"""Capture a real device trace of the SwinIR serving forward and print the
per-op time breakdown (ground truth for where the milliseconds go).

    python scripts/exp_profile.py [--out /tmp/swinir_trace]

Parses the captured .xplane.pb directly (tensorflow proto) and aggregates
device-plane event durations by op category.
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_xplane(path):
    from tensorflow.core.profiler.protobuf import xplane_pb2

    xspace = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xspace.ParseFromString(f.read())
    rows = []
    for plane in xspace.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name.lower():
            continue
        for line in plane.lines:
            for ev in line.events:
                meta = plane.event_metadata[ev.metadata_id]
                rows.append((plane.name, line.name, meta.name, ev.duration_ps / 1e9))
    return rows


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="/tmp/swinir_trace")
    parser.add_argument("--model", default="swinir")
    parser.add_argument("--reps", type=int, default=4)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from studiosr_tpu.utils.helpers import enable_compilation_cache
    from studiosr_tpu.zoo.registry import get_model_class

    enable_compilation_cache()
    h = w = 256
    model = get_model_class(args.model).build(scale=4, fast_init=True).half()
    if hasattr(model, "enable_fused"):
        model.enable_fused(True)
    x = jnp.asarray(np.random.default_rng(0).random((1, h, w, 3), np.float32), jnp.bfloat16)
    variables = jax.device_put(model.variables)

    def chained(v, inp):
        def body(carry, _):
            out = model._forward(v, inp + carry.astype(inp.dtype) * jnp.bfloat16(1e-6))
            return out.mean(), None

        s, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), jnp.arange(args.reps))
        return s

    f = jax.jit(chained)
    float(f(variables, x))  # compile outside the trace

    jax.profiler.start_trace(args.out)
    float(f(variables, x))
    jax.profiler.stop_trace()

    files = glob.glob(os.path.join(args.out, "**", "*.xplane.pb"), recursive=True)
    print("xplane files:", files)
    rows = []
    for p in files:
        rows.extend(parse_xplane(p))
    if not rows:
        print("no TPU plane events captured (relay may not support device tracing)")
        return

    by_line = defaultdict(float)
    by_op = defaultdict(float)
    for plane, line, op, sec in rows:
        by_line[(plane, line)] += sec
        key = op.split(".")[0].split("(")[0]
        by_op[key] += sec
    print("\n== per line ==")
    for k, v in sorted(by_line.items(), key=lambda kv: -kv[1])[:10]:
        print(f"{v * 1e3 / args.reps:9.2f} ms/rep  {k}")
    print("\n== per op (top 40) ==")
    for k, v in sorted(by_op.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{v * 1e3 / args.reps:9.3f} ms/rep  {k}")


if __name__ == "__main__":
    main()
