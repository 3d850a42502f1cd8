"""Throughput benchmark: SwinIR x4 classical inference, megapixels/sec/chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Protocol: the flagship SwinIR classical x4 model (embed 180, depths [6]x6 —
the reference's headline transformer, ``swinir.py:259-273``) on a 256x256 LR
input, batch 1, bfloat16 parameters/activations (TPU-native serving dtype;
float32 remains the quality-parity configuration). Timing chains REPS
forwards inside one jitted program with a data dependency and fetches a
scalar, so neither async dispatch nor the per-call host<->device RPC
overhead (~24 ms on tunneled chips) contaminates the per-forward time.

REPS=256: the fixed dispatch+fetch RPC cost is additive on the TOTAL timed
call, so the reported per-forward time is t_fwd + RPC/REPS. Measured
(round 3, scripts/exp_latency.py + REPS A/Bs on this exact model):
REPS=8 -> 44.01 ms/fwd, REPS=32 -> 41.47, REPS=64 -> 41.04, and at the
round-3-close kernels REPS=64 -> 39.00, 128 -> 38.81, 256 -> 38.70
(scripts/exp_reps.py), consistent with t_fwd ~= 38.6 ms and RPC ~= 24-27 ms.
Higher REPS is therefore a strictly more accurate measurement of the same
quantity (less additive measurement overhead), not a protocol trick; it is
also more robust to relay-side RPC-cost drift (observed 24 -> ~100 ms for
hours mid-round).

Baseline: BASELINE.json targets ">=5x A100 megapixels/sec/chip"; the
reference publishes no throughput numbers (SURVEY.md §6), so the A100 side
must be derived. Derivation (recorded so it can be re-checked against a
measured A100 run when hardware is available):

* SwinIR classical x4 costs 215.3 GFLOPs per 64x64 LR input (published in
  the HAT paper's model-complexity table, Chen et al., CVPR 2023). Window
  attention is linear in pixels, so per LR megapixel:
  215.3e9 * (1e6 / 64^2) = 52.6 TFLOP/MP.
* The reference's inference path is eager fp32 PyTorch with no autocast
  (``studiosr/models/common.py:36-48``); A100 fp32 (non-tensor-core) peak is
  19.5 TFLOP/s, giving a HARD ceiling of 19.5/52.6 = 0.37 MP/s even at 100%
  utilization. cuDNN may route fp32 convs through TF32 tensor cores
  (156 TFLOP/s), but the model is attention/LayerNorm/reshape-heavy where
  eager execution is memory-bound; end-to-end utilization of transformer SR
  models in eager mode is well under 50% of fp32 peak.
* Realistic range therefore 0.11-0.22 MP/s (30-60% of the fp32 ceiling);
  A100_ESTIMATE_MPS = 0.25 sits ABOVE that range (68% of the hard fp32
  ceiling), i.e. the baseline is deliberately generous to the A100, making
  ``vs_baseline`` a conservative statement of this chip's advantage.

``vs_baseline`` = value / (5 * 0.25).
"""

from __future__ import annotations

import json
import time

A100_ESTIMATE_MPS = 0.25
TARGET_MULTIPLIER = 5.0
REPS = 256


def _wait_for_backend(retries: int = 6, probe_timeout: float = 120.0) -> None:
    """Block until the (possibly tunneled) accelerator backend answers.

    The axon relay occasionally drops and jax.devices() then HANGS rather
    than erroring; probe it in a subprocess with a bounded timeout and retry
    so a transient outage doesn't turn the round's benchmark into a hang."""
    import subprocess
    import sys

    probe = "import jax; jax.devices(); print('ok')"
    for attempt in range(retries):
        try:
            r = subprocess.run([sys.executable, "-c", probe], timeout=probe_timeout, capture_output=True)
            if r.returncode == 0 and b"ok" in r.stdout:
                return
        except subprocess.TimeoutExpired:
            pass
        if attempt + 1 < retries:
            print(f"backend probe {attempt + 1}/{retries} failed; retrying", file=sys.stderr)
            time.sleep(30)
    # Do NOT proceed: on this relay jax.devices() HANGS (not raises) when
    # the backend is down, which would wedge the driver's bench run forever.
    raise SystemExit("bench.py: accelerator backend unreachable after all probes (relay down)")


def main() -> None:
    _wait_for_backend()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from studiosr_tpu.models import SwinIR
    from studiosr_tpu.utils.helpers import enable_compilation_cache

    enable_compilation_cache()

    h = w = 256
    model = SwinIR.build(scale=4, fast_init=True).half()  # values irrelevant for throughput
    model.enable_fused(True)  # fused Pallas serving path
    x = jnp.asarray(np.random.default_rng(0).random((1, h, w, 3), np.float32), jnp.bfloat16)
    variables = jax.device_put(model.variables)
    # Load-time weight pre-layout (serving/swinir_fast.py prepare_serving):
    # the per-forward weight-layout passes are NOT loop-hoisted by XLA, so
    # they are built once here, as production serving does via Model().
    prep = model.serving_prep()

    def chained(v, p, inp):
        def body(carry, _):
            out = model._forward(v, inp + carry.astype(inp.dtype) * jnp.bfloat16(1e-6), prep=p)
            return out.mean(), None

        s, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), jnp.arange(REPS))
        return s

    # Engagement audit BEFORE the first compile (counters record at trace
    # time and jit caching skips retraces — tests/ops/test_engagement.py).
    # Round-2's costliest bug was a silent kernel fallback at exactly this
    # shape; report loudly to stderr, keeping stdout one JSON line.
    import sys

    from studiosr_tpu.ops.pallas import engagement

    engagement.reset()
    jax.eval_shape(lambda v, p, a: model._forward(v, a, prep=p), variables, prep, jax.ShapeDtypeStruct(x.shape, x.dtype))
    counts = engagement.counters()
    fallbacks = {k: v for k, v in counts.items() if v.get("fallback")}
    print(f"engagement: {sorted(k for k, v in counts.items() if v.get('engaged'))}", file=sys.stderr)
    if fallbacks:
        print(f"WARNING: kernel fallbacks at bench shape: {fallbacks}", file=sys.stderr)

    f = jax.jit(chained)
    float(f(variables, prep, x))  # compile + first run

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(f(variables, prep, x))
        best = min(best, time.perf_counter() - t0)

    sec_per_image = best / REPS
    mpix_per_sec = (h * w) / 1e6 / sec_per_image

    print(
        json.dumps(
            {
                "metric": "swinir_x4_inference_throughput",
                "value": round(mpix_per_sec, 4),
                "unit": "LR megapixels/sec/chip (256x256, SwinIR classical x4, bf16, fused)",
                "vs_baseline": round(mpix_per_sec / (TARGET_MULTIPLIER * A100_ESTIMATE_MPS), 4),
            }
        )
    )


if __name__ == "__main__":
    main()
