"""Audited FLOP counts -> MFU/roofline numbers for the headline configs.

    python scripts/exp_mfu.py            # all rows
    python scripts/exp_mfu.py swinir hat

Round-4 VERDICT item 6: publish achieved TFLOP/s and %-of-peak for
SwinIR/HAT serving and training from the MEASURED times and an audited
FLOP count. FLOPs come from XLA's own cost analysis of the compiled plain
(non-fused) forward on CPU — the fused Pallas paths compute the same math,
so the count transfers; XLA counts a dot as 2*M*N*K flops.

Geometries match the recorded measurements (docs/benchmark.md):
* serving: batch 1, 256x256 LR, x4 — the model pads to its eval window
  multiple internally (SwinIR/HAT run the 264/272 map);
* training: batch 32, 64px LR crops, x4 — full step (fwd + loss + bwd +
  Adam), the driver config-#5 shape.

Measured times are pinned below from docs/benchmark.md (reps>=64 chained
protocol; see STATUS.md round-3 session 7 for why micro absolutes below
reps 64 are RPC-inflated). v5e peak: 197 TFLOP/s bf16 per chip.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

V5E_PEAK_TFLOPS = 197.0  # bf16 per chip

# model -> (serving ms/img @256x256 x4 bf16 fused, training img/s @batch32/64px)
MEASURED = {
    "swinir": (38.7, 104.7),
    "hat": (75.2, 36.5),
    "swinfir": (54.6, 90.7),
    "maxsr": (95.7, 71.0),
    "han": (48.5, 80.0),
    "edsr": (54.9, 94.2),
    "rcan": (39.7, 91.2),
}

TRAIN_BATCH = 32
TRAIN_CROP = 64


def build(name):
    from studiosr_tpu import models

    builders = {
        "swinir": lambda: models.SwinIR.build(scale=4),
        "hat": lambda: models.HAT.build(scale=4),
        "swinfir": lambda: models.SwinFIR.build(scale=4),
        "maxsr": lambda: models.MaxSR.build(scale=4, adaptive=True),
        "han": lambda: models.HAN.build(scale=4),
        "edsr": lambda: models.EDSR.build(scale=4),
        "rcan": lambda: models.RCAN.build(scale=4),
    }
    return builders[name]()


def _flops(lowered) -> float:
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, list):  # older jax returns [dict]
        cost = cost[0]
    return float(cost["flops"])


def serving_flops(model) -> float:
    import jax.numpy as jnp

    x = jnp.zeros((1, 256, 256, 3), jnp.float32)
    fn = lambda v, x: model._forward(v, x)
    return _flops(jax.jit(fn).lower(model.variables, x))


def training_flops(model) -> float:
    """Full train step (fwd + loss + bwd + Adam) per batch."""
    import jax.numpy as jnp
    import optax

    from studiosr_tpu.parallel.train_step import make_train_step, prepare_state
    from studiosr_tpu.utils.losses import l1_loss

    tx = optax.adam(1e-4)
    state = prepare_state(model.variables, tx)
    step = make_train_step(model.module, tx, l1_loss, bfloat16=True, donate=False)
    lq = jnp.zeros((TRAIN_BATCH, TRAIN_CROP, TRAIN_CROP, 3), jnp.float32)
    gt = jnp.zeros((TRAIN_BATCH, TRAIN_CROP * 4, TRAIN_CROP * 4, 3), jnp.float32)
    return _flops(step.lower(state, lq, gt, jax.random.PRNGKey(0)))


def main() -> None:
    # Count SwinFIR through the MXU-DFT (the TPU path being measured);
    # the CPU jnp.fft route rejects the bf16 training autocast anyway.
    from studiosr_tpu.ops import dft

    dft.FORCE_MXU = True
    names = sys.argv[1:] or list(MEASURED)
    unknown = [n for n in names if n not in MEASURED]
    if unknown:  # a typo must not surface as a bare KeyError mid-table
        raise SystemExit(f"unknown model(s) {unknown}; choose from {sorted(MEASURED)}")
    print(f"{'model':>8} | {'fwd GFLOP':>10} {'serve ms':>9} {'TFLOP/s':>8} {'MFU %':>6} | "
          f"{'step TFLOP':>10} {'img/s':>7} {'TFLOP/s':>8} {'MFU %':>6}")
    for name in names:
        serve_ms, train_imgs = MEASURED[name]
        model = build(name)
        fw = serving_flops(model)
        tf_serve = fw / (serve_ms / 1e3) / 1e12
        row = (f"{name:>8} | {fw / 1e9:10.1f} {serve_ms:9.1f} {tf_serve:8.1f} "
               f"{100 * tf_serve / V5E_PEAK_TFLOPS:6.1f} | ")
        try:
            ft = training_flops(model)
            step_s = TRAIN_BATCH / train_imgs
            tf_train = ft / step_s / 1e12
            row += (f"{ft / 1e12:10.2f} {train_imgs:7.1f} {tf_train:8.1f} "
                    f"{100 * tf_train / V5E_PEAK_TFLOPS:6.1f}")
        except Exception as e:  # training geometry OOM on small CPU hosts etc.
            row += f"train-count failed: {type(e).__name__}: {str(e)[:120]}"
        print(row, flush=True)


if __name__ == "__main__":
    main()
