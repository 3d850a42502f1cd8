"""Dissect the REMAINING OCAB overlap surcharge in HAT's fused train step.

After the OCA-core custom VJP landed (scores stay in VMEM both directions),
the overlap_ratio=0 structural ablation still reads -0.164 s/step
(exp_hat_train_ablate.py: base 0.885 vs ocab_light 0.721). Candidates, each
flipped via the trace-time knobs in models/hat.py:

  base        current defaults (OCAB rematted, bias gathered + trained)
  noremat     OCAB_REMAT=False — backward no longer recomputes the 2.25x kv
              unfold + qkv dense + bias gather (memory: VJP residuals are
              saved instead; may OOM at batch 32 — that itself is the answer)
  nobiasgrad  OCA_BIAS_GRAD=False — timing probe: no (2209, heads) table
              scatter-add in the backward
  nobias      OCA_BIAS=False — timing probe: no (heads, 256, 576) gather in
              either direction
  noremat_nobiasgrad  the two combined

    python scripts/exp_ocab_train_micro.py [--variants ...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--variants", nargs="+",
        default=["base", "noremat", "nobiasgrad", "nobias", "noremat_nobiasgrad"])
    parser.add_argument("--batch", type=int, default=32)
    parser.add_argument("--crop", type=int, default=64)
    parser.add_argument("--steps", type=int, default=8)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from studiosr_tpu import models as M
    from studiosr_tpu.models import hat as hat_mod
    from studiosr_tpu.parallel import build_optimizer, get_mesh, make_train_step, prepare_state, shard_batch
    from studiosr_tpu.utils.helpers import enable_compilation_cache
    from studiosr_tpu.utils.losses import l1_loss

    enable_compilation_cache()

    batch, crop, steps = args.batch, args.crop, args.steps
    mesh = get_mesh()
    tx = build_optimizer()
    rng = np.random.default_rng(0)
    lq = rng.random((batch, crop, crop, 3), np.float32)
    gt = rng.random((batch, crop * 4, crop * 4, 3), np.float32)
    lq, gt = shard_batch((jnp.asarray(lq), jnp.asarray(gt)), mesh)
    key = jax.random.PRNGKey(0)

    variants = {
        "base": {},
        "noremat": {"OCAB_REMAT": False},
        "nobiasgrad": {"OCA_BIAS_GRAD": False},
        "nobias": {"OCA_BIAS": False},
        "noremat_nobiasgrad": {"OCAB_REMAT": False, "OCA_BIAS_GRAD": False},
    }
    defaults = {k: getattr(hat_mod, k) for k in ("OCAB_REMAT", "OCA_BIAS", "OCA_BIAS_GRAD")}
    for name in args.variants:
        flags = variants[name]
        for k, v in defaults.items():
            setattr(hat_mod, k, flags.get(k, v))
        try:
            # Fresh model + fresh jit per variant: jit caches trace-time
            # branches, so a stale callable would silently reuse old flags.
            model = M.HAT.build(scale=4, fast_init=True)
            module = model.module.clone(fused_train=True)
            state = prepare_state(model.variables, tx, mesh)
            step_fn = make_train_step(module, tx, l1_loss, bfloat16=True, mesh=mesh, chain=steps)

            t0 = time.perf_counter()
            state, loss = step_fn(state, lq, gt, key)
            float(loss)
            compile_s = time.perf_counter() - t0

            t0 = time.perf_counter()
            state, loss = step_fn(state, lq, gt, jax.random.fold_in(key, 1))
            final = float(loss)
            dt = (time.perf_counter() - t0) / steps
            print(
                f"{name:18s}: {dt:.3f} s/step = {batch / dt:.1f} img/s  "
                f"(loss {final:.4f}, compile {compile_s:.0f}s)",
                flush=True,
            )
        except Exception as exc:  # OOM on noremat is itself a finding
            print(f"{name:18s}: FAILED — {type(exc).__name__}: {str(exc)[:300]}", flush=True)
        finally:
            for k, v in defaults.items():
                setattr(hat_mod, k, v)


if __name__ == "__main__":
    main()
