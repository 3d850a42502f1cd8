"""Where does HAT's fused training step spend its 0.807 s?

    python scripts/exp_hat_train_ablate.py

Config-level ablation at the driver training shape (batch 32, 64px, x4,
bf16, fused custom-VJP blocks, scan-chained steps — one dispatch per
measurement). The HAB attention/MLP halves already run Pallas custom VJPs;
CAB and OCAB train through plain autodiff. Variants shrink one branch's
compute structurally (weight shapes change; timing-only comparison):

  base        compress_ratio=3  (60-ch CAB intermediate), overlap 0.5
  cab_light   compress_ratio=60 (3-ch intermediate) -> ~95% of CAB conv
              FLOPs removed; delta ~= CAB fwd+bwd cost
  ocab_light  overlap_ratio=0.0 -> kv gather collapses to plain windows
              (scores 256x256 instead of 256x576); delta ~= the OCAB
              overlap surcharge (not the whole OCAB)
  both        the two combined
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

    from studiosr_tpu import models as M
    from studiosr_tpu.parallel import build_optimizer, get_mesh, make_train_step, prepare_state, shard_batch
    from studiosr_tpu.utils.helpers import enable_compilation_cache
    from studiosr_tpu.utils.losses import l1_loss

    enable_compilation_cache()

    batch, crop, steps = 32, 64, 8
    mesh = get_mesh()
    tx = build_optimizer()
    rng = np.random.default_rng(0)
    lq = rng.random((batch, crop, crop, 3), np.float32)
    gt = rng.random((batch, crop * 4, crop * 4, 3), np.float32)
    lq, gt = shard_batch((jnp.asarray(lq), jnp.asarray(gt)), mesh)
    key = jax.random.PRNGKey(0)

    variants = {
        "base": {},
        "cab_light": {"compress_ratio": 60},
        "ocab_light": {"overlap_ratio": 0.0},
        "both": {"compress_ratio": 60, "overlap_ratio": 0.0},
    }
    for name, kw in variants.items():
        model = M.HAT.build(scale=4, fast_init=True, **kw)
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
            f"{name:10s}: {dt:.3f} s/step = {batch / dt:.1f} img/s  "
            f"(loss {final:.4f}, compile {compile_s:.0f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
