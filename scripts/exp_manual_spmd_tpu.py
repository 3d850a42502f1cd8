"""Validate the manual-SPMD (shard_map) paths with COMPILED Mosaic kernels.

    python scripts/exp_manual_spmd_tpu.py

The CPU test mesh runs Pallas in interpret mode, so it can never prove that
Mosaic custom calls lower inside shard_map. This runs on the real chip with
a 1-device mesh and manual=True — exercising the exact
`manual_axes == mesh.axis_names` branch in jax's tpu_custom_call lowering
that real multi-chip fused training/serving depends on — and checks parity
against the automatic (no-shard_map) path.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from studiosr_tpu.models import SwinIR
    from studiosr_tpu.parallel import get_mesh, make_train_step, prepare_state, shard_batch
    from studiosr_tpu.utils.helpers import enable_compilation_cache
    from studiosr_tpu.utils.losses import l1_loss

    enable_compilation_cache()
    mesh = get_mesh(jax.devices()[:1])

    # --- fused training step under shard_map (compiled Pallas backward) ---
    # REAL init, not fast_init: zero params make the forward a constant and
    # zero the kernels' gradient contributions, so parity would be vacuous
    # (a shard_map'd kernel computing garbage would still "pass").
    # drop_path_rate=0: the manual step folds the device index into the rng
    # (train_step.py) so stochastic draws legitimately differ from the
    # automatic path's — deterministic steps are the comparable ones
    # (measured on-chip: with DropPath active, loss 0.54821 vs 0.55017).
    model = SwinIR.build(
        scale=2, embed_dim=16, depths=[2], num_heads=[2], window_size=8, drop_path_rate=0.0
    )
    fused_module = model.module.clone(fused_train=True)
    tx = optax.sgd(1e-2)
    rng = np.random.default_rng(0)
    lq = jnp.asarray(rng.random((4, 16, 16, 3), np.float32))
    gt = jnp.asarray(rng.random((4, 32, 32, 3), np.float32))
    key = jax.random.PRNGKey(0)

    results = []
    for manual in (False, True):
        state = prepare_state(model.variables, tx, mesh)
        step = make_train_step(fused_module, tx, l1_loss, bfloat16=True, mesh=mesh, donate=False, manual=manual)
        b = shard_batch((lq, gt), mesh)
        s2, loss = step(state, b[0], b[1], key)
        results.append((float(loss), jax.device_get(s2.params)))
        print(f"train manual={manual}: loss={results[-1][0]:.6f}", flush=True)
    (l_a, p_a), (l_m, p_m) = results
    assert abs(l_a - l_m) < 1e-5, (l_a, l_m)
    for a, b in zip(jax.tree_util.tree_leaves(p_a), jax.tree_util.tree_leaves(p_m)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
    print("train parity OK (compiled Pallas VJPs under shard_map)", flush=True)

    # --- fused serving under shard_map (compiled Pallas forward kernels) ---
    model.enable_fused(True)
    img8 = rng.integers(0, 256, (1, 24, 24, 3), dtype=np.uint8)
    auto = np.asarray(model.forward_uint8(jnp.asarray(img8)))
    manual_out = np.asarray(model.manual_forward_uint8(jnp.asarray(img8), mesh))
    np.testing.assert_array_equal(auto, manual_out)
    print("serving parity OK (manual_forward_uint8 == forward_uint8 on-chip)", flush=True)

    # --- pod-shaped on-device eval under shard_map (round 5): the compiled
    # fused forward + metric chain through the mesh route must match the
    # single-device batch eval and the per-image evaluate_uint8 on chip ---
    gts8 = rng.integers(0, 256, (2, 48, 48, 3), dtype=np.uint8)
    lqs8 = gts8[:, ::2, ::2]
    p_mesh, s_mesh = model.evaluate_uint8_batch(lqs8, gts8, crop_border=2, mesh=mesh)
    p_one, s_one = model.evaluate_uint8_batch(lqs8, gts8, crop_border=2)
    np.testing.assert_allclose(p_mesh, p_one, atol=1e-5)
    np.testing.assert_allclose(s_mesh, s_one, atol=1e-6)
    per = [model.evaluate_uint8(lqs8[i], gts8[i], crop_border=2) for i in range(2)]
    np.testing.assert_allclose(p_one, [p for p, _ in per], atol=1e-4)
    print("eval parity OK (mesh evaluate_uint8_batch == single-device == per-image on-chip)", flush=True)


if __name__ == "__main__":
    main()
