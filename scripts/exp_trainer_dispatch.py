"""Training-loop throughput vs steps-per-dispatch (barrier-bounded).

    python scripts/exp_trainer_dispatch.py --model swinir --fused --k 1
    python scripts/exp_trainer_dispatch.py --model swinir --fused --k 8

Simulates the Trainer hot loop at dispatch granularity ``k``
(make_train_step chain_batches — what Trainer(steps_per_dispatch=k) runs)
with a loss fetch every ``--fetch-every`` iterations in BOTH modes (the
log-cadence barrier), timing whole fetch-to-fetch cycles. This avoids the
async-dispatch pitfall: a loop that never fetches only measures enqueue
rate, not device progress.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="swinir")
    p.add_argument("--fused", action="store_true")
    p.add_argument("--k", type=int, default=1, help="steps per dispatch")
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--crop", type=int, default=64)
    p.add_argument("--fetch-every", type=int, default=8, help="iterations per loss fetch (log cadence)")
    p.add_argument("--cycles", type=int, default=5, help="timed fetch cycles (plus one warmup)")
    p.add_argument("--uint8", action="store_true", help="upload uint8 batches (device-side normalize; 4x less H2D)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from studiosr_tpu.parallel import build_optimizer, get_mesh, make_train_step, prepare_state, shard_batch
    from studiosr_tpu.utils.helpers import enable_compilation_cache
    from studiosr_tpu.utils.losses import l1_loss
    from studiosr_tpu.zoo.registry import get_model_class

    enable_compilation_cache()
    k = args.k
    assert args.fetch_every % k == 0, "fetch cadence must be a multiple of k"

    cls = get_model_class(args.model)
    try:
        model = cls.build(scale=4, fast_init=True)
    except TypeError:
        model = cls.build(scale=4)
    module = model.module.clone(fused_train=True) if args.fused else model.module

    mesh = get_mesh()
    tx = build_optimizer()
    state = prepare_state(model.variables, tx, mesh)
    step_fn = make_train_step(
        module, tx, l1_loss, bfloat16=True, mesh=mesh, chain=k if k > 1 else 0, chain_batches=k > 1
    )

    # Host-side batches, like a real input pipeline: each dispatch pays the
    # genuine H2D upload. (Never build the stack from device arrays —
    # np.asarray on a fresh device array fetches it back at relay-D2H speed.)
    rng = np.random.default_rng(0)
    if args.uint8:
        lq = rng.integers(0, 256, (args.batch, args.crop, args.crop, 3), dtype=np.uint8)
        gt = rng.integers(0, 256, (args.batch, args.crop * 4, args.crop * 4, 3), dtype=np.uint8)
    else:
        lq = rng.random((args.batch, args.crop, args.crop, 3), np.float32)
        gt = rng.random((args.batch, args.crop * 4, args.crop * 4, 3), np.float32)
    key = jax.random.PRNGKey(0)
    it = 0

    def run_cycle():
        nonlocal state, it
        loss = None
        for _ in range(args.fetch_every // k):
            if k > 1:
                lqs = np.broadcast_to(lq, (k,) + lq.shape)
                gts = np.broadcast_to(gt, (k,) + gt.shape)
                rngs = jnp.stack([jax.random.fold_in(key, it + i) for i in range(k)])
                b = shard_batch((np.ascontiguousarray(lqs), np.ascontiguousarray(gts)), mesh, axis=1)
                state, losses = step_fn(state, b[0], b[1], rngs)
                loss = losses[-1]
            else:
                b = shard_batch((lq, gt), mesh)
                state, loss = step_fn(state, b[0], b[1], jax.random.fold_in(key, it))
            it += k
        return float(loss)  # barrier: the cycle is done only when its last loss is real

    t0 = time.perf_counter()
    run_cycle()
    print(f"compile+first cycle: {time.perf_counter() - t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    for _ in range(args.cycles):
        final = run_cycle()
    dt = (time.perf_counter() - t0) / (args.cycles * args.fetch_every)
    print(
        f"{args.model} k={k} {'fused' if args.fused else 'plain'}{' uint8' if args.uint8 else ''} "
        f"(fetch/{args.fetch_every}): "
        f"{dt:.3f} s/step = {args.batch / dt:.1f} img/s  (loss {final:.4f})",
        flush=True,
    )


if __name__ == "__main__":
    main()
