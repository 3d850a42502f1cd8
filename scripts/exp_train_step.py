"""Training-step throughput: fused custom-VJP blocks vs plain autodiff.

    python scripts/exp_train_step.py --fused
    python scripts/exp_train_step.py            # plain autodiff + remat

Driver config #5 shape: SwinIR x4, batch 32, 64px crops, bf16 autocast.
Times a Python loop of jitted steps (step >> RPC overhead); fetches the loss
only at the end.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--fused", action="store_true")
    parser.add_argument(
        "--model",
        default="swinir",
        choices=[
            "swinir", "swinfir", "hat", "edsr", "rcan", "han", "maxsr",
            "imdn", "vdsr", "srcnn", "espcn", "srresnet",
        ],
    )
    parser.add_argument("--fwd-only", action="store_true", help="time the loss forward alone")
    parser.add_argument(
        "--scan", action="store_true",
        help="chain all steps in ONE jit via lax.scan (pure device time; no per-step dispatch RPC)",
    )
    parser.add_argument("--batch", type=int, default=32)
    parser.add_argument("--crop", type=int, default=64)
    parser.add_argument("--steps", type=int, default=10)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from studiosr_tpu import models as M
    from studiosr_tpu.parallel import build_optimizer, get_mesh, make_train_step, prepare_state, shard_batch
    from studiosr_tpu.utils.helpers import enable_compilation_cache
    from studiosr_tpu.utils.losses import l1_loss

    enable_compilation_cache()

    cls = {
        "swinir": M.SwinIR, "swinfir": M.SwinFIR, "hat": M.HAT, "edsr": M.EDSR,
        "rcan": M.RCAN, "han": M.HAN, "maxsr": M.MaxSR, "imdn": M.IMDN,
        "vdsr": M.VDSR, "srcnn": M.SRCNN, "espcn": M.ESPCN, "srresnet": M.SRResNet,
    }[args.model]
    try:
        model = cls.build(scale=4, fast_init=True)
    except TypeError:  # small conv models init fast anyway and lack the kwarg
        model = cls.build(scale=4)
    if args.fused:
        if not hasattr(type(model.module), "fused_train"):
            raise SystemExit(f"{args.model} has no fused_train path")
        module = model.module.clone(fused_train=True)
    else:
        module = model.module
    mesh = get_mesh()
    tx = build_optimizer()
    state = prepare_state(model.variables, tx, mesh)
    step_fn = make_train_step(module, tx, l1_loss, bfloat16=True, mesh=mesh, chain=args.steps if args.scan else 0)
    if args.fwd_only:
        import jax.numpy as jnp

        def fwd(params, lq, gt, rng):
            p16 = jax.tree_util.tree_map(lambda t: t.astype(jnp.bfloat16), params)
            out = module.apply({"params": p16}, lq.astype(jnp.bfloat16), train=True, rngs={"dropout": rng})
            return l1_loss(out.astype(jnp.float32), gt)

        fwd_j = jax.jit(fwd)

    rng = np.random.default_rng(0)
    lq = rng.random((args.batch, args.crop, args.crop, 3), np.float32)
    gt = rng.random((args.batch, args.crop * 4, args.crop * 4, 3), np.float32)
    lq, gt = shard_batch((jnp.asarray(lq), jnp.asarray(gt)), mesh)
    key = jax.random.PRNGKey(0)

    t0 = time.perf_counter()
    if args.fwd_only:
        float(fwd_j(state.params, lq, gt, key))
    else:
        state, loss = step_fn(state, lq, gt, key)
        float(loss)
    print(f"compile+first: {time.perf_counter() - t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    if args.fwd_only:
        for i in range(args.steps):
            l = fwd_j(state.params, lq, gt, jax.random.fold_in(key, i))
        final = float(l)
    elif args.scan:  # one dispatch+fetch for the whole chain
        state, loss = step_fn(state, lq, gt, jax.random.fold_in(key, 1))
        final = float(loss)
    else:
        for i in range(args.steps):
            state, loss = step_fn(state, lq, gt, jax.random.fold_in(key, i))
        final = float(loss)
    dt = (time.perf_counter() - t0) / args.steps
    tag = (
        args.model + " " + ("fwd-only " if args.fwd_only else "") + ("scan " if args.scan else "")
        + ("fused" if args.fused else "plain")
    )
    print(f"{tag}: {dt:.3f} s/step = {args.batch / dt:.1f} img/s  (loss {final:.4f})")


if __name__ == "__main__":
    main()
