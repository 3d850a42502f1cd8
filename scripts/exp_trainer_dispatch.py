"""End-to-end Trainer throughput vs steps_per_dispatch.

    python scripts/exp_trainer_dispatch.py --model swinir --fused --k 1
    python scripts/exp_trainer_dispatch.py --model swinir --fused --k 8

Runs the REAL Trainer loop (data handler, shard_batch, logging cadence) on
synthetic pairs and reports steady-state img/s — the end-to-end number that
per-step dispatch RPC overhead actually moves (exp_train_step.py --scan
isolates the pure device step time instead).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class SyntheticPairs:
    def __init__(self, n: int, size: int, scale: int):
        import numpy as np

        rng = np.random.default_rng(0)
        self.gt = rng.random((n, size * scale, size * scale, 3), dtype=np.float32)
        self.lq = self.gt.reshape(n, size, scale, size, scale, 3).mean(axis=(2, 4)).astype("float32")

    def __len__(self):
        return len(self.gt)

    def __getitem__(self, idx):
        return self.lq[idx], self.gt[idx]


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="swinir")
    p.add_argument("--fused", action="store_true")
    p.add_argument("--k", type=int, default=1, help="steps_per_dispatch")
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--crop", type=int, default=64)
    p.add_argument("--iters", type=int, default=48)
    p.add_argument("--warmup", type=int, default=16, help="iterations excluded from the rate")
    args = p.parse_args()

    import tempfile

    from studiosr_tpu.engine import Trainer
    from studiosr_tpu.utils.helpers import enable_compilation_cache
    from studiosr_tpu.zoo.registry import get_model_class

    enable_compilation_cache()

    cls = get_model_class(args.model)
    try:
        model = cls.build(scale=4, fast_init=True)
    except TypeError:
        model = cls.build(scale=4)

    dataset = SyntheticPairs(args.batch * 4, args.crop, 4)
    trainer = Trainer(
        model,
        dataset,
        None,
        batch_size=args.batch,
        num_workers=2,
        max_iters=args.iters,
        eval_interval=10**9,
        ckpt_path=tempfile.mkdtemp(),
        log_interval=10**9,
        fused_train=args.fused or None,
        steps_per_dispatch=args.k,
    )

    # Steady-state rate from get_batch timestamps (one call per iteration,
    # always immediately before its step's dispatch): the span from call
    # ``warmup`` to the final call covers iters - warmup - 1 full iteration
    # periods including all host-side work — compile lives entirely before
    # the warmup cutoff.
    from studiosr_tpu.data import DataHandler

    stamps = []
    orig_get = DataHandler.get_batch

    def timed_get(self):
        stamps.append(time.perf_counter())
        return orig_get(self)

    DataHandler.get_batch = timed_get
    t0 = time.perf_counter()
    try:
        trainer.run()
    finally:
        DataHandler.get_batch = orig_get
    total = time.perf_counter() - t0

    # For k > 1 the k get_batch calls of a chunk cluster before its single
    # dispatch, so only chunk-aligned first-call-to-first-call spans measure
    # whole iteration periods.
    start = ((args.warmup + args.k - 1) // args.k) * args.k
    last_chunk_start = ((len(stamps) - 1) // args.k) * args.k
    n_steps = last_chunk_start - start
    assert n_steps >= 8, f"too few iterations past warmup ({n_steps})"
    dt = (stamps[last_chunk_start] - stamps[start]) / n_steps
    print(
        f"{args.model} k={args.k} {'fused' if trainer.fused_train else 'plain'}: "
        f"run {total:.1f}s (incl compile); steady {dt:.3f} s/step = {args.batch / dt:.1f} img/s",
        flush=True,
    )


if __name__ == "__main__":
    main()
