"""A/B: host-protocol evaluation vs chip-resident evaluate_uint8 on the relay.

Host protocol (reference ``evaluator.py:53-79``): fetch the full SR image,
score PSNR/SSIM with numpy on host. On-device: SR + metrics in ONE jitted
program, two scalars fetched. The delta is the HR D2H (~20 MB/s through the
relay) plus the host-side gaussian SSIM.

Run: python scripts/exp_eval_ab.py [--images 5] [--size 512]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from studiosr_tpu.utils.helpers import enable_compilation_cache


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=5)
    ap.add_argument("--size", type=int, default=512, help="LR side (HR = 2x)")
    args = ap.parse_args()

    enable_compilation_cache()

    from studiosr_tpu.models import ESPCN
    from studiosr_tpu.utils.metrics import compute_psnr, compute_ssim

    model = ESPCN.build(scale=2)
    rng = np.random.default_rng(0)
    pairs = [
        (
            rng.integers(0, 256, (args.size, args.size, 3), dtype=np.uint8),
            rng.integers(0, 256, (args.size * 2, args.size * 2, 3), dtype=np.uint8),
        )
        for _ in range(args.images)
    ]

    # Warm both programs (compile + cache).
    lr0, hr0 = pairs[0]
    _ = model.inference(lr0)
    _ = model.evaluate_uint8(lr0, hr0, crop_border=2, y_only=True)

    t0 = time.perf_counter()
    host = []
    for lr, hr in pairs:
        sr = model.inference(lr)
        host.append(
            (
                compute_psnr(sr, hr, crop_border=2, y_only=True),
                compute_ssim(sr, hr, crop_border=2, y_only=True),
            )
        )
    t_host = (time.perf_counter() - t0) / len(pairs)

    t0 = time.perf_counter()
    dev = []
    for lr, hr in pairs:
        dev.append(model.evaluate_uint8(lr, hr, crop_border=2, y_only=True))
    t_dev = (time.perf_counter() - t0) / len(pairs)

    for (hp, hs), (dp, ds) in zip(host, dev):
        assert abs(hp - dp) < 1e-3 and abs(hs - ds) < 1e-3, (hp, dp, hs, ds)
    print(f"images: {len(pairs)}  LR {args.size}^2 -> HR {args.size*2}^2")
    print(f"host protocol : {t_host*1000:8.1f} ms/image (SR fetch {pairs[0][1].nbytes/1e6:.1f} MB + numpy metrics)")
    print(f"on-device     : {t_dev*1000:8.1f} ms/image (two scalars fetched)")
    print(f"speedup       : {t_host/t_dev:.2f}x")


if __name__ == "__main__":
    main()
