"""Regenerate the benchmark tables (docs/benchmark.md style).

Evaluates pretrained models over the standard benchmark datasets with the
reference protocol (Y-channel PSNR/SSIM, crop_border=scale) and prints the
markdown rows. Requires network access for the pretrained zoo + datasets on
first run.

Usage:
    python scripts/run_benchmark.py --models edsr swinir --scales 4 --ensemble

Remote-TPU note: whole-image inference compiles once per unique image shape
(30s-15min each through the relay; the persistent compilation cache makes
re-runs fast). ``--tile N`` instead runs tiled inference — ONE compile per
tile shape for a whole dataset — at the cost of a small deviation from the
reference protocol (overlap-discard tiling truncates cross-window context
at tile borders; use generous ``--tile-overlap`` and compare against the
exact whole-image mode on one dataset before trusting parity deltas).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse


def main() -> None:
    from studiosr_tpu.engine import Evaluator
    from studiosr_tpu.zoo.registry import get_model_class

    parser = argparse.ArgumentParser()
    parser.add_argument("--models", nargs="+", default=["edsr", "rcan", "swinir", "hat"])
    parser.add_argument("--scales", nargs="+", type=int, default=[4])
    parser.add_argument(
        "--datasets", nargs="+", default=["Set5", "Set14", "BSD100", "Urban100", "Manga109"]
    )
    parser.add_argument("--ensemble", action="store_true", help="also evaluate the 8-way self-ensemble (+)")
    parser.add_argument("--bf16", action="store_true", help="serve in bfloat16")
    parser.add_argument("--tile", type=int, default=0,
                        help="tiled inference with this LR tile size (0 = exact whole-image protocol)")
    parser.add_argument("--tile-overlap", type=int, default=16, help="tile halo in LR pixels")
    args = parser.parse_args()

    header = "| Method | Scale | " + " | ".join(args.datasets) + " |"
    sep = "|---" * (len(args.datasets) + 2) + "|"
    print(header)
    print(sep)

    for scale in args.scales:
        for name in args.models:
            model = get_model_class(name).from_pretrained(scale=scale)
            if args.bf16:
                model.half()
            infer = model.inference
            if args.tile:
                infer = lambda img, m=model: m.inference_tiled(
                    img, tile=args.tile, tile_overlap=args.tile_overlap
                )
            for label, func in [(name.upper(), infer)] + (
                [(name.upper() + "+", model.inference_with_self_ensemble)] if args.ensemble else []
            ):
                psnrs = []
                for dataset in args.datasets:
                    psnr, _ = Evaluator(dataset, scale).run(func, logging=True)
                    psnrs.append(psnr)
                print(f"| {label} | x{scale} | " + " | ".join(f"{p:.3f}" for p in psnrs) + " |")


if __name__ == "__main__":
    main()
