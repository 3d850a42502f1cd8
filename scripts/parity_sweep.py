"""THE networked parity runbook, executable (round-4 VERDICT item 3).

    python scripts/parity_sweep.py                     # all 6 zoo models, x4
    python scripts/parity_sweep.py --scales 2 3 4      # full matrix
    python scripts/parity_sweep.py --models swinir hat --no-tiled

Produces the pretrained-PSNR delta table against the reference's published
benchmark (``/root/reference/docs/benchmark.md:5-48``, embedded below) with
the compile storm bounded for the remote-TPU relay (30 s-15 min per unique
image shape):

  phase 0  egress probe (clear failure if offline) + persistent XLA cache;
  phase 1  EXACT whole-image protocol on Set5 + Set14 only (19 images,
           the smallest shapes) — these rows are the 0.01 dB acceptance;
  phase 2  tile-vs-exact calibration on Set5: the same model through
           ``inference_tiled`` — measures the tiling deviation bound;
  phase 3  BSD100 / Urban100 / Manga109 via tiled inference (ONE compile
           per tile shape for the whole dataset) — reported with the
           phase-2 bound as the protocol-deviation error bar.

Acceptance: |ours - published| <= 0.010 dB on every EXACT row (phase 1).
Tiled rows are evidence, not acceptance — their deviation bound comes from
phase 2 and is printed alongside.

Run order is cheapest-first so a failure surfaces before the long sets;
everything is resumable because results append to ``--out`` (json lines)
and finished (model, scale, dataset) triples are skipped on re-run.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Published Y-PSNR (reference docs/benchmark.md:5-48). rows: model -> scale
# -> dataset -> (plain, ensemble).
PUBLISHED = {
    "vdsr": {
        4: {"Set5": (31.860, 31.950), "Set14": (28.424, 28.491), "BSD100": (27.431, 27.471),
            "Urban100": (25.729, 25.809), "Manga109": (29.973, 30.182)},
        3: {"Set5": (34.124, 34.227), "Set14": (30.155, 30.217), "BSD100": (28.990, 29.029),
            "Urban100": (27.806, 27.896), "Manga109": (33.109, 33.353)},
        2: {"Set5": (37.819, 37.891), "Set14": (33.447, 33.528), "BSD100": (32.102, 32.142),
            "Urban100": (31.725, 31.836), "Manga109": (38.308, 38.544)},
    },
    "edsr": {
        4: {"Set5": (32.640, 32.715), "Set14": (28.913, 28.994), "BSD100": (27.785, 27.845),
            "Urban100": (26.801, 26.989), "Manga109": (31.318, 31.637)},
        3: {"Set5": (34.733, 34.796), "Set14": (30.633, 30.752), "BSD100": (29.315, 29.369),
            "Urban100": (29.015, 29.206), "Manga109": (34.491, 34.754)},
        2: {"Set5": (38.177, 38.217), "Set14": (34.139, 34.278), "BSD100": (32.396, 32.436),
            "Urban100": (33.168, 33.331), "Manga109": (39.407, 39.583)},
    },
    "rcan": {
        4: {"Set5": (32.602, 32.702), "Set14": (28.825, 28.940), "BSD100": (27.739, 27.821),
            "Urban100": (26.736, 27.020), "Manga109": (31.127, 31.563)},
        3: {"Set5": (34.707, 34.803), "Set14": (30.600, 30.703), "BSD100": (29.297, 29.362),
            "Urban100": (29.005, 29.229), "Manga109": (34.340, 34.658)},
        2: {"Set5": (38.167, 38.222), "Set14": (34.080, 34.155), "BSD100": (32.376, 32.419),
            "Urban100": (33.160, 33.388), "Manga109": (39.310, 39.474)},
    },
    "han": {
        4: {"Set5": (32.567, 32.689), "Set14": (28.864, 28.940), "BSD100": (27.771, 27.820),
            "Urban100": (26.767, 26.935), "Manga109": (31.364, 31.687)},
        3: {"Set5": (34.707, 34.802), "Set14": (30.610, 30.708), "BSD100": (29.299, 29.367),
            "Urban100": (29.020, 29.240), "Manga109": (34.368, 34.676)},
        2: {"Set5": (38.153, 38.210), "Set14": (34.092, 34.164), "BSD100": (32.370, 32.417),
            "Urban100": (33.152, 33.383), "Manga109": (39.307, 39.479)},
    },
    "swinir": {
        4: {"Set5": (32.894, 32.899), "Set14": (29.066, 29.117), "BSD100": (27.912, 27.942),
            "Urban100": (27.448, 27.564), "Manga109": (31.947, 32.147)},
        3: {"Set5": (34.890, 34.971), "Set14": (30.905, 30.960), "BSD100": (29.457, 29.479),
            "Urban100": (29.755, 29.887), "Manga109": (35.029, 35.166)},
        2: {"Set5": (38.292, 38.366), "Set14": (34.371, 34.525), "BSD100": (32.515, 32.542),
            "Urban100": (33.788, 33.936), "Manga109": (39.773, 39.861)},
    },
    "hat": {
        4: {"Set5": (32.960, 33.075), "Set14": (29.206, 29.253), "BSD100": (27.974, 28.015),
            "Urban100": (27.953, 28.087), "Manga109": (32.409, 32.600)},
        3: {"Set5": (34.990, 35.070), "Set14": (31.042, 31.092), "BSD100": (29.522, 29.550),
            "Urban100": (30.227, 30.326), "Manga109": (35.444, 35.571)},
        2: {"Set5": (38.471, 38.523), "Set14": (34.798, 34.765), "BSD100": (32.590, 32.624),
            "Urban100": (34.401, 34.525), "Manga109": (40.102, 40.196)},
    },
}

EXACT_SETS = ["Set5", "Set14"]
TILED_SETS = ["BSD100", "Urban100", "Manga109"]
ACCEPT_DB = 0.010


def probe_egress() -> bool:
    import requests

    for url in ("https://drive.google.com", "https://cv.snu.ac.kr"):
        try:
            requests.head(url, timeout=10)
            return True
        except Exception:
            continue
    return False


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--models", nargs="+", default=list(PUBLISHED))
    parser.add_argument("--scales", nargs="+", type=int, default=[4])
    parser.add_argument("--tile", type=int, default=96, help="LR tile for phase 2/3")
    parser.add_argument("--tile-overlap", type=int, default=16)
    parser.add_argument("--no-tiled", action="store_true", help="phases 1 only (exact acceptance)")
    parser.add_argument("--ensemble", action="store_true",
                        help="also run the 8-way self-ensemble '+' rows (exact sets; 8x the compute)")
    parser.add_argument("--out", default="parity_results.jsonl")
    args = parser.parse_args()

    # Validate up front: a bad model/scale must not surface as a KeyError
    # AFTER an hours-long eval has already run.
    bad = [m for m in args.models if m not in PUBLISHED]
    if bad:
        sys.exit(f"unknown model(s) {bad}; published tables cover {sorted(PUBLISHED)}")
    for name in args.models:
        missing = [s for s in args.scales if s not in PUBLISHED[name]]
        if missing:
            sys.exit(f"{name}: no published numbers for scale(s) {missing} "
                     f"(have {sorted(PUBLISHED[name])})")

    if not probe_egress():
        print("NO EGRESS: the parity sweep needs the pretrained zoo + benchmark "
              "datasets. Re-run when the environment has network access.")
        sys.exit(2)

    from studiosr_tpu.engine import Evaluator
    from studiosr_tpu.utils.helpers import enable_compilation_cache
    from studiosr_tpu.zoo.registry import get_model_class

    enable_compilation_cache()

    # "tiled" rows are keyed by their tile parameters too: resuming with a
    # different --tile must re-measure, not silently relabel cached rows.
    def _mode_key(mode):
        return f"tiled[{args.tile}+{args.tile_overlap}]" if mode == "tiled" else mode

    done = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            for line in f:
                r = json.loads(line)
                done[(r["model"], r["scale"], r["dataset"], r["mode"])] = r

    def record(**r):
        done[(r["model"], r["scale"], r["dataset"], r["mode"])] = r
        with open(args.out, "a") as f:
            f.write(json.dumps(r) + "\n")
        return r

    def run_eval(model, name, scale, dataset, mode):
        key = (name, scale, dataset, _mode_key(mode))
        if key in done:
            return done[key]
        ev = Evaluator(dataset, scale)
        if mode == "tiled":
            infer = lambda img: model.inference_tiled(
                img, tile=args.tile, tile_overlap=args.tile_overlap)
            psnr, ssim = ev.run(infer)
        elif mode == "ensemble":  # the published '+' rows (8-way TTA)
            psnr, ssim = ev.run(model.inference_with_self_ensemble)
        else:
            psnr, ssim = ev.run(model)
        return record(model=name, scale=scale, dataset=dataset, mode=_mode_key(mode),
                      psnr=psnr, ssim=ssim)

    failures, rows = [], []
    for scale in args.scales:
        for name in args.models:
            model = get_model_class(name).from_pretrained(scale=scale)
            # phase 1: exact acceptance on the small sets
            for dataset in EXACT_SETS:
                r = run_eval(model, name, scale, dataset, "exact")
                want = PUBLISHED[name][scale][dataset][0]
                delta = r["psnr"] - want
                rows.append((name, scale, dataset, "exact", r["psnr"], want, delta, None))
                status = "OK" if abs(delta) <= ACCEPT_DB else "FAIL"
                if status == "FAIL":
                    failures.append((name, scale, dataset, delta))
                print(f"[exact] {name} x{scale} {dataset}: {r['psnr']:.3f} "
                      f"(published {want:.3f}, delta {delta:+.3f}) {status}", flush=True)
            if args.ensemble:
                # the '+' rows: exact protocol, 8-way TTA, same acceptance
                for dataset in EXACT_SETS:
                    r = run_eval(model, name, scale, dataset, "ensemble")
                    want = PUBLISHED[name][scale][dataset][1]
                    delta = r["psnr"] - want
                    rows.append((name + "+", scale, dataset, "ensemble", r["psnr"], want, delta, None))
                    status = "OK" if abs(delta) <= ACCEPT_DB else "FAIL"
                    if status == "FAIL":
                        failures.append((name + "+", scale, dataset, delta))
                    print(f"[ensemble] {name}+ x{scale} {dataset}: {r['psnr']:.3f} "
                          f"(published {want:.3f}, delta {delta:+.3f}) {status}", flush=True)
            if args.no_tiled:
                continue
            # phase 2: tile-vs-exact calibration on Set5
            r_t = run_eval(model, name, scale, "Set5", "tiled")
            r_e = done[(name, scale, "Set5", "exact")]
            bound = abs(r_t["psnr"] - r_e["psnr"])
            print(f"[tile-bound] {name} x{scale}: |tiled - exact| on Set5 = "
                  f"{bound:.3f} dB (tile {args.tile}+{args.tile_overlap})", flush=True)
            # phase 3: big sets, tiled, reported with the bound
            for dataset in TILED_SETS:
                r = run_eval(model, name, scale, dataset, "tiled")
                want = PUBLISHED[name][scale][dataset][0]
                delta = r["psnr"] - want
                rows.append((name, scale, dataset, "tiled", r["psnr"], want, delta, bound))
                print(f"[tiled] {name} x{scale} {dataset}: {r['psnr']:.3f} "
                      f"(published {want:.3f}, delta {delta:+.3f} ± {bound:.3f} tile-bound)",
                      flush=True)

    print("\n| Method | Scale | Dataset | Protocol | Ours | Published | Delta | Tile bound |")
    print("|---|---|---|---|---|---|---|---|")
    for name, scale, dataset, mode, psnr, want, delta, bound in rows:
        b = f"±{bound:.3f}" if bound is not None else "—"
        print(f"| {name} | x{scale} | {dataset} | {mode} | {psnr:.3f} | {want:.3f} "
              f"| {delta:+.3f} | {b} |")
    if failures:
        print(f"\nEXACT-PROTOCOL FAILURES (>{ACCEPT_DB} dB): {failures}")
        sys.exit(1)
    print(f"\nall exact rows within {ACCEPT_DB} dB of the published tables")


if __name__ == "__main__":
    main()
