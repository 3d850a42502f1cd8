"""CLI upscaler: ``python -m studiosr_tpu --image --scale --model --output``.

Same interface as the reference CLI (``studiosr/__main__.py:18-23``) with the
same model registry (vdsr/edsr/rcan/han/swinir/hat); adds ``--tile`` for the
tiled-patch pipeline and ``--self-ensemble`` for the 8-way TTA.
"""

from __future__ import annotations

import argparse
import os


def _walk_image_paths(root: str, skip_dir: str) -> list:
    """Sorted full paths of images under ``root``, excluding ``skip_dir``."""
    from studiosr_tpu.utils.helpers import get_image_extensions

    exts = set(get_image_extensions())
    skip = os.path.abspath(skip_dir)
    paths = []
    for r, _dirs, files in os.walk(root):
        ar = os.path.abspath(r)
        if ar == skip or ar.startswith(skip + os.sep):
            continue
        paths.extend(os.path.join(r, f) for f in files if os.path.splitext(f)[1].lower() in exts)
    return sorted(paths)


def main() -> None:
    from studiosr_tpu.models import EDSR, HAN, HAT, RCAN, VDSR, SwinIR
    from studiosr_tpu.utils import enable_compilation_cache, imread, imwrite

    # Persistent XLA cache: repeated CLI runs (and the many distinct image
    # shapes of a directory walk) skip the 30s+ accelerator compiles.
    enable_compilation_cache()

    models = dict(
        vdsr=VDSR,
        edsr=EDSR,
        rcan=RCAN,
        han=HAN,
        swinir=SwinIR,
        hat=HAT,
    )

    parser = argparse.ArgumentParser(description="StudioSR-TPU")
    parser.add_argument("--image", type=str, default="./", help="image or directory to be upscaled")
    parser.add_argument("--scale", type=int, default=4, help="upscaling factor -> [2, 3, 4]")
    parser.add_argument("--model", type=str, default="swinir", help=f"model name -> {list(models.keys())}")
    parser.add_argument("--output", type=str, default="./studiosr", help="output directory")
    parser.add_argument("--tile", type=int, default=0, help="tile size for tiled inference (0 = whole image)")
    parser.add_argument("--tile-overlap", type=int, default=16, help="tile halo in LR pixels")
    parser.add_argument("--self-ensemble", action="store_true", help="8-way rot/flip test-time ensemble")
    parser.add_argument(
        "--ckpt", type=str, default="",
        help="serve a locally-trained checkpoint directory (Trainer's "
             "{best,latest}.model.ckpt + params.json) instead of the "
             "pretrained zoo — works fully offline",
    )
    parser.add_argument("--ckpt-tag", type=str, default="best", help="checkpoint tag with --ckpt (best/latest)")
    parser.add_argument("--half", action="store_true", help="bf16 + fused Pallas serving path (throughput mode)")
    parser.add_argument(
        "--batch", type=int, default=1,
        help="batch same-shaped images through one dispatch (whole-image mode only)",
    )
    args = parser.parse_args()

    path = args.image
    # Full-path recursive walk, skipping anything under the output directory.
    # Deliberate divergence from the reference CLI (``__main__.py:30-33`` +
    # ``helpers.py:99-106``), whose basename walk breaks on nested inputs and
    # crashes on a second run with the default nested ``--output``.
    paths = [path] if os.path.isfile(path) else _walk_image_paths(path, skip_dir=args.output)
    root = path if os.path.isdir(path) else os.path.dirname(path)
    if args.ckpt:
        from studiosr_tpu.zoo.registry import load_model

        model = load_model(args.ckpt, args.model, tag=args.ckpt_tag)
        if model.scale != args.scale:
            parser.error(f"--scale {args.scale} but checkpoint is x{model.scale} ({args.ckpt})")
    else:
        model = models[args.model].from_pretrained(scale=args.scale)
    if args.half:
        model.half()
        if hasattr(model, "enable_fused"):
            model.enable_fused(True)

    os.makedirs(args.output, exist_ok=True)

    def save(file_path, out):
        # Root-relative name with separators flattened: two inputs that share
        # a basename in different subdirectories must not overwrite each
        # other's output (the recursive walk makes that layout common).
        rel = os.path.relpath(file_path, root) if root else os.path.basename(file_path)
        name = os.path.splitext(rel)[0].replace(os.sep, "__")
        save_path = os.path.join(args.output, f"{name}.{args.model}_x{args.scale}.png")
        imwrite(save_path, out)
        print(" -> ", save_path)

    if args.batch > 1 and not (args.tile or args.self_ensemble):
        # Group same-shaped images: each group rides stacked dispatches
        # (one compile per distinct shape, as with single images). Shapes are
        # probed first and pixels re-read per chunk, so memory stays O(batch)
        # instead of holding every decoded image at once.
        by_shape: dict = {}
        for file_name in paths:
            by_shape.setdefault(imread(file_name).shape, []).append(file_name)
        for shape, names in by_shape.items():
            for i in range(0, len(names), args.batch):
                chunk = names[i : i + args.batch]
                outs = model.inference_batch([imread(n) for n in chunk])
                for n, out in zip(chunk, outs):
                    save(n, out)
        return

    for file_name in paths:
        image = imread(file_name)
        if args.tile:
            from studiosr_tpu.parallel.tiled import tiled_inference

            out = tiled_inference(model, image, tile=args.tile, tile_overlap=args.tile_overlap)
        elif args.self_ensemble:
            out = model.inference_with_self_ensemble(image)
        else:
            out = model.inference(image)
        save(file_name, out)


if __name__ == "__main__":
    main()
