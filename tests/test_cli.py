"""CLI contract (``python -m studiosr_tpu``): flag plumbing, directory
walking, tiled / self-ensemble branches, and output naming — offline, with
``from_pretrained`` monkeypatched to a tiny locally-built model (the real
zoo download is network-gated). Reference CLI: ``studiosr/__main__.py``.
"""

import os
import sys

import numpy as np
import pytest

from studiosr_tpu.models import SwinIR
from studiosr_tpu.utils import imread, imwrite


@pytest.fixture()
def tiny_pretrained(monkeypatch):
    model = SwinIR.build(
        scale=2, embed_dim=16, depths=(2,), num_heads=(2,), window_size=8,
        mlp_ratio=2.0, upsampler="pixelshuffledirect", fast_init=True,
    )
    monkeypatch.setattr(SwinIR, "from_pretrained", classmethod(lambda cls, scale=4, **kw: model))
    return model


def _run_cli(monkeypatch, argv):
    from studiosr_tpu.__main__ import main

    monkeypatch.setattr(sys, "argv", ["studiosr_tpu"] + argv)
    main()


def _write_images(d, n=2, size=20):
    rng = np.random.RandomState(0)
    for i in range(n):
        imwrite(str(d / f"img{i}.png"), rng.randint(0, 255, (size, size + 4, 3), np.uint8))


def test_cli_single_image(tmp_path, monkeypatch, tiny_pretrained):
    _write_images(tmp_path, n=1)
    out = tmp_path / "out"
    _run_cli(monkeypatch, ["--image", str(tmp_path / "img0.png"), "--scale", "2",
                           "--model", "swinir", "--output", str(out)])
    produced = os.listdir(out)
    assert produced == ["img0.swinir_x2.png"]
    sr = imread(str(out / produced[0]))
    assert sr.shape == (40, 48, 3)


def test_cli_directory_and_self_ensemble(tmp_path, monkeypatch, tiny_pretrained):
    _write_images(tmp_path, n=2)
    out = tmp_path / "out"
    _run_cli(monkeypatch, ["--image", str(tmp_path), "--scale", "2", "--model", "swinir",
                           "--output", str(out), "--self-ensemble"])
    assert sorted(os.listdir(out)) == ["img0.swinir_x2.png", "img1.swinir_x2.png"]


def test_cli_rerun_with_nested_output_skips_own_outputs(tmp_path, monkeypatch, tiny_pretrained):
    """Re-running with the (default-style) output dir nested inside the input
    dir must skip the previous run's outputs instead of crashing on them —
    the reference CLI's basename walk breaks here (``helpers.py:99-106``)."""
    _write_images(tmp_path, n=2)
    out = tmp_path / "studiosr"
    argv = ["--image", str(tmp_path), "--scale", "2", "--model", "swinir", "--output", str(out)]
    _run_cli(monkeypatch, argv)
    _run_cli(monkeypatch, argv)  # second run: outputs exist under the input dir
    assert sorted(os.listdir(out)) == ["img0.swinir_x2.png", "img1.swinir_x2.png"]


def test_cli_tiled_matches_whole(tmp_path, monkeypatch, tiny_pretrained):
    _write_images(tmp_path, n=1, size=24)
    out_whole, out_tiled = tmp_path / "w", tmp_path / "t"
    img = str(tmp_path / "img0.png")
    _run_cli(monkeypatch, ["--image", img, "--scale", "2", "--model", "swinir",
                           "--output", str(out_whole)])
    _run_cli(monkeypatch, ["--image", img, "--scale", "2", "--model", "swinir",
                           "--output", str(out_tiled), "--tile", "16", "--tile-overlap", "4"])
    a = imread(str(out_whole / "img0.swinir_x2.png"))
    b = imread(str(out_tiled / "img0.swinir_x2.png"))
    assert a.shape == b.shape
    # uint8 rounding at tile seams: allow 1 LSB.
    assert int(np.max(np.abs(a.astype(int) - b.astype(int)))) <= 1


def test_cli_batched_matches_single(tmp_path, monkeypatch, tiny_pretrained):
    """--batch N groups same-shaped images into stacked dispatches; outputs
    must be pixel-identical to the per-image path (inference_batch ==
    inference: the same jitted uint8 program, batch on the grid)."""
    # Inputs in their own directory: outputs of one run nested under the
    # input dir ARE inputs to the next run (only the run's own --output is
    # excluded from the walk).
    src = tmp_path / "in"
    src.mkdir()
    _write_images(src, n=3)
    out1 = tmp_path / "out1"
    out2 = tmp_path / "out2"
    _run_cli(monkeypatch, ["--image", str(src), "--scale", "2", "--model", "swinir",
                           "--output", str(out1)])
    _run_cli(monkeypatch, ["--image", str(src), "--scale", "2", "--model", "swinir",
                           "--output", str(out2), "--batch", "2"])
    assert sorted(os.listdir(out1)) == sorted(os.listdir(out2))
    for name in os.listdir(out1):
        np.testing.assert_array_equal(imread(str(out1 / name)), imread(str(out2 / name)))


def test_cli_nested_duplicate_basenames_do_not_collide(tmp_path, monkeypatch, tiny_pretrained):
    """Two inputs sharing a basename in different subdirectories (common in
    per-scale dataset layouts) must produce two outputs — the old
    basename-only naming silently overwrote the first with the second."""
    rng = np.random.RandomState(1)
    for sub in ("a", "b"):
        (tmp_path / sub).mkdir()
        imwrite(str(tmp_path / sub / "0001.png"), rng.randint(0, 255, (16, 20, 3), np.uint8))
    out = tmp_path / "out"
    _run_cli(monkeypatch, ["--image", str(tmp_path), "--scale", "2", "--model", "swinir",
                           "--output", str(out)])
    # (the fixture model is zero-init, so only the naming is checkable here)
    assert sorted(os.listdir(out)) == ["a__0001.swinir_x2.png", "b__0001.swinir_x2.png"]


def test_cli_local_checkpoint_serving(tmp_path, monkeypatch):
    """--ckpt serves a locally-trained Trainer checkpoint directory (no
    network, no zoo): output equals the registry-loaded model's inference,
    and a scale mismatch fails with a clear argparse error."""
    fixtures = os.path.join(os.path.dirname(__file__), "fixtures", "quality")
    ckpt = os.path.join(fixtures, "ckpt")  # trained ESPCN x2
    if not os.path.exists(os.path.join(ckpt, "best.model.ckpt")):
        pytest.skip("quality fixture not generated")

    lr = imread(os.path.join(fixtures, "img0_lr.png"))
    src = tmp_path / "in"
    src.mkdir()
    imwrite(str(src / "img0.png"), lr)
    out_dir = tmp_path / "out"

    _run_cli(monkeypatch, [
        "--image", str(src / "img0.png"), "--scale", "2",
        "--model", "espcn", "--ckpt", ckpt, "--output", str(out_dir),
    ])
    outs = os.listdir(out_dir)
    assert outs == ["img0.espcn_x2.png"], outs

    from studiosr_tpu.zoo.registry import load_model

    want = load_model(ckpt, "espcn", tag="best").inference(lr)
    got = imread(str(out_dir / outs[0]))
    np.testing.assert_array_equal(got, want)

    with pytest.raises(SystemExit):  # argparse .error on scale mismatch
        _run_cli(monkeypatch, [
            "--image", str(src / "img0.png"), "--scale", "4",
            "--model", "espcn", "--ckpt", ckpt, "--output", str(out_dir),
        ])


def test_zoo_load_model_config_drift_fails_loudly(tmp_path):
    """load_model (the --ckpt route's loader) must fail LOUDLY when the
    checkpoint bytes restore wrong-shaped leaves — flax from_bytes only
    validates tree keys, so a hand-edited params.json (or ckpt files mixed
    between runs) would otherwise explode much later inside the jitted
    forward with an opaque XLA error (same contract as Trainer resume)."""
    import json
    import shutil

    fixtures = os.path.join(os.path.dirname(__file__), "fixtures", "quality")
    ckpt = os.path.join(fixtures, "ckpt")  # trained ESPCN x2, channels=64
    if not os.path.exists(os.path.join(ckpt, "best.model.ckpt")):
        pytest.skip("quality fixture not generated")

    drifted = tmp_path / "drifted"
    drifted.mkdir()
    shutil.copy(os.path.join(ckpt, "best.model.ckpt"), drifted / "best.model.ckpt")
    with open(os.path.join(ckpt, "params.json")) as f:
        config = json.load(f)
    config["channels"] = 32  # same tree paths, mismatched shapes
    with open(drifted / "params.json", "w") as f:
        json.dump(config, f)

    from studiosr_tpu.zoo.registry import load_model

    with pytest.raises(ValueError, match="shape mismatch"):
        load_model(str(drifted), "espcn", tag="best")
