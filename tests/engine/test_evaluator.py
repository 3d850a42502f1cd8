"""Evaluator tests on a synthetic on-disk benchmark (no downloads)."""

import os

import numpy as np
import pytest

from studiosr_tpu.engine import Evaluator, Evaluator2
from studiosr_tpu.utils import imwrite


def _make_benchmark(root, layout, scale=2, n=3):
    rng = np.random.default_rng(0)
    if layout == "v1":
        gt_dir = os.path.join(root, "GTmod12")
        lq_dir = os.path.join(root, f"LRbicx{scale}")
    else:
        gt_dir = os.path.join(root, "HR")
        lq_dir = os.path.join(root, "LR_bicubic", f"X{scale}")
    os.makedirs(gt_dir, exist_ok=True)
    os.makedirs(lq_dir, exist_ok=True)
    for i in range(n):
        gt = rng.integers(0, 256, (24, 36, 3), dtype=np.uint8)
        lq = gt.reshape(12, 2, 18, 2, 3).mean(axis=(1, 3)).astype(np.uint8)
        imwrite(os.path.join(gt_dir, f"img_{i:02d}.png"), gt)
        imwrite(os.path.join(lq_dir, f"img_{i:02d}.png"), lq)


def _nearest_sr(scale):
    def func(lq):
        return np.repeat(np.repeat(lq, scale, axis=0), scale, axis=1)

    return func


def test_evaluator_v1_layout(tmp_path):
    root = str(tmp_path / "FakeSet")
    _make_benchmark(root, "v1", scale=2)
    ev = Evaluator.__new__(Evaluator)
    ev.dataset, ev.scale = "FakeSet", 2
    from studiosr_tpu.data import PairedImageDataset

    ev.testset = PairedImageDataset(os.path.join(root, "GTmod12"), os.path.join(root, "LRbicx2"))
    psnr, ssim = ev.run(_nearest_sr(2))
    assert 10 < psnr < 50
    assert 0 < ssim <= 1


def test_evaluator2_layout_and_on_device_metrics(tmp_path):
    root = str(tmp_path / "FakeSet2")
    _make_benchmark(root, "v2", scale=2)
    ev = Evaluator2.__new__(Evaluator2)
    ev.dataset, ev.scale = "FakeSet2", 2
    from studiosr_tpu.data import PairedImageDataset

    ev.testset = PairedImageDataset(os.path.join(root, "HR"), os.path.join(root, "LR_bicubic", "X2"))
    p1, s1 = ev.run(_nearest_sr(2))
    p2, s2 = ev.run(_nearest_sr(2), on_device=True)
    assert abs(p1 - p2) < 1e-3
    assert abs(s1 - s2) < 1e-4


def test_benchmark_sweep_table(tmp_path, monkeypatch, capsys):
    """Evaluator.benchmark markdown sweep over two synthetic datasets."""
    for name in ["FakeA", "FakeB"]:
        _make_benchmark(str(tmp_path / name), "v1", scale=2, n=2)
    monkeypatch.setattr(Evaluator, "download_dataset", classmethod(lambda cls, root, dataset: str(tmp_path / dataset)))

    def make_eval(dataset, scale):
        ev = Evaluator.__new__(Evaluator)
        ev.dataset, ev.scale = dataset, scale
        from studiosr_tpu.data import PairedImageDataset

        root = str(tmp_path / dataset)
        ev.testset = PairedImageDataset(os.path.join(root, "GTmod12"), os.path.join(root, "LRbicx2"))
        return ev

    import studiosr_tpu.engine.evaluator as ev_mod

    monkeypatch.setattr(ev_mod, "Evaluator", make_eval)
    psnrs, ssims = Evaluator.benchmark(_nearest_sr(2), scale=2, datasets=["FakeA", "FakeB"])
    assert len(psnrs) == 2 and len(ssims) == 2
    out = capsys.readouterr().out
    assert "| Metric |" in out and "FakeA" in out and "FakeB" in out


def test_evaluator_with_model(tmp_path):
    from studiosr_tpu.models import EDSR

    root = str(tmp_path / "FakeSet")
    _make_benchmark(root, "v1", scale=2, n=2)
    ev = Evaluator.__new__(Evaluator)
    ev.dataset, ev.scale = "FakeSet", 2
    from studiosr_tpu.data import PairedImageDataset

    ev.testset = PairedImageDataset(os.path.join(root, "GTmod12"), os.path.join(root, "LRbicx2"))
    model = EDSR.build(scale=2, n_feats=8, n_resblocks=1)
    psnr, ssim = ev.run(model.inference)
    assert np.isfinite(psnr)
