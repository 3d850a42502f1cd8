"""scripts/train.py smoke test — offline, with the dataset and evaluator
monkeypatched (the real corpus download is network-gated). Pins the
recipe-splat wiring (get_training_config -> Trainer) plus the ema/grad-accum
flag plumbing end-to-end through the script's main().
"""

import importlib.util
import os
import sys

import numpy as np
import pytest


def _load_train_module():
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts", "train.py")
    spec = importlib.util.spec_from_file_location("train_script", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class _SyntheticPairs:
    """Stands in for data.DIV2K: accepts its ctor signature, yields tensor
    pairs like transform=True/to_tensor=True would."""

    def __init__(self, data_dir, size=16, scale=2, transform=True, to_tensor=True, download=False):
        self.size, self.scale = size, scale
        self.rng = np.random.RandomState(0)

    def __len__(self):
        return 64

    def __getitem__(self, i):
        gt = self.rng.rand(self.size * self.scale, self.size * self.scale, 3).astype(np.float32)
        lq = gt.reshape(self.size, self.scale, self.size, self.scale, 3).mean(axis=(1, 3))
        return lq, gt


class _StubEvaluator:
    def __init__(self, dataset, scale=4, **kw):
        self.dataset, self.scale = dataset, scale
        self.calls = 0

    def run(self, func, *a, **kw):
        _StubEvaluator.last = self
        self.calls += 1
        sr = func((np.random.RandomState(1).rand(8, 8, 3) * 255).astype(np.uint8))
        assert sr.dtype == np.uint8 and sr.shape == (8 * self.scale, 8 * self.scale, 3)
        return 30.0 + self.calls, 0.9


def test_train_script_smoke(tmp_path, monkeypatch):
    mod = _load_train_module()
    import studiosr_tpu.data as data
    import studiosr_tpu.engine.trainer as trainer_mod

    monkeypatch.setattr(data, "DIV2K", _SyntheticPairs)
    monkeypatch.setattr(mod, "__name__", "train_script")
    import studiosr_tpu.engine as engine

    monkeypatch.setattr(engine, "Evaluator", _StubEvaluator)
    ckpt = tmp_path / "ckpt"
    monkeypatch.setattr(
        sys, "argv",
        ["train.py", "--model", "espcn", "--scale", "2", "--size", "8",
         "--max-iters", "2", "--batch-size", "8", "--eval-interval", "2",
         "--ckpt", str(ckpt), "--ema-decay", "0.9", "--grad-accum", "1"],
    )
    mod.main()
    files = sorted(os.listdir(ckpt))
    assert "params.json" in files and "train.log" in files
    assert any(f.endswith(".model.ckpt") for f in files)
    assert any(f.endswith(".ema.ckpt") for f in files)
    assert _StubEvaluator.last.calls >= 1
