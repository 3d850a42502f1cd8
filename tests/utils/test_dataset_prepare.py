"""DIV2K/DF2K preparation flow with a synthetic on-disk corpus."""

import os

import numpy as np
import pytest


def _make_div2k_raw(root, n=2):
    import cv2

    base = os.path.join(root, "DIV2K")
    hr = os.path.join(base, "DIV2K_train_HR")
    os.makedirs(hr, exist_ok=True)
    rng = np.random.default_rng(0)
    for scale in (2, 3, 4):
        os.makedirs(os.path.join(base, f"DIV2K_train_LR_bicubic/X{scale}"), exist_ok=True)
    for i in range(n):
        img = rng.integers(0, 256, (520, 560, 3), dtype=np.uint8)
        cv2.imwrite(os.path.join(hr, f"{i:04d}.png"), img)
        for scale in (2, 3, 4):
            lr = img[:: scale, :: scale]
            cv2.imwrite(os.path.join(base, f"DIV2K_train_LR_bicubic/X{scale}", f"{i:04d}x{scale}.png"), lr)


def test_div2k_prepare_and_load(tmp_path):
    from studiosr_tpu.data import DIV2K

    root = str(tmp_path)
    _make_div2k_raw(root)
    ds = DIV2K(root, size=24, scale=2, transform=True, to_tensor=True)
    assert len(ds) > 0
    lq, gt = ds[0]
    assert lq.shape == (24, 24, 3)
    assert gt.shape == (48, 48, 3)
    assert lq.dtype == np.float32 and 0.0 <= lq.max() <= 1.0
    # Sub-image grids exist for all scales.
    sub = os.path.join(root, "DIV2K", "sub")
    assert os.path.isdir(os.path.join(sub, "DIV2K_train_HR"))
    for scale in (2, 3, 4):
        assert os.listdir(os.path.join(sub, f"DIV2K_train_LR_bicubic/X{scale}"))
