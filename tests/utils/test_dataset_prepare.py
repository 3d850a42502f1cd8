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


def test_extract_subimages_nested_atomic_and_tags(tmp_path):
    """Nested inputs flatten to single-component crop names (relative-path
    walks must not silently write nothing); interrupted runs leave only a
    .partial dir and re-run; only TRAILING scale tags are stripped."""
    import cv2

    from studiosr_tpu.data.dataset import extract_subimages

    raw = tmp_path / "raw" / "nested"
    raw.mkdir(parents=True)
    rng = np.random.default_rng(1)
    cv2.imwrite(str(raw / "tex2_scenex4.png"), rng.integers(0, 256, (40, 40, 3), dtype=np.uint8))
    out = str(tmp_path / "sub")

    extract_subimages(str(tmp_path / "raw"), out, crop_size=20, step=20)
    files = sorted(os.listdir(out))
    assert files and all(os.sep not in f for f in files)
    # 'x2' inside the stem survives; only the trailing 'x4' is stripped.
    assert all(f.startswith("nested_tex2_scene_") for f in files), files
    assert not os.path.exists(out + ".partial")

    # A stale .partial (interrupted run) is discarded and rebuilt.
    os.rename(out, out + ".partial")
    extract_subimages(str(tmp_path / "raw"), out, crop_size=20, step=20)
    assert sorted(os.listdir(out)) == files
    assert not os.path.exists(out + ".partial")


def test_extract_subimages_empty_input_raises(tmp_path):
    from studiosr_tpu.data.dataset import extract_subimages

    (tmp_path / "empty").mkdir()
    with pytest.raises(FileNotFoundError):
        extract_subimages(str(tmp_path / "empty"), str(tmp_path / "out"), 20, 20)
    assert not os.path.exists(str(tmp_path / "out"))


def test_extract_subimages_undersized_image_names_culprit(tmp_path):
    """An image smaller than crop_size must fail naming the file, not die
    with a bare IndexError from an empty crop range."""
    import cv2

    from studiosr_tpu.data.dataset import extract_subimages

    src = tmp_path / "src"
    src.mkdir()
    cv2.imwrite(str(src / "small.png"), np.zeros((12, 40, 3), np.uint8))
    with pytest.raises(ValueError, match="small.png.*smaller than"):
        extract_subimages(str(src), str(tmp_path / "out"), 20, 10)
    assert not os.path.exists(str(tmp_path / "out"))


def test_div2k_resumes_partial_prepare(tmp_path):
    """A prepare interrupted after some packs must rebuild only the missing
    ones on the next construction (the old top-level `sub` check skipped
    them forever)."""
    import shutil

    from studiosr_tpu.data import DIV2K

    root = str(tmp_path)
    _make_div2k_raw(root)
    DIV2K(root, size=24, scale=2)
    x3 = os.path.join(root, "DIV2K", "sub", "DIV2K_train_LR_bicubic", "X3")
    shutil.rmtree(x3)  # simulate an interruption that lost one pack
    DIV2K(root, size=24, scale=3)
    assert os.listdir(x3)


def test_model_registry_mapping():
    """MODEL_REGISTRY is exported as a mapping: dict-style membership and
    lookup must work (it was the bare registry *function*)."""
    from studiosr_tpu.zoo import registry

    assert "swinir" in registry.MODEL_REGISTRY
    assert registry.MODEL_REGISTRY["SwinIR"] is registry.get_model_class("swinir")
    assert len(registry.MODEL_REGISTRY) >= 12
