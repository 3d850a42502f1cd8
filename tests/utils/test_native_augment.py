"""Native C++ augmentation kernel vs the numpy transform pipeline."""

import random

import numpy as np
import pytest

from studiosr_tpu import native
from studiosr_tpu.data import transforms as T

pytestmark = pytest.mark.skipif(not native.native_available(), reason="no C++ toolchain")


def _numpy_path(lq, gt, size, scale, rng):
    pipeline = T.Compose(
        [T.RandomCrop(size, scale), T.RandomHorizontalFlip(), T.RandomVerticalFlip(), T.RandomRotation90()]
    )
    a, b = pipeline(lq, gt, rng=rng)
    return T.array_to_nhwc(a), T.array_to_nhwc(b)


@pytest.mark.parametrize("scale", [2, 3, 4])
@pytest.mark.parametrize("seed", range(8))
def test_native_matches_numpy_pipeline(seed, scale):
    rng_np = np.random.default_rng(seed)
    lq = rng_np.integers(0, 256, (24, 30, 3), dtype=np.uint8)
    gt = rng_np.integers(0, 256, (24 * scale, 30 * scale, 3), dtype=np.uint8)
    size = 12

    want = _numpy_path(lq, gt, size, scale, random.Random(seed))

    r = random.Random(seed)
    xs = r.randint(0, lq.shape[1] - size)
    ys = r.randint(0, lq.shape[0] - size)
    f1, f2, f3 = (r.random() < 0.5 for _ in range(3))
    got = native.paired_crop_augment(lq, gt, size, scale, xs, ys, f1, f2, f3)

    np.testing.assert_allclose(got[0], want[0], atol=1e-7)
    np.testing.assert_allclose(got[1], want[1], atol=1e-7)


def test_dataset_uses_native_consistently(tmp_path):
    """PairedImageDataset must produce identical samples whether the native
    kernel or the numpy pipeline runs (same rng)."""
    import os

    from studiosr_tpu.data import PairedImageDataset
    from studiosr_tpu.utils import imwrite

    gt_dir, lq_dir = str(tmp_path / "gt"), str(tmp_path / "lq")
    os.makedirs(gt_dir)
    os.makedirs(lq_dir)
    rng_np = np.random.default_rng(0)
    gt = rng_np.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    imwrite(os.path.join(gt_dir, "a.png"), gt)
    imwrite(os.path.join(lq_dir, "a.png"), gt[::2, ::2])

    ds = PairedImageDataset(gt_dir, lq_dir, size=8, scale=2, transform=True, to_tensor=True)
    a = ds.get(0, rng=random.Random(7))
    os.environ["STUDIOSR_DISABLE_NATIVE"] = "1"
    try:
        import studiosr_tpu.native as nat

        nat._TRIED, nat._LIB = False, None  # force re-resolution with the env set
        b = ds.get(0, rng=random.Random(7))
    finally:
        del os.environ["STUDIOSR_DISABLE_NATIVE"]
        nat._TRIED, nat._LIB = False, None
    np.testing.assert_allclose(a[0], b[0], atol=1e-7)
    np.testing.assert_allclose(a[1], b[1], atol=1e-7)
