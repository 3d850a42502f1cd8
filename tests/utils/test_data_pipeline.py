"""Data pipeline tests: transforms, paired dataset, sharded prefetch loader."""

import os
import random

import numpy as np

from studiosr_tpu.data import DataHandler, PairedImageDataset, PrefetchLoader
from studiosr_tpu.data import transforms as T
from studiosr_tpu.utils import imwrite


def test_paired_random_crop_scale_coupling():
    lq = np.arange(16 * 20 * 3, dtype=np.uint8).reshape(16, 20, 3)
    gt = np.repeat(np.repeat(lq, 2, axis=0), 2, axis=1)
    rng = random.Random(0)
    lq_c, gt_c = T.paired_random_crop(lq, gt, size=8, scale=2, rng=rng)
    assert lq_c.shape == (8, 8, 3)
    assert gt_c.shape == (16, 16, 3)
    # gt crop must be the upsampled lq crop (gt is nearest-upsampled lq).
    np.testing.assert_array_equal(gt_c, np.repeat(np.repeat(lq_c, 2, axis=0), 2, axis=1))


def test_transform_pipeline_deterministic():
    lq = np.random.default_rng(0).integers(0, 255, (32, 32, 3), dtype=np.uint8)
    gt = np.repeat(np.repeat(lq, 4, axis=0), 4, axis=1)
    pipeline = T.Compose([T.RandomCrop(8, 4), T.RandomHorizontalFlip(), T.RandomVerticalFlip(), T.RandomRotation90()])
    a = pipeline(lq, gt, rng=random.Random(7))
    b = pipeline(lq, gt, rng=random.Random(7))
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_array_equal(a[1], b[1])


def test_paired_dataset_and_loader(tmp_path):
    gt_dir, lq_dir = str(tmp_path / "gt"), str(tmp_path / "lq")
    os.makedirs(gt_dir)
    os.makedirs(lq_dir)
    rng = np.random.default_rng(0)
    for i in range(6):
        gt = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
        lq = gt[::2, ::2]
        imwrite(os.path.join(gt_dir, f"im{i}.png"), gt)
        imwrite(os.path.join(lq_dir, f"im{i}.png"), lq)

    ds = PairedImageDataset(gt_dir, lq_dir, size=8, scale=2, transform=True, to_tensor=True)
    assert len(ds) == 6
    lq, gt = ds[0]
    assert lq.shape == (8, 8, 3) and gt.shape == (16, 16, 3)
    assert lq.dtype == np.float32 and lq.max() <= 1.0

    loader = PrefetchLoader(ds, batch_size=2, num_workers=2, seed=0)
    stream = loader.batches()
    b1 = next(stream)
    assert b1[0].shape == (2, 8, 8, 3) and b1[1].shape == (2, 16, 16, 3)

    # Resumability: restarting at iteration k reproduces the same batch.
    b_at_3 = None
    stream = loader.batches()
    for k in range(4):
        b_at_3 = next(stream)
    resumed = next(loader.batches(start_iteration=3))
    np.testing.assert_array_equal(b_at_3[0], resumed[0])


def test_loader_rank_sharding(tmp_path):
    class Tiny:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            return np.full((2, 2, 3), i, np.float32), np.full((4, 4, 3), i, np.float32)

    seen = []
    for rank in range(2):
        loader = PrefetchLoader(Tiny(), batch_size=2, num_workers=1, shuffle=False, rank=rank, world_size=2)
        stream = loader.batches()
        for _ in range(2):
            lq, _ = next(stream)
            seen.append(set(lq[:, 0, 0, 0].astype(int).tolist()))
    # Ranks see disjoint strided subsets.
    assert seen[0] | seen[1] | seen[2] | seen[3] == set(range(8))
    assert (seen[0] | seen[1]).isdisjoint(seen[2] | seen[3])


def test_loader_dataset_smaller_than_batch():
    """Static batch size even when the dataset shard is tiny (wraparound)."""

    class Tiny:
        def __len__(self):
            return 3

        def __getitem__(self, i):
            return np.full((2, 2, 3), i, np.float32), np.full((4, 4, 3), i, np.float32)

    loader = PrefetchLoader(Tiny(), batch_size=8, num_workers=1, shuffle=False)
    lq, gt = next(loader.batches())
    assert lq.shape == (8, 2, 2, 3) and gt.shape == (8, 4, 4, 3)
    assert set(lq[:, 0, 0, 0].astype(int).tolist()) == {0, 1, 2}


def test_loader_more_ranks_than_samples():
    """world_size > len(dataset): the out-of-range ranks must wrap into the
    epoch order (like torch's DistributedSampler padding), not crash the
    batch assembly on an empty shard."""

    class Tiny:
        def __len__(self):
            return 2

        def __getitem__(self, i):
            return np.full((2, 2, 3), i, np.float32), np.full((4, 4, 3), i, np.float32)

    for rank in range(4):
        loader = PrefetchLoader(Tiny(), batch_size=2, num_workers=1, shuffle=False, rank=rank, world_size=4)
        lq, gt = next(loader.batches())
        assert lq.shape == (2, 2, 2, 3)
        # Each rank sees a single wrapped sample repeated to the batch size.
        assert set(lq[:, 0, 0, 0].astype(int).tolist()) == {rank % 2}


def test_extract_subimages_grid(tmp_path):
    """Sliding-window sub-image extraction incl. edge-snapped final crops."""
    import cv2

    from studiosr_tpu.data import extract_subimages

    in_dir, out_dir = str(tmp_path / "in"), str(tmp_path / "out")
    os.makedirs(in_dir)
    img = np.random.default_rng(0).integers(0, 256, (70, 100, 3), dtype=np.uint8)
    cv2.imwrite(os.path.join(in_dir, "pic_x2.png"), img)

    extract_subimages(in_dir, out_dir, crop_size=48, step=24)
    files = sorted(os.listdir(out_dir))
    # y starts: 0, 22 (snapped); x starts: 0, 24, 48, 52 (snapped) -> 2*4 crops
    assert len(files) == 8
    assert files[0].startswith("pic_")  # x2 tag stripped
    crop = cv2.imread(os.path.join(out_dir, files[0]))
    assert crop.shape == (48, 48, 3)


def test_data_handler_topology():
    class Tiny:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            return np.zeros((2, 2, 3), np.float32), np.zeros((4, 4, 3), np.float32)

    handler = DataHandler(Tiny(), batch_size=4, num_workers=1)
    assert handler.is_main_process
    lq, gt = handler.get_batch()
    assert handler.iterations == 1
    assert lq.shape[0] == 4
    handler.set_iterations(10)
    assert handler.iterations == 10
    handler.close()


def test_iterator_close_stops_pipeline(tmp_path):
    """DataIterator/DataHandler.close() must actually stop the producer
    thread and decode pool (it was a no-op: the producer polled at 1 kHz
    forever and ~prefetch decoded batches stayed pinned after training)."""
    import threading
    import time

    from studiosr_tpu.data.handler import DataIterator

    gt_dir, lq_dir = str(tmp_path / "gt"), str(tmp_path / "lq")
    os.makedirs(gt_dir)
    os.makedirs(lq_dir)
    rng = np.random.default_rng(1)
    for i in range(4):
        gt = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
        imwrite(os.path.join(gt_dir, f"im{i}.png"), gt)
        imwrite(os.path.join(lq_dir, f"im{i}.png"), gt[::2, ::2])

    ds = PairedImageDataset(gt_dir, lq_dir, size=8, scale=2, transform=True, to_tensor=True)
    it = DataIterator(PrefetchLoader(ds, batch_size=2, num_workers=2, seed=0))
    it.get_batch()
    assert any(t.name == "studiosr-data-producer" for t in threading.enumerate())
    it.close()
    deadline = time.time() + 5.0
    while time.time() < deadline and any(t.name == "studiosr-data-producer" for t in threading.enumerate()):
        time.sleep(0.01)
    assert not any(t.name == "studiosr-data-producer" for t in threading.enumerate())


def test_get_image_files_nested_and_macosx(tmp_path):
    """Recursive walk must return root-relative paths (joinable back onto
    the root — bare names crash on nested zips) and skip AppleDouble junk."""
    from studiosr_tpu.utils.helpers import get_image_files

    root = tmp_path / "data"
    (root / "sub").mkdir(parents=True)
    (root / "__MACOSX" / "sub").mkdir(parents=True)
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    imwrite(str(root / "a.png"), img)
    imwrite(str(root / "sub" / "b.png"), img)
    (root / "sub" / "._b.png").write_bytes(b"\x00\x05\x16\x07")  # AppleDouble fork
    (root / "__MACOSX" / "sub" / "b.png").write_bytes(b"junk")

    files = get_image_files(str(root))
    assert files == sorted(["a.png", os.path.join("sub", "b.png")])
    for f in files:
        assert os.path.isfile(os.path.join(str(root), f))
