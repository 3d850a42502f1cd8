"""Paired LR/HR image datasets: PairedImageDataset, DIV2K, Flickr2K, DF2K.

Same dataset semantics and on-disk layout as the reference
``studiosr/data/dataset.py``: files paired by identical name under gt/lq
directories, offline sub-image extraction grids (HR 480/240, LR X2 240/120,
X3 160/80, X4 120/60), and the same Google-Drive archive ids for
auto-download. No torch dependency — datasets are plain indexable objects
yielding numpy HWC arrays (or float32 NHWC-ready arrays with ``to_tensor``).
"""

from __future__ import annotations

import os
import random
from typing import List, Optional, Tuple

import numpy as np

from studiosr_tpu.data import transforms as T
from studiosr_tpu.utils.helpers import gdown_and_extract, get_image_files, imread

__all__ = ["PairedImageDataset", "DIV2K", "Flickr2K", "DF2K", "extract_subimages", "prepare_dataset"]


def _native_crop_augment(lq, gt, size, scale, rng):
    """One-pass C++ crop+flip+rot90+normalize with RNG draws identical to the
    numpy transform pipeline. Returns None when the native lib is absent."""
    from studiosr_tpu import native

    if not native.native_available():
        return None
    # The C++ kernel assumes 3-channel uint8 pairs at an exact scale multiple;
    # anything else (raw non-sub-image datasets) takes the numpy path, which
    # draws the same RNG sequence below.
    if not (
        lq.dtype == np.uint8
        and gt.dtype == np.uint8
        and lq.ndim == 3
        and lq.shape[2] == 3
        and gt.shape == (lq.shape[0] * scale, lq.shape[1] * scale, 3)
    ):
        return None
    r = rng if rng is not None else random
    h, w = lq.shape[:2]
    xs = r.randint(0, w - size)
    ys = r.randint(0, h - size)
    fliplr = r.random() < 0.5
    flipud = r.random() < 0.5
    rot90 = r.random() < 0.5
    return native.paired_crop_augment(lq, gt, size, scale, xs, ys, fliplr, flipud, rot90)


class PairedImageDataset:
    """Index-based paired (lq, gt) image dataset.

    ``transform=True`` applies the standard SR training augmentation
    (scale-coupled crop + flips + rot90); ``to_tensor=True`` converts to
    float32 [0,1] HWC ready for NHWC batching.
    """

    def __init__(
        self,
        gt_path: str,
        lq_path: str,
        size: int = 48,
        scale: int = 4,
        transform: bool = False,
        to_tensor: bool = False,
    ) -> None:
        self.gt_path = gt_path
        self.lq_path = lq_path
        self.files = get_image_files(gt_path)
        self._init_pipeline(size, scale, transform, to_tensor)

    def _init_pipeline(self, size: int, scale: int, transform: bool, to_tensor: bool) -> None:
        """The standard SR training pipeline, shared with DF2K."""
        self.size = size
        self.scale = scale
        self.transform = (
            T.Compose(
                [
                    T.RandomCrop(self.size, self.scale),
                    T.RandomHorizontalFlip(),
                    T.RandomVerticalFlip(),
                    T.RandomRotation90(),
                ]
            )
            if transform
            else None
        )
        self.to_tensor = T.ToArray() if to_tensor else None

    def __len__(self) -> int:
        return len(self.files)

    def __getitem__(self, idx: int) -> Tuple[np.ndarray, np.ndarray]:
        return self.get(idx)

    def get(self, idx: int, rng: Optional[random.Random] = None) -> Tuple[np.ndarray, np.ndarray]:
        lq, gt = self.get_image_pair(idx)
        if self.transform is not None and self.to_tensor is not None:
            # Default training pipeline: the native C++ kernel does
            # crop+augment+normalize in one pass with identical RNG draws.
            fast = _native_crop_augment(lq, gt, self.size, self.scale, rng)
            if fast is not None:
                return fast
        if self.transform is not None:
            lq, gt = self.transform(lq, gt, rng=rng)
        if self.to_tensor is not None:
            lq, gt = self.to_tensor(lq, gt)
        return lq, gt

    def get_image_pair(self, idx: int) -> Tuple[np.ndarray, np.ndarray]:
        file = self.files[idx]
        return imread(os.path.join(self.lq_path, file)), imread(os.path.join(self.gt_path, file))


def extract_subimages(input_dir: str, output_dir: str, crop_size: int, step: int) -> None:
    """Sliding-window sub-image extraction with edge-snapped final crops.

    Atomic: crops are written to ``<output_dir>.partial`` and the directory
    is renamed into place only when every image succeeded — an interrupted
    prepare (Ctrl-C, disk full) therefore re-runs instead of leaving a
    half-built dataset that the existence checks would skip forever.
    """
    import shutil

    import cv2
    from tqdm import tqdm

    files = get_image_files(input_dir)
    if not files:
        # Loud failure beats an (atomic but) empty grid: the raw corpus is
        # missing — e.g. a prebuilt `sub` archive without the originals.
        raise FileNotFoundError(f"no images under {input_dir} to extract sub-images from")
    partial_dir = output_dir.rstrip(os.sep) + ".partial"
    if os.path.exists(partial_dir):
        shutil.rmtree(partial_dir)  # stale leftover from an interrupted run
    os.makedirs(partial_dir)
    for f in tqdm(files, desc=os.path.basename(output_dir)):
        # Nested inputs yield root-relative names: flatten the separators so
        # the crop name stays a single path component under output_dir.
        name = os.path.splitext(f)[0].replace(os.sep, "_").replace("/", "_")
        for tag in ("x2", "x3", "x4"):
            # Trailing-only strip: the LR corpora suffix names as 0001x4.png;
            # replace-anywhere (the reference's behavior, dataset.py:91-92)
            # would also mangle stems merely containing the substring.
            if name.endswith(tag):
                name = name[: -len(tag)]
        path = os.path.join(input_dir, f)
        image = cv2.imread(path)
        if image is None:
            raise ValueError(f"unreadable image in dataset: {path}")

        h, w = image.shape[:2]
        if h < crop_size or w < crop_size:
            # An empty arange below would IndexError on y_range[-1] with no
            # hint which image broke the pack; name it instead.
            raise ValueError(
                f"extract_subimages: {path} is {h}x{w}, smaller than "
                f"crop_size {crop_size} — remove it or reduce crop_size"
            )
        y_range = np.arange(0, h - crop_size + 1, step)
        if h - (y_range[-1] + crop_size) > 0:
            y_range = np.append(y_range, h - crop_size)
        x_range = np.arange(0, w - crop_size + 1, step)
        if w - (x_range[-1] + crop_size) > 0:
            x_range = np.append(x_range, w - crop_size)

        index = 0
        for y in y_range:
            for x in x_range:
                index += 1
                out_path = os.path.join(partial_dir, name + f"_{index:03d}.png")
                if not cv2.imwrite(out_path, image[y : y + crop_size, x : x + crop_size]):
                    raise IOError(f"failed to write sub-image {out_path}")
    if os.path.exists(output_dir):
        shutil.rmtree(output_dir)  # direct re-extraction over an old grid
    os.replace(partial_dir, output_dir)


def prepare_dataset(dataset_dir: str, dataset_name: str, postfix: str = "") -> None:
    """Build the HR + LR X2/X3/X4 sub-image grids (``dataset.py:113-128``)."""
    dataset_dir = os.path.join(dataset_dir, dataset_name)
    sub_dir = os.path.join(dataset_dir, "sub")
    packs = [
        dict(dir_name=f"{dataset_name}{postfix}_HR", crop_size=480, step=240),
        dict(dir_name=f"{dataset_name}{postfix}_LR_bicubic/X2", crop_size=240, step=120),
        dict(dir_name=f"{dataset_name}{postfix}_LR_bicubic/X3", crop_size=160, step=80),
        dict(dir_name=f"{dataset_name}{postfix}_LR_bicubic/X4", crop_size=120, step=60),
    ]
    for pack in packs:
        output_dir = os.path.join(sub_dir, pack["dir_name"])
        if not os.path.exists(output_dir):
            extract_subimages(
                input_dir=os.path.join(dataset_dir, pack["dir_name"]),
                output_dir=output_dir,
                crop_size=pack["crop_size"],
                step=pack["step"],
            )


class DIV2K(PairedImageDataset):
    dataset_name = "DIV2K"
    gdrive_id = "1rhaiGcXoivv5pJKIf7Wy1QJHZ-tgiyB4"

    def __init__(
        self,
        dataset_dir: str,
        size: int = 48,
        scale: int = 4,
        transform: bool = False,
        to_tensor: bool = False,
        download: bool = False,
    ):
        if download:
            self.download(dataset_dir=dataset_dir)
        dataset_path = os.path.join(dataset_dir, f"{self.dataset_name}/sub")
        # Always delegate: prepare skips each COMPLETE pack individually, so
        # a run interrupted after some packs resumes the missing ones (a
        # top-level `sub` existence check would skip them forever).
        self.prepare(dataset_dir=dataset_dir)
        super().__init__(
            gt_path=os.path.join(dataset_path, f"{self.dataset_name}_train_HR"),
            lq_path=os.path.join(dataset_path, f"{self.dataset_name}_train_LR_bicubic/X{scale}"),
            size=size,
            scale=scale,
            transform=transform,
            to_tensor=to_tensor,
        )

    @classmethod
    def download(cls, dataset_dir: str) -> None:
        gdown_and_extract(id=cls.gdrive_id, save_dir=dataset_dir)

    @classmethod
    def prepare(cls, dataset_dir: str) -> None:
        prepare_dataset(dataset_dir, cls.dataset_name, "_train")


class Flickr2K(PairedImageDataset):
    dataset_name = "Flickr2K"
    gdrive_id = "1--pNeHQlsaIWPzSnnIPzmvPpimdIhN5C"

    def __init__(
        self,
        dataset_dir: str,
        size: int = 48,
        scale: int = 4,
        transform: bool = False,
        to_tensor: bool = False,
        download: bool = False,
    ):
        if download:
            self.download(dataset_dir=dataset_dir)
        dataset_path = os.path.join(dataset_dir, f"{self.dataset_name}/sub")
        self.prepare(dataset_dir=dataset_dir)  # per-pack skip; resumes partial runs
        super().__init__(
            gt_path=os.path.join(dataset_path, f"{self.dataset_name}_HR"),
            lq_path=os.path.join(dataset_path, f"{self.dataset_name}_LR_bicubic/X{scale}"),
            size=size,
            scale=scale,
            transform=transform,
            to_tensor=to_tensor,
        )

    @classmethod
    def download(cls, dataset_dir: str) -> None:
        gdown_and_extract(id=cls.gdrive_id, save_dir=dataset_dir)

    @classmethod
    def prepare(cls, dataset_dir: str) -> None:
        prepare_dataset(dataset_dir, cls.dataset_name)


class DF2K(PairedImageDataset):
    """Concatenated DIV2K + Flickr2K training corpus (``dataset.py:207-277``).

    Subclasses :class:`PairedImageDataset` for the shared sample pipeline
    (including the one-pass native crop+augment fast path) and overrides
    only the file indexing: pairs live in two corpora, addressed by path.
    """

    def __init__(
        self,
        dataset_dir: str,
        size: int = 48,
        scale: int = 4,
        transform: bool = False,
        to_tensor: bool = False,
        download: bool = False,
    ):
        if download:
            DIV2K.download(dataset_dir=dataset_dir)
            Flickr2K.download(dataset_dir=dataset_dir)
        DIV2K.prepare(dataset_dir=dataset_dir)  # per-pack skip; resumes partial runs
        Flickr2K.prepare(dataset_dir=dataset_dir)
        div2k_path = os.path.join(dataset_dir, "DIV2K/sub")
        flickr2k_path = os.path.join(dataset_dir, "Flickr2K/sub")

        self.file_paths: List[Tuple[str, str]] = []
        for gt_dir, lq_dir in [
            (os.path.join(div2k_path, "DIV2K_train_HR"), os.path.join(div2k_path, f"DIV2K_train_LR_bicubic/X{scale}")),
            (os.path.join(flickr2k_path, "Flickr2K_HR"), os.path.join(flickr2k_path, f"Flickr2K_LR_bicubic/X{scale}")),
        ]:
            for f in get_image_files(gt_dir):
                self.file_paths.append((os.path.join(lq_dir, f), os.path.join(gt_dir, f)))
        self._init_pipeline(size, scale, transform, to_tensor)

    def __len__(self) -> int:
        return len(self.file_paths)

    def get_image_pair(self, idx: int) -> Tuple[np.ndarray, np.ndarray]:
        lq_path, gt_path = self.file_paths[idx]
        return imread(lq_path), imread(gt_path)
