"""Benchmark evaluation: Y-channel border-cropped PSNR/SSIM over paired sets.

Same protocol and dataset layouts as the reference
``studiosr/engine/evaluator.py``: ``Evaluator`` uses the ``GTmod12`` /
``LRbicx{scale}`` layout with the Set5/.../DIV2K_mini Google-Drive table;
``Evaluator2`` the ``HR`` / ``LR_bicubic/X{scale}`` layout; plus the
markdown-table ``benchmark`` sweeps.

``on_device=True`` computes PSNR/SSIM with the jitted XLA metrics
(utils/metrics.py) so scoring stays on-chip; the numpy protocol
implementation remains the default for bit-exact reporting.
"""

from __future__ import annotations

import os
from typing import Callable, List, Optional, Tuple

import numpy as np

from studiosr_tpu.data import PairedImageDataset
from studiosr_tpu.utils import compute_psnr, compute_psnr_jax, compute_ssim, compute_ssim_jax, gdown_and_extract

__all__ = ["Evaluator", "Evaluator2", "benchmark"]


class _EvaluatorBase:
    dataset: str
    scale: int
    testset: PairedImageDataset

    # Subclasses carry their own Google-Drive id table and default root;
    # the download sequence itself is shared (it used to be copy-pasted in
    # both subclasses — fixes must not be applied twice).
    DATASET_IDS: dict = {}
    DATASET_ROOT = "dataset"

    @classmethod
    def download_dataset(cls, root: Optional[str] = None, dataset: str = "Set5") -> str:
        root = cls.DATASET_ROOT if root is None else root
        benchmark_path = os.path.join(root, dataset)
        if not os.path.exists(benchmark_path):
            os.makedirs(root, exist_ok=True)
            gdown_and_extract(id=cls.DATASET_IDS[dataset], save_dir=root)
        return benchmark_path

    def __call__(
        self,
        func: Callable[[np.ndarray], np.ndarray],
        y_only: bool = True,
        visualize: bool = False,
        logging: bool = True,
    ) -> Tuple[float, float]:
        psnr, ssim = self.run(func, y_only, visualize, logging)
        print(f" {self.dataset:>8} - Average PSNR: {psnr:6.3f}, SSIM: {ssim:6.4f}")
        return psnr, ssim

    def run(
        self,
        func: Callable[[np.ndarray], np.ndarray],
        y_only: bool = True,
        visualize: bool = False,
        logging: bool = False,
        on_device: bool = False,
    ) -> Tuple[float, float]:
        crop_border = self.scale
        # Full chip residency: when handed a Model (not a bare callable) in
        # on_device mode, SR + PSNR/SSIM run in ONE jitted program and only
        # two scalars cross the host boundary per image (no HR fetch at all).
        device_pair = on_device and hasattr(func, "evaluate_uint8") and not visualize
        psnrs, ssims = [], []
        for i in range(len(self.testset)):
            lq, gt = self.testset[i]
            if device_pair:
                psnr, ssim = func.evaluate_uint8(lq, gt, crop_border=crop_border, y_only=y_only)
                sr = None
            else:
                sr = func.inference(lq) if hasattr(func, "inference") else func(lq)
                if on_device:
                    psnr = float(compute_psnr_jax(sr, gt, crop_border=crop_border, y_only=y_only))
                    ssim = float(compute_ssim_jax(sr, gt, crop_border=crop_border, y_only=y_only))
                else:
                    psnr = compute_psnr(sr, gt, crop_border=crop_border, y_only=y_only)
                    ssim = compute_ssim(sr, gt, crop_border=crop_border, y_only=y_only)
            psnrs.append(psnr)
            ssims.append(ssim)
            if logging:
                print(
                    f" {self.dataset:>8} - {i + 1:>3}/{len(self.testset):>3} PSNR: {psnr:6.3f}, SSIM: {ssim:6.4f}",
                    end="\r",
                )
            if visualize and sr is not None:
                import cv2

                from studiosr_tpu.utils.compare import compare

                nn_img = cv2.resize(lq, (gt.shape[1], gt.shape[0]), interpolation=cv2.INTER_NEAREST)
                bc = cv2.resize(lq, (gt.shape[1], gt.shape[0]), interpolation=cv2.INTER_CUBIC)
                compare([nn_img[:, :, ::-1], bc[:, :, ::-1], sr[:, :, ::-1], gt[:, :, ::-1]])
        return float(np.mean(psnrs)), float(np.mean(ssims))


class Evaluator(_EvaluatorBase):
    """GTmod12 / LRbicx layout (``evaluator.py:11-97``)."""

    DATASET_IDS = {
        "Set5": "18bimJIcXV0nxYU9y64Liwo63afEZXlAY",
        "Set14": "1Wn8mJRFT7N4z0cGbqwGev4ltbLwi4Sg2",
        "BSD100": "1qoiBkwiUgv62MISQh4A4nibdmDfP5qzJ",
        "Urban100": "1YTYp0gVJj2gpIsL3N8NkEDKEPIZeyhnf",
        "Manga109": "1ZaUD3ZeaaI3zHlEI6HRSx0baBU2CeYe7",
        "DIV2K": "1kUlppta5vEmXa76EHU_mb6_EoibNWlXw",
        "DIV2K_mini": "1pDEDDuYzaRzmJb6ztZTafeui1xE6iCz9",
    }

    def __init__(self, dataset: str = "DIV2K_mini", scale: int = 4, root: str = "dataset") -> None:
        self.dataset = dataset
        self.scale = scale
        self.root = root
        root = self.download_dataset(self.root, self.dataset)
        gt_mod = 12 if scale in [2, 3, 4] else scale
        self.testset = PairedImageDataset(
            os.path.join(root, f"GTmod{gt_mod}"), os.path.join(root, f"LRbicx{scale}")
        )

    @staticmethod
    def benchmark(
        func: Callable[[np.ndarray], np.ndarray],
        scale: int = 4,
        y_only: bool = True,
        datasets: List[str] = ["Set5", "Set14", "BSD100", "Urban100", "Manga109"],
        on_device: bool = False,
    ) -> Tuple[List[float], List[float]]:
        return _benchmark_table(Evaluator, func, scale, y_only, datasets, on_device)


class Evaluator2(_EvaluatorBase):
    """HR / LR_bicubic/X{scale} layout (``evaluator.py:130-198``)."""

    DATASET_IDS = {
        "Set5": "1ewFsDc-FdxierrNv8bGp4tE1BJzccyyr",
        "Set14": "1r_G-bFrjt-1puTJTMAxeLaI-fyiqlHN_",
        "BSD100": "1JAqwq03cu73HImotXxudstGPSyXB74eA",
        "Urban100": "1srG5FmDmnogUzvOywH7i2QfUnLsNGmxb",
    }

    DATASET_ROOT = "dataset/benchmark"

    def __init__(self, dataset: str = "Set5", scale: int = 4, root: str = "dataset/benchmark") -> None:
        self.dataset = dataset
        self.scale = scale
        self.root = root
        root = self.download_dataset(self.root, self.dataset)
        self.testset = PairedImageDataset(
            os.path.join(root, "HR"), os.path.join(root, "LR_bicubic", f"X{scale}")
        )


def _benchmark_table(evaluator_cls, func, scale, y_only, datasets, on_device=False):
    log_data, log_line, log_psnr, log_ssim = "| Metric |", "| ------ |", "|   PSNR |", "|   SSIM |"
    psnr_list, ssim_list = [], []
    for dataset in datasets:
        psnr, ssim = evaluator_cls(dataset, scale).run(func, y_only, logging=True, on_device=on_device)
        log_data += " %10s |" % dataset
        log_line += " ---------- |"
        log_psnr += " %10.3f |" % psnr
        log_ssim += " %10.4f |" % ssim
        psnr_list.append(psnr)
        ssim_list.append(ssim)
    print(log_data)
    print(log_line)
    print(log_psnr)
    print(log_ssim)
    print()
    return psnr_list, ssim_list


def benchmark(
    func: Callable[[np.ndarray], np.ndarray],
    scale: int = 4,
    y_only: bool = True,
    datasets: List[str] = ["Set5", "Set14", "BSD100", "Urban100"],
    on_device: bool = False,
) -> Tuple[List[float], List[float]]:
    """Module-level sweep over the Evaluator2 layout (``evaluator.py:201-228``).

    ``on_device=True`` with a Model (not a bare callable) scores each image
    chip-resident (one program, two scalars fetched)."""
    return _benchmark_table(Evaluator2, func, scale, y_only, datasets, on_device)
