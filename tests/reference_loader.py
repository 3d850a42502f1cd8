"""Load the reference PyTorch implementation for golden-value parity tests.

The reference at /root/reference depends on ``timm``, ``gdown`` and
``skimage``, which are absent in this environment; we stub the three symbols
it actually uses (DropPath, trunc_normal_, structural_similarity, gdown.download)
with minimal torch/numpy implementations so the reference models import and
run. Tests using this module are skipped when the reference tree is absent.

This is test-only tooling: the production package never imports the
reference.
"""

from __future__ import annotations

import os
import sys
import types

REFERENCE_PATH = os.environ.get("STUDIOSR_REFERENCE", "/root/reference")


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_PATH, "studiosr"))


def _install_stubs() -> None:
    import torch
    import torch.nn as nn

    if "timm" not in sys.modules:
        timm = types.ModuleType("timm")
        layers = types.ModuleType("timm.layers")

        class DropPath(nn.Module):
            def __init__(self, drop_prob: float = 0.0):
                super().__init__()
                self.drop_prob = drop_prob

            def forward(self, x):
                if self.drop_prob == 0.0 or not self.training:
                    return x
                keep = 1.0 - self.drop_prob
                shape = (x.shape[0],) + (1,) * (x.ndim - 1)
                mask = torch.bernoulli(torch.full(shape, keep, device=x.device, dtype=x.dtype))
                return x * mask / keep

        def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
            with torch.no_grad():
                tensor.normal_(mean, std).clamp_(min=a * std, max=b * std)
            return tensor

        layers.DropPath = DropPath
        layers.trunc_normal_ = trunc_normal_
        timm.layers = layers
        sys.modules["timm"] = timm
        sys.modules["timm.layers"] = layers

    if "gdown" not in sys.modules:
        gdown = types.ModuleType("gdown")

        def _unavailable(*args, **kwargs):
            raise RuntimeError("network downloads are unavailable in tests")

        gdown.download = _unavailable
        sys.modules["gdown"] = gdown

    if "skimage" not in sys.modules:
        skimage = types.ModuleType("skimage")
        metrics = types.ModuleType("skimage.metrics")

        def structural_similarity(*args, **kwargs):
            raise RuntimeError("skimage stub: not used by parity tests")

        metrics.structural_similarity = structural_similarity
        metrics.peak_signal_noise_ratio = structural_similarity
        skimage.metrics = metrics
        sys.modules["skimage"] = skimage
        sys.modules["skimage.metrics"] = metrics


def load_reference():
    """Import and return the reference ``studiosr`` package."""
    _install_stubs()
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    import studiosr  # noqa: F401

    return studiosr


def torch_state_dict_numpy(model):
    return {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}
