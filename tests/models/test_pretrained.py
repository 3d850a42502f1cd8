"""Pretrained-quality integration tests (PSNR floors).

The reference ships these but skips them in CI due to download issues
(``tests/models/test_swinir.py:29-38``, ``test_vdsr.py:29-38``). Here they
run whenever the zoo + datasets are reachable (or already cached under
./pretrained and ./dataset) and skip cleanly in offline environments.
"""

import os

import numpy as np
import pytest


def _offline() -> bool:
    if os.environ.get("STUDIOSR_FORCE_PRETRAINED_TESTS"):
        return False
    import socket

    try:
        socket.create_connection(("github.com", 443), timeout=3).close()
        return False
    except OSError:
        return True


pytestmark = pytest.mark.skipif(_offline(), reason="no network for zoo/datasets")


def test_pretrained_swinir_light_psnr_floor():
    from studiosr_tpu.engine import Evaluator
    from studiosr_tpu.models import SwinIR

    scale = 4
    model = SwinIR.from_pretrained(scale=scale, light=True)
    evaluator = Evaluator(scale=scale)  # DIV2K_mini
    psnr, ssim = evaluator.run(model.inference)
    assert psnr > 32.4


@pytest.mark.parametrize("scale,floor", [(4, 31.85), (3, 34.12), (2, 37.81)])
def test_pretrained_vdsr_psnr_floor(scale, floor):
    from studiosr_tpu.engine import Evaluator
    from studiosr_tpu.models import VDSR

    model = VDSR.from_pretrained(scale=scale)
    evaluator = Evaluator("Set5", scale=scale)
    psnr, ssim = evaluator.run(model.inference)
    assert psnr > floor


def test_pretrained_edsr_set5():
    """EDSR x2 pretrained + Set5: the driver's config #1 slice
    (SURVEY.md §7 step 3) — PSNR must be in the published range."""
    from studiosr_tpu.engine import Evaluator
    from studiosr_tpu.models import EDSR

    model = EDSR.from_pretrained(scale=2, dataset="DIV2K")
    psnr, ssim = Evaluator("Set5", scale=2).run(model.inference)
    assert psnr > 37.9
