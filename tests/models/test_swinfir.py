import numpy as np
import pytest

from studiosr_tpu.models.swinfir import SwinFIR

from tests.reference_loader import reference_available

SMALL = dict(embed_dim=24, depths=[2, 2], num_heads=[2, 2], window_size=8, mlp_ratio=2.0)


@pytest.mark.parametrize("scale", [2, 3, 4])
@pytest.mark.parametrize("size", [8, 12])
def test_shape_of_swinfir(scale, size):
    model = SwinFIR.build(scale=scale, **SMALL)
    y = model(np.zeros((1, size, size, 3), np.float32))
    assert y.shape == (1, size * scale, size * scale, 3)


@pytest.mark.skipif(not reference_available(), reason="reference repo not mounted")
def test_swinfir_parity():
    import torch

    from tests.models.parity import assert_parity
    from tests.reference_loader import load_reference

    studiosr = load_reference()
    torch.manual_seed(0)
    ref = studiosr.models.swinfir.SwinFIR(scale=2, **SMALL)
    ours = SwinFIR.build(scale=2, **SMALL)
    assert_parity(ref, ours, hw=(20, 24), atol=1e-3)
