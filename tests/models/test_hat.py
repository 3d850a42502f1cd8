import numpy as np
import pytest

from studiosr_tpu.models.hat import HAT

from tests.reference_loader import reference_available

SMALL = dict(embed_dim=30, depths=[2, 2], num_heads=[2, 2], window_size=8, mlp_ratio=2.0)


@pytest.mark.parametrize("scale", [2, 3, 4])
def test_shape_of_hat(scale):
    model = HAT.build(scale=scale, **SMALL)
    y = model(np.zeros((1, 12, 12, 3), np.float32))
    assert y.shape == (1, 12 * scale, 12 * scale, 3)


@pytest.mark.skipif(not reference_available(), reason="reference repo not mounted")
@pytest.mark.parametrize("size", [(16, 16), (20, 24)])
def test_hat_parity(size):
    import torch

    from tests.models.parity import assert_parity
    from tests.reference_loader import load_reference

    studiosr = load_reference()
    torch.manual_seed(0)
    ref = studiosr.models.hat.HAT(scale=2, **SMALL)
    ours = HAT.build(scale=2, **SMALL)
    assert_parity(ref, ours, hw=size, atol=5e-4)
