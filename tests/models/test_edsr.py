import numpy as np
import pytest

from studiosr_tpu.models import EDSR

from tests.reference_loader import reference_available


@pytest.mark.parametrize("scale", [2, 3, 4, 8])
@pytest.mark.parametrize("size", [8, 12])
def test_shape_of_edsr(scale: int, size: int) -> None:
    model = EDSR.build(scale=scale, n_feats=16, n_resblocks=2)
    x = np.random.default_rng(0).standard_normal((1, size, size, 3), dtype=np.float32)
    y = model(x)
    assert y.shape == (1, size * scale, size * scale, 3)


def test_edsr_inference_contract() -> None:
    model = EDSR.build(scale=2, n_feats=8, n_resblocks=1)
    image = np.random.default_rng(0).integers(0, 256, (13, 9, 3), dtype=np.uint8)
    out = model.inference(image)
    assert out.dtype == np.uint8
    assert out.shape == (26, 18, 3)


@pytest.mark.skipif(not reference_available(), reason="reference repo not mounted")
@pytest.mark.parametrize("scale", [2, 4])
def test_edsr_parity_with_reference(scale: int) -> None:
    """Random-weight golden test: translated torch weights must reproduce the
    reference forward to float32 accumulation tolerance."""
    import torch

    from tests.reference_loader import load_reference, torch_state_dict_numpy

    from studiosr_tpu.zoo import translate_state_dict

    studiosr = load_reference()
    torch.manual_seed(0)
    ref = studiosr.models.edsr.EDSR(scale=scale, n_feats=32, n_resblocks=4).eval()

    model = EDSR.build(scale=scale, n_feats=32, n_resblocks=4)
    model.variables, report = translate_state_dict(torch_state_dict_numpy(ref), model.variables)
    assert not report.missing, report.missing

    x = np.random.default_rng(1).standard_normal((1, 20, 24, 3), dtype=np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(model(x))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)
