"""End-to-end from_pretrained zoo path without network.

Fabricates a reference-format checkpoint (torch state_dict under the 'params'
wrapper, the JingyunLiang release filename) in a temp ./pretrained cache and
drives ``SwinIR.from_pretrained`` through file resolution, key unwrapping,
and weight translation — then checks output parity with the torch model.
"""

import os

import numpy as np
import pytest

from tests.reference_loader import reference_available

pytestmark = pytest.mark.skipif(not reference_available(), reason="reference repo not mounted")


def test_swinir_light_from_pretrained_offline(tmp_path, monkeypatch):
    import torch

    from tests.reference_loader import load_reference

    from studiosr_tpu.models import SwinIR

    studiosr = load_reference()
    torch.manual_seed(0)
    ref = studiosr.models.swinir.SwinIR(
        scale=4, depths=[6, 6, 6, 6], embed_dim=60, num_heads=[6, 6, 6, 6], upsampler="pixelshuffledirect"
    ).eval()

    monkeypatch.chdir(tmp_path)
    os.makedirs("pretrained", exist_ok=True)
    # The exact artifact name from_pretrained resolves for the light variant.
    torch.save(
        {"params": ref.state_dict()},
        os.path.join("pretrained", "002_lightweightSR_DIV2K_s64w8_SwinIR-S_x4.pth"),
    )

    model = SwinIR.from_pretrained(scale=4, light=True)

    x = np.random.default_rng(0).standard_normal((1, 16, 24, 3), dtype=np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(model(x))
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-3)


def test_edsr_from_pretrained_offline(tmp_path, monkeypatch):
    import torch

    from tests.reference_loader import load_reference

    from studiosr_tpu.models import EDSR

    studiosr = load_reference()
    torch.manual_seed(1)
    # Full-size EDSR is 43M params; fabricate the DIV2K artifact (raw state
    # dict incl. the frozen MeanShift convs, loaded strict=False upstream).
    ref = studiosr.models.edsr.EDSR(scale=2, img_range=255.0, n_feats=16, n_resblocks=2).eval()

    monkeypatch.chdir(tmp_path)
    os.makedirs("pretrained", exist_ok=True)
    torch.save(ref.state_dict(), os.path.join("pretrained", "r32f256x2.pth"))

    # Patch build so the fabricated small config matches.
    orig_build = EDSR.build.__func__

    def small_build(cls, scale=2, img_range=255.0, **kw):
        return orig_build(cls, scale=scale, img_range=img_range, n_feats=16, n_resblocks=2)

    monkeypatch.setattr(EDSR, "build", classmethod(small_build))
    model = EDSR.from_pretrained(scale=2, dataset="DIV2K")

    x = np.random.default_rng(2).standard_normal((1, 12, 12, 3), dtype=np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(model(x))
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-3)
