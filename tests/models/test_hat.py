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
def test_hat_published_geometry_parity():
    """Full PUBLISHED geometry (embed 180, depths [6]x6, ws 16, overlap 0.5
    -> owin 24, conv_scale 0.01 — reference ``hat.py:388-405``) at a
    non-window-multiple eval size. This is exactly where layout bugs in the
    owin-24 OCA bias table and the 180-dim padding paths of the real
    checkpoints would hide: the small-config parity tests always run owin=12
    (which the fused OCAB kernel *declines*), so the hardware-shaped owin=24
    kernel body must be covered by reference parity here — engagement
    asserted, not fallback."""
    import jax
    import torch

    from studiosr_tpu.ops.pallas import engagement
    from studiosr_tpu.zoo import translate_state_dict

    from tests.reference_loader import load_reference

    studiosr = load_reference()
    torch.manual_seed(0)
    ref = studiosr.models.hat.HAT(scale=4).eval()
    ours = HAT.build(scale=4)
    state = {k: v.detach().cpu().numpy() for k, v in ref.state_dict().items()}
    ours.variables, report = translate_state_dict(state, ours.variables)
    assert not report.missing, f"missing params: {report.missing}"

    # 24x40 input -> 32x48 padded map: 2x3 ws=16 windows, owin 24 kv.
    x = np.random.default_rng(2).standard_normal((1, 24, 40, 3), dtype=np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    got_plain = np.asarray(ours(x))
    np.testing.assert_allclose(got_plain, want, atol=1e-3, rtol=1e-3)

    engagement.reset()
    jax.clear_caches()
    ours.enable_fused(True)
    got_fused = np.asarray(ours(x))
    np.testing.assert_allclose(got_fused, want, atol=1e-3, rtol=1e-3)
    counts = engagement.counters()
    rec = counts.get("fused_ocab_block", {})
    assert rec.get("engaged"), f"owin=24 OCAB kernel did not engage: {counts}"
    assert not rec.get("fallback"), f"OCAB fell back: {rec}"


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
