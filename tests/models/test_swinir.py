import numpy as np
import pytest

from studiosr_tpu.models.swinir import SwinIR

from tests.reference_loader import reference_available

SMALL = dict(embed_dim=24, depths=[2, 2], num_heads=[2, 2], window_size=8, mlp_ratio=2.0)


@pytest.mark.parametrize("scale", [2, 3, 4, 8])
@pytest.mark.parametrize("size", [8, 12])
def test_shape_of_swinir(scale, size):
    model = SwinIR.build(scale=scale, **SMALL)
    y = model(np.zeros((1, size, size, 3), np.float32))
    assert y.shape == (1, size * scale, size * scale, 3)


@pytest.mark.parametrize("upsampler", ["pixelshuffle", "pixelshuffledirect"])
def test_swinir_upsampler_variants(upsampler):
    model = SwinIR.build(scale=4, upsampler=upsampler, **SMALL)
    y = model(np.zeros((1, 12, 12, 3), np.float32))
    assert y.shape == (1, 48, 48, 3)


@pytest.mark.skipif(not reference_available(), reason="reference repo not mounted")
@pytest.mark.parametrize("size", [(20, 24), (16, 16)])
def test_swinir_parity(size):
    import torch

    from tests.models.parity import assert_parity
    from tests.reference_loader import load_reference

    studiosr = load_reference()
    torch.manual_seed(0)
    ref = studiosr.models.swinir.SwinIR(scale=2, **SMALL)
    ours = SwinIR.build(scale=2, **SMALL)
    assert_parity(ref, ours, hw=size, atol=5e-4)


@pytest.mark.skipif(not reference_available(), reason="reference repo not mounted")
def test_swinir_full_light_config_parity():
    """Full-size lightweight config (embed 60, depths [6]x4) — the exact
    architecture of the published 002_lightweightSR checkpoints."""
    import torch

    from tests.models.parity import assert_parity
    from tests.reference_loader import load_reference

    studiosr = load_reference()
    torch.manual_seed(0)
    cfg = dict(depths=[6, 6, 6, 6], embed_dim=60, num_heads=[6, 6, 6, 6], upsampler="pixelshuffledirect")
    ref = studiosr.models.swinir.SwinIR(scale=4, **cfg)
    ours = SwinIR.build(scale=4, **cfg)
    assert_parity(ref, ours, hw=(24, 24), atol=1e-3, rtol=1e-3)


@pytest.mark.skipif(not reference_available(), reason="reference repo not mounted")
def test_swinir_classical_full_geometry_parity():
    """Full CLASSICAL geometry (embed 180, depths [6]x6, heads [6]x6, ws 8 —
    the exact architecture of the published 001_classicalSR checkpoints,
    reference ``swinir.py:259-273``) at a non-window-multiple eval size:
    the flip-padded 24x24 map runs an ODD 3 windows/row, exercising the
    180-dim padding paths and odd-window kernel handling of the real
    checkpoints. Parity through BOTH the plain forward and the fused
    serving path (interpret mode)."""
    import torch

    from studiosr_tpu.zoo import translate_state_dict

    from tests.reference_loader import load_reference

    studiosr = load_reference()
    torch.manual_seed(0)
    ref = studiosr.models.swinir.SwinIR(scale=4).eval()
    ours = SwinIR.build(scale=4)
    state = {k: v.detach().cpu().numpy() for k, v in ref.state_dict().items()}
    ours.variables, report = translate_state_dict(state, ours.variables)
    assert not report.missing, f"missing params: {report.missing}"

    x = np.random.default_rng(1).standard_normal((1, 20, 24, 3), dtype=np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    got_plain = np.asarray(ours(x))
    np.testing.assert_allclose(got_plain, want, atol=1e-3, rtol=1e-3)

    from studiosr_tpu.ops.pallas import engagement

    import jax

    engagement.reset()
    jax.clear_caches()
    ours.enable_fused(True)
    got_fused = np.asarray(ours(x))
    np.testing.assert_allclose(got_fused, want, atol=1e-3, rtol=1e-3)
    counts = engagement.counters()
    attn_engaged = any(
        counts.get(k, {}).get("engaged")
        for k in ("fused_swin_block", "fused_window_attention_block", "window_attention_pallas")
    )
    assert attn_engaged, f"no fused attention kernel engaged: {counts}"


@pytest.mark.skipif(not reference_available(), reason="reference repo not mounted")
def test_swinir_light_parity():
    import torch

    from tests.models.parity import assert_parity
    from tests.reference_loader import load_reference

    studiosr = load_reference()
    torch.manual_seed(0)
    cfg = dict(upsampler="pixelshuffledirect", **SMALL)
    ref = studiosr.models.swinir.SwinIR(scale=4, **cfg)
    ours = SwinIR.build(scale=4, **cfg)
    assert_parity(ref, ours, hw=(12, 20), atol=5e-4)
