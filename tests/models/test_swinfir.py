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


@pytest.mark.skipif(not reference_available(), reason="reference repo not mounted")
def test_swinfir_full_geometry_parity():
    """Full published geometry (embed 180, depths [6]x6 — reference
    ``swinfir.py:83-98``) at a non-window-multiple eval size, plain +
    fused-interpret: the 180-dim SFB spectral branch and padding paths of
    the real checkpoints (companion to the SwinIR classical / HAT tests)."""
    import torch

    from studiosr_tpu.zoo import translate_state_dict

    from tests.reference_loader import load_reference

    studiosr = load_reference()
    torch.manual_seed(0)
    ref = studiosr.models.swinfir.SwinFIR(scale=4).eval()
    ours = SwinFIR.build(scale=4)
    state = {k: v.detach().cpu().numpy() for k, v in ref.state_dict().items()}
    ours.variables, report = translate_state_dict(state, ours.variables)
    assert not report.missing, f"missing params: {report.missing}"

    x = np.random.default_rng(4).standard_normal((1, 20, 24, 3), dtype=np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    got_plain = np.asarray(ours(x))
    np.testing.assert_allclose(got_plain, want, atol=1e-3, rtol=1e-3)

    ours.enable_fused(True)
    got_fused = np.asarray(ours(x))
    np.testing.assert_allclose(got_fused, want, atol=1e-3, rtol=1e-3)


def test_mxu_dft_path_matches_fft_on_cpu(monkeypatch):
    """The MXU-DFT SFB wiring (the TPU serving/training branch) pinned
    offline: FORCE_MXU routes the CPU backend through rfft2_mxu/irfft2_mxu
    in both the linen module and the fused serving path."""
    import studiosr_tpu.ops.dft as dft

    import jax

    model = SwinFIR.build(scale=2, **SMALL)
    x = np.random.default_rng(0).standard_normal((1, 16, 16, 3)).astype(np.float32)
    want = np.asarray(model(x))
    monkeypatch.setattr(dft, "FORCE_MXU", True)
    # use_mxu_dft() is read at trace time — re-jit so the flag is honored
    model._jit_forward = jax.jit(model._forward)
    got = np.asarray(model(x))
    # bit-exact equality would mean the stale FFT trace was reused
    assert not np.array_equal(got, want)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)

    fused = model.enable_fused(True)
    got_fused = np.asarray(fused(x))
    np.testing.assert_allclose(got_fused, want, atol=2e-4, rtol=1e-4)


def test_swinfir_from_pretrained_raises():
    """No public SwinFIR checkpoints exist; inheriting SwinIR's loader would
    hand back a SwinFIR whose SFB params stay zero (strict=False load) — a
    model that runs but upscales garbage. Must fail loudly instead."""
    import pytest

    from studiosr_tpu.models import SwinFIR

    with pytest.raises(NotImplementedError, match="no published pretrained"):
        SwinFIR.from_pretrained(scale=4)
