"""Direct op-level parity tests against torch semantics."""

import numpy as np
import pytest

from tests.reference_loader import reference_available


def test_pixel_shuffle_matches_torch():
    import torch

    from studiosr_tpu.ops import pixel_shuffle, pixel_unshuffle

    x = np.random.default_rng(0).standard_normal((2, 5, 7, 12), dtype=np.float32)
    got = np.asarray(pixel_shuffle(x, 2))
    want = torch.pixel_shuffle(torch.from_numpy(x.transpose(0, 3, 1, 2)), 2).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, atol=0)

    back = np.asarray(pixel_unshuffle(got, 2))
    np.testing.assert_allclose(back, x, atol=0)


@pytest.mark.parametrize("scale", [2, 3, 4])
@pytest.mark.parametrize("size", [(9, 13), (16, 16)])
def test_bicubic_matches_torch_upsample(scale, size):
    import torch

    from studiosr_tpu.ops import bicubic_resize

    x = np.random.default_rng(1).standard_normal((1, *size, 3), dtype=np.float32)
    got = np.asarray(bicubic_resize(x, size[0] * scale, size[1] * scale))
    want = (
        torch.nn.Upsample(scale_factor=scale, mode="bicubic")(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        .numpy()
        .transpose(0, 2, 3, 1)
    )
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)


def test_window_partition_reverse_roundtrip():
    import jax.numpy as jnp

    from studiosr_tpu.ops import window_partition, window_reverse

    x = np.random.default_rng(2).standard_normal((2, 16, 24, 5), dtype=np.float32)
    w = window_partition(jnp.asarray(x), 8)
    assert w.shape == (2 * 2 * 3, 8, 8, 5)
    back = np.asarray(window_reverse(w, 8, 16, 24))
    np.testing.assert_allclose(back, x)


@pytest.mark.skipif(not reference_available(), reason="reference repo not mounted")
def test_calculate_mask_matches_reference():
    from tests.reference_loader import load_reference

    from studiosr_tpu.ops import calculate_mask

    studiosr = load_reference()
    want = studiosr.models.common.calculate_mask((24, 32), 8, 4).numpy()
    got = calculate_mask((24, 32), 8, 4)
    np.testing.assert_allclose(got, want)


@pytest.mark.skipif(not reference_available(), reason="reference repo not mounted")
def test_relative_position_index_matches_reference():
    import torch

    from tests.reference_loader import load_reference

    from studiosr_tpu.ops import relative_position_index, relative_position_index_oca

    studiosr = load_reference()
    hat = studiosr.models.hat.HAT(scale=2, embed_dim=12, depths=[1], num_heads=[2], window_size=8)
    np.testing.assert_array_equal(relative_position_index(8), hat.calculate_rpi_sa().numpy())
    np.testing.assert_array_equal(relative_position_index_oca(8, 0.5), hat.calculate_rpi_oca().numpy())
