"""Offline pretrained-path quality assertion (no network).

Uses the committed fixture (tests/fixtures/quality/): three structured
images + a genuinely trained ESPCN x2 checkpoint saved through the registry
scheme (scripts/make_quality_fixture.py). Exercises the full pretrained
path — ``zoo.load_model`` (params.json + msgpack restore), the uint8 numpy
inference contract, self-ensemble and tiled inference — and asserts a PSNR
floor above bicubic, so the quality path is tested even where the
network-gated real-zoo tests (test_pretrained.py) skip. Mirrors what the
reference leaves skipped (tests/models/test_swinir.py:29-38 there).
"""

import os

import numpy as np
import pytest

FIXTURES = os.path.join(os.path.dirname(__file__), "..", "fixtures", "quality")

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(FIXTURES, "ckpt", "best.model.ckpt")),
    reason="quality fixture not generated",
)


def _load():
    from studiosr_tpu.utils.helpers import imread
    from studiosr_tpu.zoo.registry import load_model

    model = load_model(os.path.join(FIXTURES, "ckpt"), "espcn", tag="best")
    pairs = []
    for i in range(3):
        hr = imread(os.path.join(FIXTURES, f"img{i}_hr.png"))
        lr = imread(os.path.join(FIXTURES, f"img{i}_lr.png"))
        pairs.append((lr, hr))
    return model, pairs


def _bicubic_up(lr, h, w):
    import jax.numpy as jnp

    from studiosr_tpu.ops.resize import bicubic_resize

    up = np.asarray(bicubic_resize(jnp.asarray(lr.astype(np.float32) / 255.0)[None], h, w))[0]
    return np.clip(np.round(up * 255.0), 0, 255).astype(np.uint8)


def test_pretrained_checkpoint_beats_bicubic():
    from studiosr_tpu.utils.metrics import compute_psnr

    model, pairs = _load()
    for lr, hr in pairs:
        sr = model.inference(lr)
        assert sr.shape == hr.shape and sr.dtype == np.uint8
        psnr_sr = compute_psnr(sr, hr)
        psnr_bi = compute_psnr(_bicubic_up(lr, *hr.shape[:2]), hr)
        # trained checkpoint must clearly beat bicubic on every image
        assert psnr_sr > psnr_bi + 1.0, f"SR {psnr_sr:.2f} vs bicubic {psnr_bi:.2f}"
        assert psnr_sr > 30.0, f"absolute floor: {psnr_sr:.2f}"


def test_pretrained_self_ensemble_at_least_as_good():
    from studiosr_tpu.utils.metrics import compute_psnr

    model, pairs = _load()
    lr, hr = pairs[0]
    base = compute_psnr(model.inference(lr), hr)
    tta = compute_psnr(model.inference_with_self_ensemble(lr), hr)
    assert tta > base - 0.1


def test_pretrained_tiled_matches_whole_image():
    model, pairs = _load()
    lr, hr = pairs[1]
    whole = model.inference(lr)
    tiled = model.inference_tiled(lr, tile=32, tile_overlap=8, tile_batch=4)
    diff = np.abs(whole.astype(int) - tiled.astype(int))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 0.01
