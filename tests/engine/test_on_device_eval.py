"""Chip-resident evaluation: SR + PSNR/SSIM in one program, scalar-only fetch.

The reference protocol fetches every SR image to host and scores with numpy
(``evaluator.py:53-79``); the on-device path must agree with that protocol
to <1e-4 dB while never moving an HR image off the chip.
"""

import os

import numpy as np
import pytest

FIXTURES = os.path.join(os.path.dirname(__file__), "..", "fixtures", "quality")

needs_fixture = pytest.mark.skipif(
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


@needs_fixture
def test_evaluate_uint8_matches_host_protocol():
    """model.evaluate_uint8 (one program, two scalars fetched) == host numpy
    protocol on trained-fixture images, across crop/y_only variants."""
    from studiosr_tpu.utils.metrics import compute_psnr, compute_ssim

    model, pairs = _load()
    for crop_border, y_only in [(2, True), (0, False)]:
        for lr, hr in pairs:
            sr = model.inference(lr)
            want_psnr = compute_psnr(sr, hr, crop_border=crop_border, y_only=y_only)
            want_ssim = compute_ssim(sr, hr, crop_border=crop_border, y_only=y_only)
            got_psnr, got_ssim = model.evaluate_uint8(
                lr, hr, crop_border=crop_border, y_only=y_only
            )
            assert abs(got_psnr - want_psnr) < 1e-4, (got_psnr, want_psnr)
            assert abs(got_ssim - want_ssim) < 1e-4, (got_ssim, want_ssim)


@needs_fixture
def test_evaluator_on_device_model_route(tmp_path):
    """Evaluator.run(model, on_device=True) takes the pair-program route
    (no Model.inference host fetch) and agrees with the host protocol."""
    from studiosr_tpu.engine.evaluator import Evaluator2
    from studiosr_tpu.utils.helpers import imwrite

    model, pairs = _load()

    # Build a synthetic Evaluator2-layout dataset from the fixture pairs.
    hr_dir = tmp_path / "HR"
    lr_dir = tmp_path / "LR_bicubic" / "X2"
    os.makedirs(hr_dir), os.makedirs(lr_dir)
    for i, (lr, hr) in enumerate(pairs):
        imwrite(str(hr_dir / f"img{i}.png"), hr)
        imwrite(str(lr_dir / f"img{i}.png"), lr)

    ev = Evaluator2.__new__(Evaluator2)
    ev.dataset, ev.scale, ev.root = "fixture", 2, str(tmp_path)
    from studiosr_tpu.data import PairedImageDataset

    ev.testset = PairedImageDataset(str(hr_dir), str(lr_dir))

    want = ev.run(model.inference)
    fetches = {"n": 0}
    orig = type(model).inference

    def counting_inference(self, image):
        fetches["n"] += 1
        return orig(self, image)

    type(model).inference = counting_inference
    try:
        got = ev.run(model, on_device=True)
    finally:
        type(model).inference = orig
    assert fetches["n"] == 0, "on-device route must not fetch SR images"
    assert abs(got[0] - want[0]) < 1e-4
    assert abs(got[1] - want[1]) < 1e-4


@needs_fixture
def test_trainer_evaluate_on_device_flag(tmp_path):
    """Trainer._eval_on_device: explicit flag wins; auto mode requires one of
    our evaluators (a custom evaluator only guarantees run(func))."""
    from studiosr_tpu.engine import Trainer
    from studiosr_tpu.engine.evaluator import Evaluator2
    from studiosr_tpu.models import EDSR

    class Pairs:
        def __len__(self):
            return 4

        def __getitem__(self, idx):
            rng = np.random.default_rng(idx)
            gt = rng.random((16, 16, 3), dtype=np.float32)
            return gt[::2, ::2], gt

    class CustomEvaluator:
        def run(self, func):
            return 1.0, 1.0

    model = EDSR.build(scale=2, n_feats=8, n_resblocks=1)
    t = Trainer(model, Pairs(), CustomEvaluator(), batch_size=2, max_iters=1,
                ckpt_path=str(tmp_path), bfloat16=False)
    assert t._eval_on_device() is False  # custom evaluator -> host route

    t.eval_on_device = True
    assert t._eval_on_device() is True

    ev = Evaluator2.__new__(Evaluator2)
    t2 = Trainer(model, Pairs(), ev, batch_size=2, max_iters=1,
                 ckpt_path=str(tmp_path), bfloat16=False, eval_on_device=False)
    assert t2._eval_on_device() is False  # explicit off wins on any backend


def test_evaluate_uint8_threads_fused_serving_path():
    """evaluate_uint8 on a fused-enabled model must run the SAME serving
    configuration as inference (fused kernels + pre-laid weights thread
    through the pair program), so eval scores exactly what serving ships."""
    import os

    import pytest

    from studiosr_tpu.utils.metrics import compute_psnr, compute_ssim

    ckpt = os.path.join(FIXTURES, "swinir_ckpt")
    if not os.path.exists(os.path.join(ckpt, "best.model.ckpt")):
        pytest.skip("swinir quality fixture not generated")
    from studiosr_tpu.utils.helpers import imread
    from studiosr_tpu.zoo.registry import load_model

    model = load_model(ckpt, "swinir", tag="best").enable_fused(True)
    lr = imread(os.path.join(FIXTURES, "img0_lrx4.png"))
    hr = imread(os.path.join(FIXTURES, "img0_hr.png"))
    sr = model.inference(lr)  # fused serving output (interpret mode on CPU)
    want_psnr = compute_psnr(sr, hr, crop_border=4, y_only=True)
    want_ssim = compute_ssim(sr, hr, crop_border=4, y_only=True)
    got_psnr, got_ssim = model.evaluate_uint8(lr, hr, crop_border=4, y_only=True)
    assert abs(got_psnr - want_psnr) < 1e-4, (got_psnr, want_psnr)
    assert abs(got_ssim - want_ssim) < 1e-4, (got_ssim, want_ssim)


@needs_fixture
def test_evaluate_uint8_scale_indivisible_gt():
    """Set14-at-x4 shape class: GT not divisible by the scale, so SR is
    smaller than GT — the in-program crop-to-equal must reproduce the host
    protocol (reference crops the same way, metrics.py there)."""
    from studiosr_tpu.utils.metrics import compute_psnr, compute_ssim

    model, pairs = _load()
    lr, hr = pairs[0]
    hr_odd = hr[: hr.shape[0] - 3, : hr.shape[1] - 1]  # SR will overhang
    sr = model.inference(lr)
    want_psnr = compute_psnr(sr, hr_odd, crop_border=2, y_only=True)
    want_ssim = compute_ssim(sr, hr_odd, crop_border=2, y_only=True)
    got_psnr, got_ssim = model.evaluate_uint8(lr, hr_odd, crop_border=2, y_only=True)
    assert abs(got_psnr - want_psnr) < 1e-4, (got_psnr, want_psnr)
    assert abs(got_ssim - want_ssim) < 1e-4, (got_ssim, want_ssim)


@needs_fixture
def test_evaluate_uint8_batch_matches_per_image_and_mesh():
    """Pod-shaped on-device eval (round-4 VERDICT item 7):
    evaluate_uint8_batch on a same-shape batch returns exactly the
    per-image evaluate_uint8 scores, both single-device and shard-mapped
    over the 8-device virtual mesh (image axis sharded)."""
    from studiosr_tpu.parallel.mesh import get_mesh

    model, pairs = _load()
    # same-shape batch of 8 (each fixture image repeated; mesh needs B % 8 == 0)
    lrs = np.stack([pairs[i % 3][0] for i in range(8)])
    hrs = np.stack([pairs[i % 3][1] for i in range(8)])

    want = [model.evaluate_uint8(lr, hr, crop_border=2) for lr, hr in zip(lrs, hrs)]
    want_psnr = np.array([w[0] for w in want])
    want_ssim = np.array([w[1] for w in want])

    got_psnr, got_ssim = model.evaluate_uint8_batch(lrs, hrs, crop_border=2)
    np.testing.assert_allclose(got_psnr, want_psnr, atol=1e-4)
    np.testing.assert_allclose(got_ssim, want_ssim, atol=1e-4)

    mesh = get_mesh()
    assert mesh.size == 8
    mesh_psnr, mesh_ssim = model.evaluate_uint8_batch(lrs, hrs, crop_border=2, mesh=mesh)
    np.testing.assert_allclose(mesh_psnr, got_psnr, atol=1e-6)
    np.testing.assert_allclose(mesh_ssim, got_ssim, atol=1e-6)
