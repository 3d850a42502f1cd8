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



def _load_fixture_pairs(ckpt_dir, model_name, lr_suffix, mod_crop=1):
    """Load a trained fixture model + its (lr, hr) image pairs."""
    from studiosr_tpu.utils.helpers import imread
    from studiosr_tpu.zoo.registry import load_model

    model = load_model(ckpt_dir, model_name, tag="best")
    pairs = []
    for i in range(3):
        hr = imread(os.path.join(FIXTURES, f"img{i}_hr.png"))
        if mod_crop > 1:  # mod-crop like the fixture generator
            hr = hr[: hr.shape[0] // mod_crop * mod_crop, : hr.shape[1] // mod_crop * mod_crop]
        lr = imread(os.path.join(FIXTURES, f"img{i}{lr_suffix}.png"))
        pairs.append((lr, hr))
    return model, pairs


def _assert_fused_quality_floors(load):
    """The shared trained-weights floor protocol for every fused serving
    component: plain f32 beats bicubic (+0.3 dB); fused f32 matches plain
    (<0.05 dB — same math in Pallas kernels, interpret mode on CPU); fused
    bf16 still beats bicubic (+0.2) and stays within 0.5 dB of f32
    (quantization noise). ``load()`` returns (model, pairs)."""
    from studiosr_tpu.utils.metrics import compute_psnr

    model, pairs = load()
    for lr, hr in pairs:
        plain = compute_psnr(model.inference(lr), hr)
        bicubic = compute_psnr(_bicubic_up(lr, *hr.shape[:2]), hr)
        assert plain > bicubic + 0.3, f"plain {plain:.2f} vs bicubic {bicubic:.2f}"

        model.enable_fused(True)
        fused = compute_psnr(model.inference(lr), hr)
        model.enable_fused(False)
        assert abs(fused - plain) < 0.05, f"fused {fused:.2f} vs plain {plain:.2f}"

        model.half().enable_fused(True)
        bf16 = compute_psnr(model.inference(lr), hr)
        assert bf16 > bicubic + 0.2, f"bf16 {bf16:.2f} vs bicubic {bicubic:.2f}"
        assert abs(bf16 - plain) < 0.5, f"bf16 {bf16:.2f} vs plain {plain:.2f}"
        model, _ = load()  # restore f32 weights for the next image


SWINIR_CKPT = os.path.join(FIXTURES, "swinir_ckpt")

swinir_fixture = pytest.mark.skipif(
    not os.path.exists(os.path.join(SWINIR_CKPT, "best.model.ckpt")),
    reason="swinir quality fixture not generated",
)


def _load_swinir():
    return _load_fixture_pairs(SWINIR_CKPT, "swinir", "_lrx4")


@swinir_fixture
def test_swinir_trained_fused_paths_quality():
    """Trained-weights PSNR floors through the configurations actually
    benched (VERDICT round-2 item 3): plain f32, fused f32, fused bf16 —
    the fused path on trained weights must beat bicubic and stay within a
    small delta of the plain path (_assert_fused_quality_floors)."""
    _assert_fused_quality_floors(_load_swinir)


HAT_CKPT = os.path.join(FIXTURES, "hat_ckpt")

hat_fixture = pytest.mark.skipif(
    not os.path.exists(os.path.join(HAT_CKPT, "best.model.ckpt")),
    reason="hat quality fixture not generated",
)


@hat_fixture
def test_hat_trained_fused_paths_quality():
    """Trained-weights PSNR floors for the second flagship through its
    benched configurations: plain f32, fused serving path (hat_fast_forward
    — CAB trunk + window attention + OCAB), and fused bf16."""
    _assert_fused_quality_floors(lambda: _load_fixture_pairs(HAT_CKPT, "hat", "_lrx4"))


@swinir_fixture
def test_swinir_trained_tiled_fused_matches_whole():
    """Tiled fused inference holds quality: overlap-discard tiling is
    approximate for window attention (the receptive field spans tiles), so
    assert PSNR-level equivalence rather than pixel equality."""
    from studiosr_tpu.utils.metrics import compute_psnr

    model, pairs = _load_swinir()
    model.enable_fused(True)
    lr, hr = pairs[1]
    psnr_whole = compute_psnr(model.inference(lr), hr)
    tiled = model.inference_tiled(lr, tile=24, tile_overlap=8, tile_batch=4)
    psnr_tiled = compute_psnr(tiled, hr)
    assert psnr_tiled > psnr_whole - 0.5, f"tiled {psnr_tiled:.2f} vs whole {psnr_whole:.2f}"


MAXSR_CKPT = os.path.join(FIXTURES, "maxsr_ckpt")

maxsr_fixture = pytest.mark.skipif(
    not os.path.exists(os.path.join(MAXSR_CKPT, "best.model.ckpt")),
    reason="maxsr quality fixture not generated",
)


@maxsr_fixture
def test_maxsr_trained_fused_paths_quality():
    """Trained-weights PSNR floors for MaxSR through its benched
    configurations: plain f32, the fused Pallas attention path
    (``enable_fused(True)`` routes all block/grid attention pairs through
    window_attention_pallas), and fused bf16. Also the only trained-weights
    check of the MBConv batch_stats round-trip through the registry."""
    import jax as _jax

    load = lambda: _load_fixture_pairs(MAXSR_CKPT, "maxsr", "_lrx4")
    model, _ = load()
    leaves = _jax.tree_util.tree_leaves(model.variables.get("batch_stats", {}))
    assert leaves and any(not np.allclose(np.asarray(l), 0) for l in leaves), "batch_stats not restored"
    _assert_fused_quality_floors(load)


SWINFIR_CKPT = os.path.join(FIXTURES, "swinfir_ckpt")

swinfir_fixture = pytest.mark.skipif(
    not os.path.exists(os.path.join(SWINFIR_CKPT, "best.model.ckpt")),
    reason="swinfir quality fixture not generated",
)


@swinfir_fixture
def test_swinfir_trained_fused_paths_quality():
    """Trained-weights PSNR floors for SwinFIR: the fused serving path runs
    the SwinIR block kernels PLUS the MXU-DFT spectral branch (SFB) — this
    is the only trained-weights check of the DFT formulation."""
    _assert_fused_quality_floors(lambda: _load_fixture_pairs(SWINFIR_CKPT, "swinfir", "_lrx4"))


def _swinir_s_ckpt(scale):
    return os.path.join(FIXTURES, f"swinir_x{scale}_ckpt")


@pytest.mark.parametrize("scale", [2, 3])
def test_swinir_trained_fused_tail_quality_x2_x3(scale):
    """Trained-weights PSNR floors at x2/x3: the single-shuffle fused tails
    (ops/pallas/upsampler.fused_upsample_s) on the serving path — x4 covers
    only the three-conv quadrant-planar tail, so these pin the other two
    driver quality scales."""
    ckpt = _swinir_s_ckpt(scale)
    if not os.path.exists(os.path.join(ckpt, "best.model.ckpt")):
        pytest.skip(f"swinir x{scale} quality fixture not generated")
    _assert_fused_quality_floors(
        lambda: _load_fixture_pairs(ckpt, "swinir", f"_lrx{scale}", mod_crop=scale)
    )


@pytest.mark.parametrize("scale", [2, 3])
def test_hat_trained_fused_tail_quality_x2_x3(scale):
    """Trained-weights PSNR floors for HAT at x2/x3: hat_fast's
    scale-dependent tail/prep selection through the single-shuffle fused
    tail (the x4 fixture covers only the quadrant-planar tail)."""
    ckpt = os.path.join(FIXTURES, f"hat_x{scale}_ckpt")
    if not os.path.exists(os.path.join(ckpt, "best.model.ckpt")):
        pytest.skip(f"hat x{scale} quality fixture not generated")
    _assert_fused_quality_floors(
        lambda: _load_fixture_pairs(ckpt, "hat", f"_lrx{scale}", mod_crop=scale)
    )


@pytest.mark.parametrize(
    "name,subdir,lr_suffix",
    [
        ("rcan", "rcan_ckpt", "_lrx4"),
        ("imdn", "imdn_ckpt", "_lrx4"),
        # round 5: the remaining conv/zoo families (round-4 VERDICT item 1 —
        # 12/12 trained-quality matrix; reference zoo paths edsr.py:77-112,
        # han.py:145-158, vdsr.py:75-93)
        ("edsr", "edsr_ckpt", "_lrx4"),
        ("han", "han_ckpt", "_lrx4"),
        # the reference zoo uniquely ships a scale-8 HAN (han.py:148) —
        # trained floor for the conv-family log2 ladder at x8
        ("han", "han_x8_ckpt", "_lrx8"),
        ("srresnet", "srresnet_ckpt", "_lrx4"),
        ("vdsr", "vdsr_ckpt", "_lrx2"),
        ("srcnn", "srcnn_ckpt", "_lrx2"),
    ],
)
def test_conv_trained_quality_floors(name, subdir, lr_suffix):
    """Trained-weights PSNR floors for the conv families' linen/XLA serving
    path: plain f32 beats bicubic by >2 dB; bf16 serving stays within
    0.5 dB of f32 and still clearly beats bicubic. HAN runs through the
    default banded CSAM gate (trained-weight evidence for the round-3
    reformulation); SRResNet restores batch_stats through the registry."""
    from studiosr_tpu.utils.metrics import compute_psnr

    ckpt = os.path.join(FIXTURES, subdir)
    if not os.path.exists(os.path.join(ckpt, "best.model.ckpt")):
        pytest.skip(f"{name} quality fixture not generated")
    model, pairs = _load_fixture_pairs(ckpt, name, lr_suffix)
    if name == "srresnet":  # the one conv family with BatchNorm stats
        import jax as _jax

        leaves = _jax.tree_util.tree_leaves(model.variables.get("batch_stats", {}))
        assert leaves and any(not np.allclose(np.asarray(l), 0) for l in leaves), (
            "batch_stats not restored"
        )
    for lr, hr in pairs:
        plain = compute_psnr(model.inference(lr), hr)
        bicubic = compute_psnr(_bicubic_up(lr, *hr.shape[:2]), hr)
        assert plain > bicubic + 2.0, f"plain {plain:.2f} vs bicubic {bicubic:.2f}"

    model.half()
    for lr, hr in pairs:
        bf16 = compute_psnr(model.inference(lr), hr)
        bicubic = compute_psnr(_bicubic_up(lr, *hr.shape[:2]), hr)
        assert bf16 > bicubic + 1.5, f"bf16 {bf16:.2f} vs bicubic {bicubic:.2f}"


def test_han_trained_csam_formulations_agree():
    """The banded-CSAM reformulation (models/han.py CSAM_IMPL='banded', the
    round-3 2x serving win) on TRAINED weights: banded and stencil gates
    must produce near-identical outputs with a trained (nonzero-gamma)
    checkpoint — the random-kernel equivalence test can't see a trained
    gate, and the golden parity test can't see the gate at all (gamma
    inits to 0)."""
    from studiosr_tpu.models import han as han_mod
    from studiosr_tpu.utils.metrics import compute_psnr

    ckpt = os.path.join(FIXTURES, "han_ckpt")
    if not os.path.exists(os.path.join(ckpt, "best.model.ckpt")):
        pytest.skip("han quality fixture not generated")
    orig = han_mod.CSAM_IMPL
    try:
        # Fresh model (fresh jit) per formulation: jit caches trace-time
        # branches, so flipping the flag on a live model would silently
        # reuse the stale trace (CLAUDE.md round-3 session-2 lesson).
        han_mod.CSAM_IMPL = "banded"
        model, pairs = _load_fixture_pairs(ckpt, "han", "_lrx4")
        lr, hr = pairs[0]
        banded = model.inference(lr)
        han_mod.CSAM_IMPL = "stencil"
        model, _ = _load_fixture_pairs(ckpt, "han", "_lrx4")
        stencil = model.inference(lr)
    finally:
        han_mod.CSAM_IMPL = orig
    diff = np.abs(banded.astype(int) - stencil.astype(int))
    assert diff.max() <= 1, diff.max()  # f32 op-order rounding only
    assert abs(compute_psnr(banded, hr) - compute_psnr(stencil, hr)) < 0.01


def test_swinir_x8_trained_quality_floors():
    """Trained-weights floors at scale 8 (round-4 VERDICT item 5): the
    log2-ladder tail through plain / fused(-declining) / bf16 paths — the
    fused path records the tail decline but must hold the same quality."""
    ckpt = os.path.join(FIXTURES, "swinir_x8_ckpt")
    if not os.path.exists(os.path.join(ckpt, "best.model.ckpt")):
        pytest.skip("swinir x8 quality fixture not generated")
    _assert_fused_quality_floors(
        lambda: _load_fixture_pairs(ckpt, "swinir", "_lrx8", mod_crop=8)
    )
