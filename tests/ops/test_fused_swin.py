"""Fused Pallas Swin block kernels + serving forward vs the linen/XLA path."""

import numpy as np
import pytest

from studiosr_tpu.models.swinir import SwinIR

SMALL = dict(embed_dim=16, depths=[2, 2], num_heads=[2, 2], window_size=8, mlp_ratio=2.0)


def test_fused_mlp_block_matches():
    import jax.numpy as jnp

    from studiosr_tpu.ops.pallas.swin_block import fused_mlp_block

    rng = np.random.default_rng(0)
    rows, c, hidden = 200, 16, 32
    x = rng.standard_normal((rows, c), dtype=np.float32)
    s, b = rng.standard_normal(c, dtype=np.float32), rng.standard_normal(c, dtype=np.float32)
    w1 = rng.standard_normal((c, hidden), dtype=np.float32) * 0.1
    b1 = rng.standard_normal(hidden, dtype=np.float32)
    w2 = rng.standard_normal((hidden, c), dtype=np.float32) * 0.1
    b2 = rng.standard_normal(c, dtype=np.float32)

    import jax

    x32 = x.astype(np.float32)
    mu = x32.mean(-1, keepdims=True)
    var = ((x32 - mu) ** 2).mean(-1, keepdims=True)
    ln = (x32 - mu) / np.sqrt(var + 1e-5) * s + b
    h = np.asarray(jax.nn.gelu(jnp.asarray(ln @ w1 + b1), approximate=False))
    want = x32 + h @ w2 + b2

    got = np.asarray(fused_mlp_block(jnp.asarray(x), s, b, w1, b1, w2, b2, block_rows=64, interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("size", [(16, 16), (24, 32), (33, 47)])
def test_fused_swinir_forward_matches_linen(size):
    model = SwinIR.build(scale=2, **SMALL)
    x = np.random.default_rng(0).standard_normal((1, *size, 3), dtype=np.float32)
    want = np.asarray(model(x))
    model.enable_fused(True)
    got = np.asarray(model(x))
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-4)


def test_fused_inference_uint8_contract():
    """model.inference through the fused path matches the linen path at the
    uint8 output level (round/clip parity)."""
    model = SwinIR.build(scale=2, **SMALL)
    image = np.random.default_rng(6).integers(0, 256, (20, 28, 3), dtype=np.uint8)
    want = model.inference(image)
    model.enable_fused(True)
    got = model.inference(image)
    # Rounding can flip on exact .5 boundaries; allow <=1 intensity step on
    # a tiny fraction of pixels.
    diff = np.abs(got.astype(int) - want.astype(int))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 0.01


def test_fused_swinir_batched_matches_linen():
    """Batched serving: fused kernels over batch > 1."""
    model = SwinIR.build(scale=2, **SMALL)
    x = np.random.default_rng(5).standard_normal((3, 16, 16, 3), dtype=np.float32)
    want = np.asarray(model(x))
    model.enable_fused(True)
    got = np.asarray(model(x))
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-4)


def test_fused_swinfir_forward_matches_linen():
    """SwinFIR's SFB residual connections through the serving path."""
    from studiosr_tpu.models.swinfir import SwinFIR

    model = SwinFIR.build(scale=2, **SMALL)
    x = np.random.default_rng(3).standard_normal((1, 16, 16, 3), dtype=np.float32)
    want = np.asarray(model(x))
    model.enable_fused(True)
    got = np.asarray(model(x))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("size", [(16, 16), (24, 40), (33, 47)])
def test_fused_hat_forward_matches_linen(size):
    from studiosr_tpu.models.hat import HAT

    model = HAT.build(scale=2, embed_dim=30, depths=[2], num_heads=[2], window_size=8, mlp_ratio=2.0)
    x = np.random.default_rng(4).standard_normal((1, *size, 3), dtype=np.float32)
    want = np.asarray(model(x))
    model.enable_fused(True)
    got = np.asarray(model(x))
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-4)


def test_fused_swinir_light_upsampler():
    model = SwinIR.build(scale=4, upsampler="pixelshuffledirect", **SMALL)
    x = np.random.default_rng(1).standard_normal((1, 16, 24, 3), dtype=np.float32)
    want = np.asarray(model(x))
    model.enable_fused(True)
    got = np.asarray(model(x))
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-4)


def test_fused_swinir_x4_tail_matches_linen():
    """Scale-4 path exercises the fused upsampler tail kernel."""
    model = SwinIR.build(scale=4, **SMALL)
    x = np.random.default_rng(3).standard_normal((1, 16, 16, 3), dtype=np.float32)
    want = np.asarray(model(x))
    model.enable_fused(True)
    got = np.asarray(model(x))
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-4)


def test_serving_prep_matches_in_trace_prep():
    """Load-time pre-laid weights (prepare_serving) must give the exact
    output of the in-trace weight layout (same helper functions build
    both), and the prep must be cached per (variables, dtype)."""
    import jax.numpy as jnp

    model = SwinIR.build(scale=4, **SMALL)
    model.enable_fused(True)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 3)), jnp.float32)

    want = np.asarray(model._jit_forward(model.variables, x))  # in-trace prep
    prep = model.serving_prep()
    assert prep is not None and prep["blocks"] and prep["convs"] and "tail" in prep
    got = np.asarray(model._jit_forward(model.variables, x, prep=prep))
    np.testing.assert_allclose(got, want, atol=2e-6, rtol=1e-6)
    assert model.serving_prep() is prep  # cached
    model.enable_fused(False)
    assert model.serving_prep() is None


def test_prep_threads_through_uint8_and_tiled_paths():
    """serving_prep must flow through forward_uint8, sharded_forward and
    inference_tiled (the paths tiled serving actually uses) and be
    output-identical to the in-trace layout."""
    import jax.numpy as jnp

    from studiosr_tpu.parallel.tiled import tiled_inference

    model = SwinIR.build(scale=4, **SMALL)
    model.enable_fused(True)
    prep = model.serving_prep()
    assert prep is not None
    rng = np.random.default_rng(11)
    img8 = rng.integers(0, 256, size=(1, 16, 16, 3), dtype=np.uint8)

    want = np.asarray(model._forward_uint8(model.variables, jnp.asarray(img8), sharded=False))
    got = np.asarray(model.forward_uint8(jnp.asarray(img8)))  # passes prep internally
    np.testing.assert_array_equal(got, want)

    wants = np.asarray(model._forward_sharded(model.variables, jnp.asarray(img8, jnp.float32) / 255.0))
    gots = np.asarray(model.sharded_forward(jnp.asarray(img8, jnp.float32) / 255.0))
    np.testing.assert_allclose(gots, wants, atol=2e-6, rtol=1e-6)

    big = rng.integers(0, 256, size=(40, 40, 3), dtype=np.uint8)
    for device_loop in (True, False):
        tiled = tiled_inference(model, big, tile=16, tile_overlap=4, device_loop=device_loop)
        assert tiled.shape == (160, 160, 3)


def test_hat_serving_prep_matches_in_trace_prep():
    """HAT's pre-laid weights (prepare_hat_serving: HAB attention, CAB,
    convs, OCAB, tail) must reproduce the in-trace layout exactly — at
    ws=8, which exercises the pair-embedded-bias prep branch."""
    import jax.numpy as jnp

    from studiosr_tpu.models.hat import HAT

    model = HAT.build(scale=2, embed_dim=30, depths=[2], num_heads=[2], window_size=8, mlp_ratio=2.0)
    model.enable_fused(True)
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.standard_normal((1, 24, 24, 3)), jnp.float32)

    want = np.asarray(model._jit_forward(model.variables, x))  # in-trace prep
    prep = model.serving_prep()
    assert prep is not None and prep["blocks"] and prep["cab"] and prep["ocab"]
    got = np.asarray(model._jit_forward(model.variables, x, prep=prep))
    np.testing.assert_allclose(got, want, atol=2e-6, rtol=1e-6)
    assert model.serving_prep() is prep  # cached


@pytest.mark.parametrize("direction", [1, -1])
def test_fused_swin_block_read_shift_equals_rolled(direction):
    """read_shift=±ws/2 must equal jnp.roll -> fused_swin_block(read_shift=0)
    at an ODD windows-per-row geometry (the bench class: 33 windows/row)."""
    import jax.numpy as jnp

    from studiosr_tpu.ops.pallas.swin_block import fused_swin_block, shift_fold_supported
    from studiosr_tpu.ops.windows import calculate_mask

    rng = np.random.default_rng(0)
    ws, heads, c = 8, 2, 32
    hgt = wdt = 3 * ws  # odd (3) windows per row — dummy-window pair path
    sh = ws // 2
    x = jnp.asarray(rng.standard_normal((1, hgt, wdt, c)), jnp.float32)
    assert shift_fold_supported(x.shape, heads, ws)

    n = ws * ws
    wargs = dict(
        ln1_scale=jnp.asarray(rng.standard_normal(c), jnp.float32),
        ln1_bias=jnp.asarray(rng.standard_normal(c), jnp.float32),
        wqkv=jnp.asarray(rng.standard_normal((c, 3 * c)) * 0.1, jnp.float32),
        bqkv=jnp.asarray(rng.standard_normal(3 * c), jnp.float32),
        wproj=jnp.asarray(rng.standard_normal((c, c)) * 0.1, jnp.float32),
        bproj=jnp.asarray(rng.standard_normal(c), jnp.float32),
        bias=jnp.asarray(rng.standard_normal((heads, n, n)) * 0.1, jnp.float32),
        ln2_scale=jnp.asarray(rng.standard_normal(c), jnp.float32),
        ln2_bias=jnp.asarray(rng.standard_normal(c), jnp.float32),
        w1=jnp.asarray(rng.standard_normal((c, 2 * c)) * 0.1, jnp.float32),
        b1=jnp.asarray(rng.standard_normal(2 * c), jnp.float32),
        w2=jnp.asarray(rng.standard_normal((2 * c, c)) * 0.1, jnp.float32),
        b2=jnp.asarray(rng.standard_normal(c), jnp.float32),
    )
    mask = jnp.asarray(calculate_mask((hgt, wdt), ws, sh)) if direction > 0 else None

    # reference: materialize the roll, run the aligned kernel
    # (read_shift=+s reads the map at +s, i.e. equals a pre-roll by -s)
    x_rolled = jnp.roll(x, (-direction * sh, -direction * sh), axis=(1, 2))
    want = fused_swin_block(
        x_rolled, mask=mask, heads=heads, window_size=ws, interpret=True, **wargs
    )
    assert want is not None

    got = fused_swin_block(
        x, mask=mask, heads=heads, window_size=ws,
        read_shift=direction * sh, interpret=True, **wargs
    )
    assert got is not None
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4)
