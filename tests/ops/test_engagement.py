"""Fused kernels must ENGAGE at the driver benchmark geometry.

Round 2's costliest bug: every fused kernel silently fell back at the actual
bench shape (the eval flip-padding grows a 256 input to a 264x264 map with an
ODD 33 windows/row) and the callers quietly took XLA (STATUS.md). These tests
pin each fused serving component as ENGAGED at exactly that geometry — tracing
only (jax.eval_shape), no compile, so they run on the CPU suite.

Counter semantics: engagement records fire when the kernel wrapper's Python
body runs, which jit caching can skip — hence reset() + jax.clear_caches()
before each trace.
"""

import jax
import numpy as np
import pytest

from studiosr_tpu.ops.pallas import engagement


def _trace_engagement(forward, variables, x_shape, dtype, config):
    engagement.reset()
    jax.clear_caches()
    x = jax.ShapeDtypeStruct(x_shape, dtype)
    jax.eval_shape(lambda v, a: forward(v, a, config), variables, x)
    return engagement.counters()


def _assert_engaged(counts, names):
    problems = []
    for name in names:
        rec = counts.get(name, {})
        if not rec.get("engaged"):
            problems.append(f"{name}: never engaged ({rec})")
        if rec.get("fallback"):
            problems.append(f"{name}: fell back — {rec.get('reason')}")
    assert not problems, "; ".join(problems) + f"; all counters: {counts}"


def test_swinir_fused_engaged_at_bench_shape():
    """SwinIR classical x4, 256x256 LR input (bench.py protocol): the
    264x264 flip-padded map must run the whole-block kernel, the streaming
    convs, and the fused x4 tail — no silent fallback anywhere."""
    import jax.numpy as jnp

    from studiosr_tpu.models.swinir import SwinIR
    from studiosr_tpu.serving import swinir_fast_forward

    model = SwinIR.build(scale=4, fast_init=True).half()
    counts = _trace_engagement(
        swinir_fast_forward, model.variables, (1, 256, 256, 3), jnp.bfloat16, model.config
    )
    _assert_engaged(
        counts,
        ["fused_swin_block", "swin_shift_fold", "fused_conv3x3", "fused_upsample_x4", "mask_rows2"],
    )
    # The whole-block kernel subsumes the split kernels: the split attention
    # kernel engaging would mean the whole-block kernel fell back somewhere.
    assert "fused_window_attention_block" not in counts, counts


def test_hat_fused_engaged_at_bench_shape():
    """HAT x4 at 256x256 (scripts/bench_models.py shape): CAB trunk kernel,
    ws=16 attention, MLP, OCAB, streaming convs, fused tail all engaged."""
    import jax.numpy as jnp

    from studiosr_tpu.models.hat import HAT
    from studiosr_tpu.serving.hat_fast import hat_fast_forward

    model = HAT.build(scale=4, fast_init=True).half()
    counts = _trace_engagement(
        hat_fast_forward, model.variables, (1, 256, 256, 3), jnp.bfloat16, model.config
    )
    _assert_engaged(
        counts,
        [
            "fused_cab_body",
            "fused_window_attention_block",
            "fused_mlp_block",
            "fused_ocab_block",
            "fused_conv3x3",
            "fused_upsample_x4",
            "mask_cls4",
        ],
    )


def test_fused_engaged_with_serving_prep_at_bench_shape():
    """The load-time pre-layout path must engage the SAME kernels at bench
    geometry: a layout mismatch on pre-laid weights would silently fall back
    to XLA with bit-identical outputs (only slower) — the round-2 failure
    mode, now possible on a second code path."""
    import jax.numpy as jnp

    from studiosr_tpu.models.hat import HAT
    from studiosr_tpu.models.swinir import SwinIR
    from studiosr_tpu.serving import swinir_fast_forward
    from studiosr_tpu.serving.hat_fast import hat_fast_forward

    cases = (
        (
            SwinIR,
            swinir_fast_forward,
            ["fused_swin_block", "swin_shift_fold", "fused_conv3x3", "fused_upsample_x4", "mask_rows2"],
        ),
        (
            HAT,
            hat_fast_forward,
            [
                "fused_cab_body",
                "fused_window_attention_block",
                "fused_mlp_block",
                "fused_ocab_block",
                "fused_conv3x3",
                "fused_upsample_x4",
                "mask_cls4",
            ],
        ),
    )
    for cls, forward, names in cases:
        model = cls.build(scale=4, fast_init=True).half().enable_fused(True)
        prep = model.serving_prep()
        assert prep is not None, cls.__name__
        engagement.reset()
        jax.clear_caches()
        x = jax.ShapeDtypeStruct((1, 256, 256, 3), jnp.bfloat16)
        jax.eval_shape(
            lambda v, a, p, forward=forward, config=model.config: forward(v, a, config, prep=p),
            model.variables, x, prep,
        )
        _assert_engaged(engagement.counters(), names)


def test_maxsr_fused_attention_engaged_at_bench_shape():
    """MaxSR adaptive x4 at 256x256 (sweep shape): with enable_fused on,
    all 32 attention pairs route through the fused Pallas attention kernel
    (VMEM-resident scores — the XLA path's HBM f32 score maps were ~60 of
    127 ms). The round-4 alternatives (map-level fused blocks, fused-MLP
    feed-forward) measured decisively slower and default OFF; see
    STATUS.md round-4 MaxSR verdicts."""
    import jax.numpy as jnp

    from studiosr_tpu.models.maxsr import MaxSR

    model = MaxSR.build(scale=4, fast_init=True).half().enable_fused(True)
    engagement.reset()
    jax.clear_caches()
    x = jax.ShapeDtypeStruct((1, 256, 256, 3), jnp.bfloat16)
    jax.eval_shape(lambda v, a: model._forward(v, a), model.variables, x)
    counts = engagement.counters()
    _assert_engaged(counts, ["window_attention_pallas"])
    assert counts["window_attention_pallas"]["engaged"] == 32, counts


def test_fallback_is_recorded_and_strict_raises():
    """The fallback path is loud: counters record it, strict mode raises."""
    import jax.numpy as jnp

    from studiosr_tpu.ops.pallas.upsampler import fused_upsample_x4

    engagement.reset()
    jax.clear_caches()
    cin = 64
    # 7x7 spatial: no valid tile -> guaranteed fallback.
    args = (
        jax.ShapeDtypeStruct((1, 7, 7, cin), jnp.float32),
        jax.ShapeDtypeStruct((3, 3, cin, 4 * cin), jnp.float32),
        jax.ShapeDtypeStruct((4 * cin,), jnp.float32),
        jax.ShapeDtypeStruct((3, 3, cin, 4 * cin), jnp.float32),
        jax.ShapeDtypeStruct((4 * cin,), jnp.float32),
        jax.ShapeDtypeStruct((3, 3, cin, 3), jnp.float32),
        jax.ShapeDtypeStruct((3,), jnp.float32),
    )
    out = jax.eval_shape(fused_upsample_x4, *args)
    assert out is None
    rec = engagement.counters()["fused_upsample_x4"]
    assert rec["fallback"] == 1 and "reason" in rec

    engagement.set_strict(True)
    try:
        jax.clear_caches()
        with pytest.raises(engagement.KernelFallback):
            jax.eval_shape(fused_upsample_x4, *args)
    finally:
        engagement.set_strict(False)


def test_attention_block_fallback_on_non_window_multiple():
    """fused_window_attention_block declines (None + recorded fallback) when
    H or W is not a window multiple — without the guard the grid would
    silently leave the trailing rows/cols of the output unwritten."""
    import jax.numpy as jnp

    from studiosr_tpu.ops.pallas.swin_block import fused_window_attention_block

    engagement.reset()
    jax.clear_caches()
    c, heads, ws = 32, 2, 8
    n = ws * ws
    args = (
        jax.ShapeDtypeStruct((1, 20, 24, c), jnp.float32),  # H=20 not %8
        jax.ShapeDtypeStruct((c,), jnp.float32),
        jax.ShapeDtypeStruct((c,), jnp.float32),
        jax.ShapeDtypeStruct((c, 3 * c), jnp.float32),
        jax.ShapeDtypeStruct((3 * c,), jnp.float32),
        jax.ShapeDtypeStruct((c, c), jnp.float32),
        jax.ShapeDtypeStruct((c,), jnp.float32),
        jax.ShapeDtypeStruct((heads, n, n), jnp.float32),
        None,
    )
    out = jax.eval_shape(fused_window_attention_block, *args, heads=heads, window_size=ws)
    assert out is None
    rec = engagement.counters()["fused_window_attention_block"]
    assert rec["fallback"] == 1 and "reason" in rec


def test_training_backward_kernels_engage_at_driver_shape():
    """The Pallas attention-backward kernels must ENGAGE at the driver's
    training geometry (batch 32, 64px crops): SwinIR ws=8/180ch via the pair
    kernel, HAT ws=16/180ch via v5, MaxSR ws=8/128ch via the pair kernel
    (block and grid attention share it via the shuffle identity) — the
    silent-fallback class that cost round 2 applies to training shapes too."""
    import jax.numpy as jnp

    from studiosr_tpu.ops.pallas.attn_bwd import pairs_attention_bwd, v5_attention_bwd

    b, hw = 32, 64
    arr = lambda *s: jax.ShapeDtypeStruct(s, jnp.float32)
    for fn, heads, ws, c, name in (
        (pairs_attention_bwd, 6, 8, 180, "pairs_attention_bwd"),
        (v5_attention_bwd, 6, 16, 180, "v5_attention_bwd"),
        (pairs_attention_bwd, 4, 8, 128, "pairs_attention_bwd"),
    ):
        n = ws * ws
        engagement.reset()
        jax.clear_caches()
        out = jax.eval_shape(
            lambda xx, gg, s, bb, wq, bq, wp, bp, bias, fn=fn, heads=heads, ws=ws: fn(
                xx, gg, s, bb, wq, bq, wp, bp, bias, None, None, heads=heads, window_size=ws
            ),
            arr(b, hw, hw, c), arr(b, hw, hw, c), arr(c), arr(c),
            arr(c, 3 * c), arr(3 * c), arr(c, c), arr(c), arr(heads, n, n),
        )
        assert out is not None, f"{name} fell back at the driver training shape"
        assert engagement.counters()[name]["engaged"] >= 1


def test_engaged_is_recorded_small_shape():
    """Engagement records on a small CPU-friendly shape (8-divisible)."""
    import jax.numpy as jnp

    from studiosr_tpu.ops.pallas.conv3x3 import fused_conv3x3

    engagement.reset()
    jax.clear_caches()
    jax.eval_shape(
        fused_conv3x3,
        jax.ShapeDtypeStruct((1, 16, 16, 8), jnp.float32),
        jax.ShapeDtypeStruct((3, 3, 8, 8), jnp.float32),
        jax.ShapeDtypeStruct((8,), jnp.float32),
    )
    assert engagement.counters()["fused_conv3x3"]["engaged"] == 1


def test_swinir_fused_engaged_at_prime_window_count():
    """Arbitrary eval sizes reach layouts with no nice chunk divisor: a 322
    input flip-pads to a 328 map = 41 windows/row (prime), forcing the
    chunk-1 pair path (shift folding unsupported there — XLA rolls return,
    but the block kernels must still engage, not silently fall back)."""
    import jax.numpy as jnp

    from studiosr_tpu.models.swinir import SwinIR
    from studiosr_tpu.serving import swinir_fast_forward

    model = SwinIR.build(scale=4, fast_init=True).half()
    counts = _trace_engagement(
        swinir_fast_forward, model.variables, (1, 322, 322, 3), jnp.bfloat16, model.config
    )
    _assert_engaged(counts, ["fused_swin_block", "fused_conv3x3"])


def test_swinir_x2_x3_fused_tails_engaged():
    """The new single-shuffle tails must engage at the x2/x3 driver quality
    scales (264x264 flip-padded map)."""
    import jax.numpy as jnp

    from studiosr_tpu.models.swinir import SwinIR
    from studiosr_tpu.serving import swinir_fast_forward

    for scale in (2, 3):
        model = SwinIR.build(scale=scale, fast_init=True).half()
        counts = _trace_engagement(
            swinir_fast_forward, model.variables, (1, 256, 256, 3), jnp.bfloat16, model.config
        )
        _assert_engaged(counts, ["fused_swin_block", "fused_conv3x3", "fused_upsample_s"])


def test_swinir_light_fused_engaged():
    """SwinIR-light (the x4 zoo variant: dim 60, depths [6]x4,
    pixelshuffledirect) must engage the block kernels at the eval shape."""
    import jax.numpy as jnp

    from studiosr_tpu.models.swinir import SwinIR
    from studiosr_tpu.serving import swinir_fast_forward

    model = SwinIR.build(
        scale=4, embed_dim=60, depths=[6] * 4, num_heads=[6] * 4,
        window_size=8, mlp_ratio=2.0, upsampler="pixelshuffledirect",
        fast_init=True,
    ).half()
    counts = _trace_engagement(
        swinir_fast_forward, model.variables, (1, 256, 256, 3), jnp.bfloat16, model.config
    )
    _assert_engaged(counts, ["fused_swin_block"])


def test_swinfir_fused_engaged_at_bench_shape():
    """SwinFIR classical x4 at the sweep shape (256x256 LR -> 264x264 map):
    whole-block kernels, the streaming SFB spatial-branch convs, and the
    fused x4 tail all engage (the MXU-DFT spectral path is jnp einsums —
    covered by tests/ops/test_dft.py, no Pallas counter)."""
    import jax.numpy as jnp

    from studiosr_tpu.models.swinfir import SwinFIR
    from studiosr_tpu.serving import swinir_fast_forward

    model = SwinFIR.build(scale=4, fast_init=True).half()
    counts = _trace_engagement(
        swinir_fast_forward, model.variables, (1, 256, 256, 3), jnp.bfloat16, model.config
    )
    _assert_engaged(
        counts, ["fused_swin_block", "swin_shift_fold", "fused_resblock", "fused_upsample_x4", "mask_rows2"]
    )
    assert "fused_window_attention_block" not in counts, counts


def test_swinir_x8_fused_tail_declines_cleanly():
    """Scale 8 has no fused tail (log2-ladder, reference common.py:130-133):
    fused serving must record the decline LOUDLY (round-4 VERDICT weak #5)
    while the block kernels still engage, and the declined path must match
    the plain linen forward pixel-exactly on the uint8 contract."""
    import jax.numpy as jnp

    from studiosr_tpu.models.swinir import SwinIR
    from studiosr_tpu.serving import swinir_fast_forward

    model = SwinIR.build(
        scale=8, embed_dim=32, depths=[2, 2], num_heads=[2, 2], window_size=8,
        fast_init=True,
    ).half()
    counts = _trace_engagement(
        swinir_fast_forward, model.variables, (1, 64, 64, 3), jnp.bfloat16, model.config
    )
    _assert_engaged(counts, ["fused_swin_block"])
    rec = counts.get("fused_upsample_tail", {})
    assert rec.get("fallback"), f"x8 tail decline not recorded: {counts}"
    assert "log2-ladder" in rec.get("reason", "")
    # Structural (by-design) decline: strict mode must NOT raise — no
    # kernel exists for s=8, so this is not a layout regression.
    from studiosr_tpu.ops.pallas import engagement
    engagement.set_strict(True)
    try:
        engagement.reset()
        jax.clear_caches()
        jax.eval_shape(
            lambda v, a: swinir_fast_forward(v, a, model.config),
            model.variables, jax.ShapeDtypeStruct((1, 64, 64, 3), jnp.bfloat16),
        )
    finally:
        engagement.set_strict(False)
    # No fused tail may have engaged at s=8.
    for name in ("fused_upsample_x4", "fused_upsample_s"):
        assert not counts.get(name, {}).get("engaged"), counts

    # Declined-tail fused serving == plain path, pixel-exact on uint8.
    model_f32 = SwinIR.build(
        scale=8, embed_dim=32, depths=[2, 2], num_heads=[2, 2], window_size=8,
    )
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    plain = model_f32.inference(img)
    fused = model_f32.enable_fused(True).inference(img)
    assert plain.shape == (192, 192, 3)
    # Same math, different op order (fused block kernels feed the same XLA
    # ladder): f32 rounding may flip the uint8 LSB on isolated pixels.
    diff = np.abs(plain.astype(int) - fused.astype(int))
    assert diff.max() <= 1 and (diff > 0).mean() < 0.001, (
        diff.max(), (diff > 0).mean())


def test_swinir_fused_engaged_at_batch8_bench_shape():
    """Batch-8 is the recommended throughput serving point (round-5 batched
    table: 1.708 MP/s >= b1): the whole-block kernel, streaming convs, and
    the fused tail must all still ENGAGE with the batch riding the grid at
    the bench geometry — a silent b>1 fallback would make the batched
    recommendation serve XLA."""
    import jax.numpy as jnp

    from studiosr_tpu.models.swinir import SwinIR
    from studiosr_tpu.serving import swinir_fast_forward

    model = SwinIR.build(scale=4, fast_init=True).half()
    counts = _trace_engagement(
        swinir_fast_forward, model.variables, (8, 256, 256, 3), jnp.bfloat16, model.config
    )
    _assert_engaged(
        counts,
        ["fused_swin_block", "swin_shift_fold", "fused_conv3x3", "fused_upsample_x4", "mask_rows2"],
    )


def test_hat_x8_fused_tail_declines_cleanly():
    """HAT at scale 8 (no fused tail — log2 ladder): hat_fast must record
    the structural decline like swinir_fast, with the block kernels still
    engaged, and match the plain path within 1 uint8 LSB."""
    import jax.numpy as jnp

    from studiosr_tpu.models.hat import HAT
    from studiosr_tpu.serving.hat_fast import hat_fast_forward

    model = HAT.build(
        scale=8, embed_dim=32, depths=[2, 2], num_heads=[2, 2], window_size=8,
        fast_init=True,
    ).half()
    counts = _trace_engagement(
        hat_fast_forward, model.variables, (1, 64, 64, 3), jnp.bfloat16, model.config
    )
    _assert_engaged(counts, ["fused_window_attention_block", "fused_cab_body"])
    rec = counts.get("fused_upsample_tail", {})
    assert rec.get("fallback"), f"x8 tail decline not recorded: {counts}"
    assert "log2-ladder" in rec.get("reason", "")

    model_f32 = HAT.build(
        scale=8, embed_dim=32, depths=[2, 2], num_heads=[2, 2], window_size=8,
    )
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    plain = model_f32.inference(img)
    fused = model_f32.enable_fused(True).inference(img)
    assert plain.shape == (192, 192, 3)
    diff = np.abs(plain.astype(int) - fused.astype(int))
    assert diff.max() <= 1 and (diff > 0).mean() < 0.001, (
        diff.max(), (diff > 0).mean())
