"""Fused OCAB block kernel vs the XLA overlapping cross-attention path."""

import numpy as np


def test_fused_ocab_block_matches_xla():
    import jax
    import jax.numpy as jnp

    from studiosr_tpu.ops.pallas.ocab import fused_ocab_block
    from studiosr_tpu.serving.hat_fast import _ocab

    rng = np.random.default_rng(0)
    b, h, w, c = 2, 16, 24, 24
    # overlap=1.0 keeps owin = 16 a multiple of 8 (the Mosaic kv-slice-size
    # rule the wrapper now enforces; HAT's real ws=16/overlap=0.5 -> owin=24
    # is likewise legal but 4x slower in interpret mode).
    heads, ws, overlap = 3, 8, 1.0
    owin = int(ws * overlap) + ws
    x = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)

    p = {
        "norm1": {"scale": jnp.asarray(rng.standard_normal(c) * 0.1 + 1, jnp.float32),
                  "bias": jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32)},
        "qkv": {"kernel": jnp.asarray(rng.standard_normal((c, 3 * c)) * 0.1, jnp.float32),
                "bias": jnp.asarray(rng.standard_normal(3 * c) * 0.1, jnp.float32)},
        "proj": {"kernel": jnp.asarray(rng.standard_normal((c, c)) * 0.1, jnp.float32),
                 "bias": jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32)},
        "relative_position_bias_table": jnp.asarray(
            rng.standard_normal(((ws + owin - 1) ** 2, heads)) * 0.05, jnp.float32
        ),
        "norm2": {"scale": jnp.asarray(rng.standard_normal(c) * 0.1 + 1, jnp.float32),
                  "bias": jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32)},
        "mlp": {"fc1": {"kernel": jnp.asarray(rng.standard_normal((c, 2 * c)) * 0.1, jnp.float32),
                        "bias": jnp.asarray(rng.standard_normal(2 * c) * 0.1, jnp.float32)},
                "fc2": {"kernel": jnp.asarray(rng.standard_normal((2 * c, c)) * 0.1, jnp.float32),
                        "bias": jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32)}},
    }

    want = np.asarray(_ocab(x, p, heads, ws, overlap))

    from studiosr_tpu.ops.windows import relative_position_index_oca

    rpi = relative_position_index_oca(ws, overlap)
    bias = (
        p["relative_position_bias_table"][jnp.asarray(rpi.reshape(-1))]
        .reshape(ws * ws, owin * owin, heads)
        .transpose(2, 0, 1)
    )
    got = fused_ocab_block(
        x,
        p["norm1"]["scale"], p["norm1"]["bias"],
        p["qkv"]["kernel"], p["qkv"]["bias"],
        p["proj"]["kernel"], p["proj"]["bias"],
        bias,
        p["norm2"]["scale"], p["norm2"]["bias"],
        p["mlp"]["fc1"]["kernel"], p["mlp"]["fc1"]["bias"],
        p["mlp"]["fc2"]["kernel"], p["mlp"]["fc2"]["bias"],
        heads=heads, ws=ws, overlap_ratio=overlap, interpret=True,
    )
    assert got is not None
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-5, rtol=1e-4)


def test_fused_ocab_block_declines_misaligned_owin():
    """ws=8 with overlap 0.5 gives owin=12 — the kv slice SIZE is not a
    multiple of 8, which violates the Mosaic spatial-slice rule on hardware
    (interpret mode would silently pass). The wrapper must decline."""
    import jax.numpy as jnp

    from studiosr_tpu.ops.pallas import engagement
    from studiosr_tpu.ops.pallas.ocab import fused_ocab_block

    rng = np.random.default_rng(1)
    c, heads, ws, overlap = 24, 3, 8, 0.5
    owin = int(ws * overlap) + ws
    assert owin % 8  # the misalignment under test
    x = jnp.asarray(rng.standard_normal((1, 16, 16, c)), jnp.float32)
    z = lambda *s: jnp.zeros(s, jnp.float32)
    engagement.reset()
    got = fused_ocab_block(
        x, z(c) + 1, z(c), z(c, 3 * c), z(3 * c), z(c, c), z(c),
        z(heads, ws * ws, owin * owin), z(c) + 1, z(c),
        z(c, 2 * c), z(2 * c), z(2 * c, c), z(c),
        heads=heads, ws=ws, overlap_ratio=overlap, interpret=True,
    )
    assert got is None
    rec = engagement.counters().get("fused_ocab_block", {})
    assert rec.get("fallback", 0) >= 1, rec
