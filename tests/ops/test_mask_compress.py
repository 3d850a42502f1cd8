"""Compressed shift-mask layouts (prepare_mask / compress_mask).

The dense (nW, N, N) mask is streamed per shifted block by the fused
kernels (17.8 MB f32 for SwinIR at 264², 75.7 MB for HAT at 272² —
scripts/exp_hlo_audit.py). The compressed layouts map repeated window
classes to one block index so Mosaic re-uses the fetch; by construction
(exact numpy equality checks at trace time) they are bit-identical.
"""

import numpy as np
import pytest

from studiosr_tpu.ops.windows import calculate_mask, compress_mask


def test_compress_mask_rows2_expands_back():
    """SwinIR bench geometry: 264² map, ws=8 -> whole-row chunks (33)."""
    ws, hgt, wdt = 8, 264, 264
    nwr = nwc = hgt // ws
    dense = calculate_mask((hgt, wdt), ws, ws // 2)
    mode, comp = compress_mask(dense, nwr, nwc, chunk=nwc)
    assert mode == "rows2"
    assert comp.shape == (2 * nwc, ws * ws, ws * ws)
    expanded = np.concatenate([np.tile(comp[:nwc], (nwr - 1, 1, 1)), comp[nwc:]], axis=0)
    np.testing.assert_array_equal(expanded, dense)


def test_compress_mask_cls4_expands_back():
    """Chunk-1 programs (e.g. a 272² ws=16 map with prime windows/row)."""
    ws, hgt, wdt = 16, 272, 272
    nwr = nwc = hgt // ws
    dense = calculate_mask((hgt, wdt), ws, ws // 2)
    mode, comp = compress_mask(dense, nwr, nwc, chunk=1)
    assert mode == "cls4"
    assert comp.shape == (4, ws * ws, ws * ws)
    dense_r = dense.reshape(nwr, nwc, ws * ws, ws * ws)
    for r in range(nwr):
        for c in range(nwc):
            cls = 2 * (r == nwr - 1) + (c == nwc - 1)
            np.testing.assert_array_equal(dense_r[r, c], comp[cls])


def test_compress_mask_cls4_parts_expands_back():
    """HAT bench geometry: a 256 input is already a ws=16 multiple -> 16x16
    windows with chunk-4 programs; cls4 compresses at part granularity."""
    ws, hgt, wdt, chunk = 16, 256, 256, 4
    n = ws * ws
    nwr = nwc = hgt // ws
    dense = calculate_mask((hgt, wdt), ws, ws // 2)
    mode, comp = compress_mask(dense, nwr, nwc, chunk=chunk)
    assert mode == "cls4"
    assert comp.shape == (4 * chunk, n, n)
    dense_r = dense.reshape(nwr, nwc, n, n)
    n_parts = nwc // chunk
    for r in range(nwr):
        for p in range(n_parts):
            cls = 2 * (r == nwr - 1) + (p == n_parts - 1)
            np.testing.assert_array_equal(
                dense_r[r, p * chunk : (p + 1) * chunk], comp[cls * chunk : (cls + 1) * chunk]
            )


def _block_weights(rng, c, heads, ws):
    import jax.numpy as jnp

    n = ws * ws
    return dict(
        ln1_scale=jnp.asarray(rng.standard_normal(c), jnp.float32),
        ln1_bias=jnp.asarray(rng.standard_normal(c), jnp.float32),
        wqkv=jnp.asarray(rng.standard_normal((c, 3 * c)) * 0.1, jnp.float32),
        bqkv=jnp.asarray(rng.standard_normal(3 * c), jnp.float32),
        wproj=jnp.asarray(rng.standard_normal((c, c)) * 0.1, jnp.float32),
        bproj=jnp.asarray(rng.standard_normal(c), jnp.float32),
        bias=jnp.asarray(rng.standard_normal((heads, n, n)) * 0.1, jnp.float32),
    )


def test_fused_swin_block_rows2_matches_dense():
    """Whole-block kernel, odd windows-per-row (the bench class), interpret."""
    import jax.numpy as jnp

    from studiosr_tpu.ops.pallas.swin_block import fused_swin_block, prepare_mask

    rng = np.random.default_rng(0)
    ws, heads, c = 8, 2, 32
    hgt = wdt = 3 * ws
    x = jnp.asarray(rng.standard_normal((1, hgt, wdt, c)), jnp.float32)
    w = _block_weights(rng, c, heads, ws)
    mlp = dict(
        ln2_scale=jnp.asarray(rng.standard_normal(c), jnp.float32),
        ln2_bias=jnp.asarray(rng.standard_normal(c), jnp.float32),
        w1=jnp.asarray(rng.standard_normal((c, 2 * c)) * 0.1, jnp.float32),
        b1=jnp.asarray(rng.standard_normal(2 * c), jnp.float32),
        w2=jnp.asarray(rng.standard_normal((2 * c, c)) * 0.1, jnp.float32),
        b2=jnp.asarray(rng.standard_normal(c), jnp.float32),
    )
    mask_np = calculate_mask((hgt, wdt), ws, ws // 2)
    mask_k, mode = prepare_mask(mask_np, x.shape, heads, ws, jnp.float32)
    assert mode == "rows2"

    want = fused_swin_block(
        x, mask=jnp.asarray(mask_np), heads=heads, window_size=ws, interpret=True, **w, **mlp
    )
    got = fused_swin_block(
        x, mask=mask_k, mask_mode=mode, heads=heads, window_size=ws, interpret=True, **w, **mlp
    )
    assert want is not None and got is not None
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_attention_block_cls4_matches_dense():
    """Per-head kernel at a ws=16 chunk-1 geometry (the HAT class), interpret."""
    import jax.numpy as jnp

    from studiosr_tpu.ops.pallas.swin_block import (
        _select_chunk,
        fused_window_attention_block,
        prepare_mask,
    )

    rng = np.random.default_rng(1)
    ws, heads, c = 16, 2, 32
    hgt = wdt = 5 * ws  # 5 windows/row: divisors {1, 5}, budget caps at 4 -> chunk 1
    chunk, use_pairs = _select_chunk(wdt // ws, heads, ws * ws)
    assert chunk == 1 and not use_pairs

    x = jnp.asarray(rng.standard_normal((1, hgt, wdt, c)), jnp.float32)
    w = _block_weights(rng, c, heads, ws)
    mask_np = calculate_mask((hgt, wdt), ws, ws // 2)
    mask_k, mode = prepare_mask(mask_np, x.shape, heads, ws, jnp.float32)
    assert mode == "cls4"

    want = fused_window_attention_block(
        x, w["ln1_scale"], w["ln1_bias"], w["wqkv"], w["bqkv"], w["wproj"], w["bproj"],
        w["bias"], jnp.asarray(mask_np), heads=heads, window_size=ws, interpret=True,
    )
    got = fused_window_attention_block(
        x, w["ln1_scale"], w["ln1_bias"], w["wqkv"], w["bqkv"], w["wproj"], w["bproj"],
        w["bias"], mask_k, heads=heads, window_size=ws, mask_mode=mode, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_attention_block_cls4_parts_matches_dense():
    """Per-head kernel at a chunk-4 ws=16 geometry (HAT at a 256 input)."""
    import jax.numpy as jnp

    from studiosr_tpu.ops.pallas.swin_block import (
        _select_chunk,
        fused_window_attention_block,
        prepare_mask,
    )

    rng = np.random.default_rng(2)
    ws, heads, c = 16, 2, 32
    hgt = wdt = 8 * ws  # 8 windows/row -> chunk 4 (budget caps at 4)
    chunk, use_pairs = _select_chunk(wdt // ws, heads, ws * ws)
    assert chunk == 4 and not use_pairs

    x = jnp.asarray(rng.standard_normal((1, hgt, wdt, c)), jnp.float32)
    w = _block_weights(rng, c, heads, ws)
    mask_np = calculate_mask((hgt, wdt), ws, ws // 2)
    mask_k, mode = prepare_mask(mask_np, x.shape, heads, ws, jnp.float32)
    assert mode == "cls4"

    want = fused_window_attention_block(
        x, w["ln1_scale"], w["ln1_bias"], w["wqkv"], w["bqkv"], w["wproj"], w["bproj"],
        w["bias"], jnp.asarray(mask_np), heads=heads, window_size=ws, interpret=True,
    )
    got = fused_window_attention_block(
        x, w["ln1_scale"], w["ln1_bias"], w["wqkv"], w["bqkv"], w["wproj"], w["bproj"],
        w["bias"], mask_k, heads=heads, window_size=ws, mask_mode=mode, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_prepare_mask_bf16_is_exact():
    """0 / -100 are exactly representable in bf16 (the kernels upcast to
    f32 before adding to scores), so the bf16 cast loses nothing."""
    import jax.numpy as jnp

    mask = calculate_mask((48, 48), 8, 4)
    as_bf16 = np.asarray(jnp.asarray(mask, jnp.bfloat16).astype(jnp.float32))
    np.testing.assert_array_equal(as_bf16, mask)
