"""Chained block-pair kernel vs two whole-block kernel calls (interpret).

Runnable parity check for the quarantined experiment:
``python -m pytest scripts/experiments/check_swin_chain.py`` or
``python scripts/experiments/check_swin_chain.py`` (runs all cases)."""

import os
import sys

import numpy as np
import pytest

_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _here)
sys.path.insert(0, os.path.dirname(os.path.dirname(_here)))  # repo root

if __name__ == "__main__":  # CPU for the standalone run (tests force it in conftest)
    import jax

    os.environ["JAX_PLATFORMS"] = "cpu"
    jax.config.update("jax_platforms", "cpu")


def _wts(rng, c, heads, ws):
    n = ws * ws
    r = lambda *s: np.asarray(rng.standard_normal(s), np.float32)
    return (
        r(c), r(c),
        r(c, 3 * c) * 0.1, r(3 * c),
        r(c, c) * 0.1, r(c),
        r(heads, n, n) * 0.1,
        r(c), r(c),
        r(c, 2 * c) * 0.1, r(2 * c),
        r(2 * c, c) * 0.1, r(c),
    )


def _ref_pair(x, wa, wb, mask, heads, ws):
    """Two fused_swin_block calls with a materialized roll between them;
    returns the ROLLED-space map (the chain kernel's output space)."""
    import jax.numpy as jnp

    from studiosr_tpu.ops.pallas.swin_block import fused_swin_block

    sh = ws // 2

    def call(y, w, m):
        names = ("ln1_scale", "ln1_bias", "wqkv", "bqkv", "wproj", "bproj",
                 "bias", "ln2_scale", "ln2_bias", "w1", "b1", "w2", "b2")
        out = fused_swin_block(
            y, mask=m, heads=heads, window_size=ws, interpret=True,
            **dict(zip(names, map(jnp.asarray, w))),
        )
        assert out is not None
        return out

    y1 = call(x, wa, None)
    y1r = jnp.roll(y1, (-sh, -sh), axis=(1, 2))
    return call(y1r, wb, mask)


@pytest.mark.parametrize("entry", [False, True])
@pytest.mark.parametrize("batch", [1, 2])
def test_chain2_equals_two_blocks(entry, batch):
    """Chained pair == block, roll, masked block — at an ODD windows-per-row
    geometry (the bench class), including the cyclic wrap stripe and, for
    batch 2, the scratch-ring reset between batch elements."""
    import jax.numpy as jnp

    from swin_chain import chain_supported, fused_swin_block_chain2

    from studiosr_tpu.ops.windows import calculate_mask

    rng = np.random.default_rng(0)
    ws, heads, c = 8, 2, 32
    hgt = wdt = 3 * ws  # 3 windows per row: odd (dummy-window pair path)
    sh = ws // 2
    x = jnp.asarray(rng.standard_normal((batch, hgt, wdt, c)), jnp.float32)
    assert chain_supported(x.shape, heads, ws)

    wa, wb = _wts(rng, c, heads, ws), _wts(rng, c, heads, ws)
    mask = jnp.asarray(calculate_mask((hgt, wdt), ws, sh))

    want = _ref_pair(x, wa, wb, mask, heads, ws)

    x_in = jnp.roll(x, (-sh, -sh), axis=(1, 2)) if entry else x
    got = fused_swin_block_chain2(
        x_in, tuple(map(jnp.asarray, wa)), tuple(map(jnp.asarray, wb)), mask,
        heads=heads, window_size=ws, entry_shift=entry, interpret=True,
    )
    assert got is not None
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4)


if __name__ == "__main__":
    for entry in (False, True):
        for batch in (1, 2):
            test_chain2_equals_two_blocks(entry, batch)
            print(f"chain2 parity OK (entry={entry}, batch={batch})")
