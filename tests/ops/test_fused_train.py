"""Fused-training path (custom-VJP blocks wired into SwinIRModule).

Checks that ``fused_train=True`` (1) declares the identical parameter tree,
(2) computes the same forward, and (3) produces the same gradients as the
plain linen module — on CPU, f32, where the custom-VJP primals fall back to
the XLA math and the Pallas MLP backward runs in interpret mode.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from studiosr_tpu.models.swinir import SwinIRModule

CFG = dict(
    scale=2,
    embed_dim=16,
    depths=(2, 2),
    num_heads=(2, 2),
    window_size=8,
    mlp_ratio=2.0,
    drop_path_rate=0.0,
    upsampler="pixelshuffledirect",
)


def _tree_paths(tree, prefix=""):
    if not isinstance(tree, dict):
        return {prefix: jnp.shape(tree)}
    out = {}
    for k, v in tree.items():
        out.update(_tree_paths(v, f"{prefix}/{k}"))
    return out


def test_fused_train_param_tree_matches():
    plain = SwinIRModule(**CFG)
    fused = SwinIRModule(**CFG, fused_train=True)
    x = jnp.zeros((1, 16, 16, 3), jnp.float32)
    vp = plain.init(jax.random.PRNGKey(0), x)
    vf = fused.init(jax.random.PRNGKey(0), x)
    assert _tree_paths(vp["params"]) == _tree_paths(vf["params"])


@pytest.mark.parametrize("shift_exercised", [True])
def test_fused_train_grads_match_autodiff(shift_exercised):
    plain = SwinIRModule(**CFG)
    fused = SwinIRModule(**CFG, fused_train=True)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 16, 16, 3)), jnp.float32)
    gt = jnp.asarray(np.random.default_rng(1).standard_normal((2, 32, 32, 3)), jnp.float32)
    variables = plain.init(jax.random.PRNGKey(0), x)

    def loss(params, module):
        out = module.apply({"params": params}, x, train=True, rngs={"dropout": jax.random.PRNGKey(7)})
        return jnp.mean(jnp.abs(out - gt))

    lp, gp = jax.value_and_grad(loss)(variables["params"], plain)
    lf, gf = jax.value_and_grad(loss)(variables["params"], fused)

    np.testing.assert_allclose(float(lf), float(lp), rtol=1e-5)
    flat_p = jax.tree_util.tree_leaves_with_path(gp)
    flat_f = dict(jax.tree_util.tree_leaves_with_path(gf))
    for path, leaf in flat_p:
        got = flat_f[path]
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(leaf), atol=2e-5, rtol=1e-3,
            err_msg=jax.tree_util.keystr(path),
        )


def test_fused_train_drop_path_runs():
    fused = SwinIRModule(**{**CFG, "drop_path_rate": 0.2}, fused_train=True)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((4, 16, 16, 3)), jnp.float32)
    variables = fused.init(jax.random.PRNGKey(0), x)
    out = fused.apply(variables, x, train=True, rngs={"dropout": jax.random.PRNGKey(3)})
    assert out.shape == (4, 32, 32, 3)
    assert bool(jnp.all(jnp.isfinite(out)))


HAT_CFG = dict(
    scale=2,
    embed_dim=16,
    depths=(2,),
    num_heads=(2,),
    window_size=8,
    mlp_ratio=2.0,
    drop_path_rate=0.0,
    overlap_ratio=0.5,
    compress_ratio=2,
    squeeze_factor=4,
)


def test_hat_fused_train_param_tree_matches():
    from studiosr_tpu.models.hat import HATModule

    plain = HATModule(**HAT_CFG)
    fused = HATModule(**HAT_CFG, fused_train=True)
    x = jnp.zeros((1, 16, 16, 3), jnp.float32)
    vp = plain.init(jax.random.PRNGKey(0), x)
    vf = fused.init(jax.random.PRNGKey(0), x)
    assert _tree_paths(vp["params"]) == _tree_paths(vf["params"])


def test_hat_fused_train_grads_match_autodiff():
    from studiosr_tpu.models.hat import HATModule

    plain = HATModule(**HAT_CFG)
    fused = HATModule(**HAT_CFG, fused_train=True)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 16, 16, 3)), jnp.float32)
    gt = jnp.asarray(np.random.default_rng(1).standard_normal((2, 32, 32, 3)), jnp.float32)
    variables = plain.init(jax.random.PRNGKey(0), x)

    def loss(params, module):
        out = module.apply({"params": params}, x, train=True, rngs={"dropout": jax.random.PRNGKey(7)})
        return jnp.mean(jnp.abs(out - gt))

    lp, gp = jax.value_and_grad(loss)(variables["params"], plain)
    lf, gf = jax.value_and_grad(loss)(variables["params"], fused)

    np.testing.assert_allclose(float(lf), float(lp), rtol=1e-5)
    flat_p = jax.tree_util.tree_leaves_with_path(gp)
    flat_f = dict(jax.tree_util.tree_leaves_with_path(gf))
    for path, leaf in flat_p:
        got = flat_f[path]
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(leaf), atol=2e-5, rtol=1e-3,
            err_msg=jax.tree_util.keystr(path),
        )


def test_hat_fused_train_drop_path_runs():
    from studiosr_tpu.models.hat import HATModule

    fused = HATModule(**{**HAT_CFG, "drop_path_rate": 0.2}, fused_train=True)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((4, 16, 16, 3)), jnp.float32)
    variables = fused.init(jax.random.PRNGKey(0), x)
    out = fused.apply(variables, x, train=True, rngs={"dropout": jax.random.PRNGKey(3)})
    assert out.shape == (4, 32, 32, 3)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_swinfir_fused_train_grads_match_autodiff():
    """SwinFIR = SwinIRModule with SFB residual connections: fused_train must
    compose with the spectral blocks (reference recipe swinfir.py:83-118 uses
    the same Trainer as SwinIR)."""
    from studiosr_tpu.models.swinfir import SwinFIR

    model = SwinFIR.build(
        scale=2, embed_dim=16, depths=(2, 2), num_heads=(2, 2), window_size=8,
        mlp_ratio=2.0, drop_path_rate=0.0, upsampler="pixelshuffledirect",
    )
    plain, fused = model.module, model.module.clone(fused_train=True)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 16, 16, 3)), jnp.float32)
    gt = jnp.asarray(np.random.default_rng(1).standard_normal((2, 32, 32, 3)), jnp.float32)
    variables = model.variables

    def loss(params, module):
        out = module.apply({"params": params}, x, train=True, rngs={"dropout": jax.random.PRNGKey(7)})
        return jnp.mean(jnp.abs(out - gt))

    lp, gp = jax.value_and_grad(loss)(variables["params"], plain)
    lf, gf = jax.value_and_grad(loss)(variables["params"], fused)

    np.testing.assert_allclose(float(lf), float(lp), rtol=1e-5)
    flat_p = jax.tree_util.tree_leaves_with_path(gp)
    flat_f = dict(jax.tree_util.tree_leaves_with_path(gf))
    for path, leaf in flat_p:
        got = flat_f[path]
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(leaf), atol=2e-5, rtol=1e-3,
            err_msg=jax.tree_util.keystr(path),
        )


MAXSR_CFG = dict(scale=2, dim=32, dim_head=8, depth=(1, 1), window_size=4, dropout=0.0)


def test_maxsr_grid_shuffle_identity():
    """_shuffle_grid turns grid partition into block partition (and
    _unshuffle_grid inverts it) — the identity the fused grid-attention
    path rides."""
    from studiosr_tpu.models.maxsr import (
        _block_partition,
        _grid_partition,
        _shuffle_grid,
        _unshuffle_grid,
    )

    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 12, 20, 5)), jnp.float32)
    for wh, ww in [(4, 4), (3, 5), (6, 2)]:
        g, _ = _grid_partition(x, wh, ww)
        bshuf, _ = _block_partition(_shuffle_grid(x, wh, ww), wh, ww)
        np.testing.assert_array_equal(np.asarray(g), np.asarray(bshuf))
        np.testing.assert_array_equal(
            np.asarray(_unshuffle_grid(_shuffle_grid(x, wh, ww), wh, ww)), np.asarray(x)
        )


@pytest.mark.parametrize("adaptive", [False, True])
def test_maxsr_fused_train_param_tree_matches(adaptive):
    from studiosr_tpu.models.maxsr import MaxSRModule

    plain = MaxSRModule(**MAXSR_CFG, adaptive=adaptive)
    fused = MaxSRModule(**MAXSR_CFG, adaptive=adaptive, fused_train=True)
    x = jnp.zeros((1, 8, 8, 3), jnp.float32)
    vp = plain.init(jax.random.PRNGKey(0), x)
    vf = fused.init(jax.random.PRNGKey(0), x)
    assert _tree_paths(vp["params"]) == _tree_paths(vf["params"])
    # Same inits too: cloning a trained plain module to fused_train=True (the
    # Trainer's wiring) must be a pure reparameterization.
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(vp), jax.tree_util.tree_leaves_with_path(vf)
    ):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=jax.tree_util.keystr(pa))


@pytest.mark.parametrize("adaptive", [False, True])
def test_maxsr_fused_train_grads_match_autodiff(adaptive):
    """Covers block AND grid attention (both run in every pair), the static
    rel-pos-bias table gradient, and (adaptive) the inner-LN re-based
    residual. MBConv dropout stays on to exercise the rng plumbing."""
    from studiosr_tpu.models.maxsr import MaxSRModule

    cfg = {**MAXSR_CFG, "dropout": 0.1}
    plain = MaxSRModule(**cfg, adaptive=adaptive)
    fused = MaxSRModule(**cfg, adaptive=adaptive, fused_train=True)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 8, 8, 3)) * 0.1, jnp.float32)
    gt = jnp.asarray(np.random.default_rng(1).standard_normal((2, 16, 16, 3)) * 0.1, jnp.float32)
    variables = plain.init(jax.random.PRNGKey(0), x)

    def loss(params, module):
        out, _ = module.apply(
            {**variables, "params": params},
            x,
            train=True,
            rngs={"dropout": jax.random.PRNGKey(7)},
            mutable=["batch_stats"],
        )
        return jnp.mean(jnp.abs(out - gt))

    lp, gp = jax.value_and_grad(loss)(variables["params"], plain)
    lf, gf = jax.value_and_grad(loss)(variables["params"], fused)

    np.testing.assert_allclose(float(lf), float(lp), rtol=1e-5)
    flat_p = jax.tree_util.tree_leaves_with_path(gp)
    flat_f = dict(jax.tree_util.tree_leaves_with_path(gf))
    for path, leaf in flat_p:
        got = flat_f[path]
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(leaf), atol=2e-5, rtol=1e-3,
            err_msg=jax.tree_util.keystr(path),
        )


def test_maxsr_fused_train_nonsquare_adaptive_falls_back():
    """Adaptive mode on a non-square map gives wh != ww; the fused pair
    declines (plain path, identical params) and the module still runs."""
    from studiosr_tpu.models.maxsr import MaxSRModule

    fused = MaxSRModule(**MAXSR_CFG, adaptive=True, fused_train=True)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 8, 12, 3)) * 0.1, jnp.float32)
    variables = fused.init(jax.random.PRNGKey(0), x)
    out, _ = fused.apply(variables, x, train=True, rngs={"dropout": jax.random.PRNGKey(3)}, mutable=["batch_stats"])
    assert out.shape == (1, 16, 24, 3)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_swinfir_grads_flow_through_mxu_dft(monkeypatch):
    """The TPU training path differentiates through the MXU-DFT einsums
    (ops/dft.py) — pin its gradients against the jnp.fft formulation on CPU
    via FORCE_MXU."""
    import studiosr_tpu.ops.dft as dft
    from studiosr_tpu.models.swinfir import SwinFIR

    model = SwinFIR.build(
        scale=2, embed_dim=16, depths=(2,), num_heads=(2,), window_size=8,
        mlp_ratio=2.0, drop_path_rate=0.0, upsampler="pixelshuffledirect",
    )
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 16, 16, 3)), jnp.float32)
    gt = jnp.asarray(np.random.default_rng(1).standard_normal((1, 32, 32, 3)), jnp.float32)

    def loss(params):
        out = model.module.apply({"params": params}, x, train=True, rngs={"dropout": jax.random.PRNGKey(7)})
        return jnp.mean(jnp.abs(out - gt))

    lp, gp = jax.value_and_grad(loss)(model.variables["params"])
    monkeypatch.setattr(dft, "FORCE_MXU", True)
    lf, gf = jax.value_and_grad(loss)(model.variables["params"])

    np.testing.assert_allclose(float(lf), float(lp), rtol=1e-5)
    flat_p = jax.tree_util.tree_leaves_with_path(gp)
    flat_f = dict(jax.tree_util.tree_leaves_with_path(gf))
    for path, leaf in flat_p:
        np.testing.assert_allclose(
            np.asarray(flat_f[path]), np.asarray(leaf), atol=3e-5, rtol=1e-3,
            err_msg=jax.tree_util.keystr(path),
        )
