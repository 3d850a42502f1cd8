"""Trainer smoke tests: synthetic paired data, 8-CPU mesh data parallelism,
checkpoint save/resume, best-PSNR gating — the end-to-end training slice."""

import os

import numpy as np
import pytest

from studiosr_tpu.engine import Trainer
from studiosr_tpu.models import EDSR, SRResNet


class SyntheticPairs:
    """Deterministic paired dataset: gt random, lq = 2x2 box-downsampled gt."""

    def __init__(self, n: int = 16, size: int = 8, scale: int = 2):
        rng = np.random.default_rng(0)
        self.gt = rng.random((n, size * scale, size * scale, 3), dtype=np.float32)
        self.lq = self.gt.reshape(n, size, scale, size, scale, 3).mean(axis=(2, 4))

    def __len__(self):
        return len(self.gt)

    def __getitem__(self, idx):
        return self.lq[idx], self.gt[idx]


class CountingEvaluator:
    def __init__(self):
        self.calls = 0

    def run(self, func):
        self.calls += 1
        out = func((np.random.default_rng(1).random((8, 8, 3)) * 255).astype(np.uint8))
        assert out.shape == (16, 16, 3)
        return 30.0 + self.calls, 0.9


def test_trainer_end_to_end(tmp_path):
    model = EDSR.build(scale=2, n_feats=8, n_resblocks=1)
    dataset = SyntheticPairs()
    evaluator = CountingEvaluator()
    trainer = Trainer(
        model,
        dataset,
        evaluator,
        batch_size=8,
        num_workers=2,
        max_iters=6,
        eval_interval=3,
        milestones=[4],
        ckpt_path=str(tmp_path),
        bfloat16=False,
        log_interval=2,
    )
    trainer.run()
    assert evaluator.calls == 2
    assert trainer.best_psnr == 32.0
    assert os.path.exists(tmp_path / "best.model.ckpt")
    assert os.path.exists(tmp_path / "latest.train.ckpt")
    assert os.path.exists(tmp_path / "params.json")
    assert os.path.exists(tmp_path / "train.log")


def test_trainer_steps_per_dispatch_matches_single(tmp_path):
    """steps_per_dispatch=2 (k steps per device dispatch, lax.scan over
    stacked batches) must reproduce the k=1 run exactly: same batch order,
    same per-step rng folds, same final parameters — plus a tail single
    step when max_iters % k != 0."""
    import jax

    dataset = SyntheticPairs()

    def run(k, path, max_iters):
        model = EDSR.build(scale=2, n_feats=8, n_resblocks=1)
        trainer = Trainer(
            model,
            dataset,
            None,
            batch_size=8,
            num_workers=1,
            max_iters=max_iters,
            eval_interval=100,
            ckpt_path=str(path),
            bfloat16=False,
            steps_per_dispatch=k,
        )
        trainer.run()
        return jax.tree_util.tree_leaves(jax.device_get(trainer.state.params))

    # max_iters=5 with k=2 exercises two chained dispatches + one tail step.
    p1 = run(1, tmp_path / "k1", 5)
    p2 = run(2, tmp_path / "k2", 5)
    for a, b in zip(p1, p2):
        np.testing.assert_allclose(a, b, atol=1e-7)


def test_trainer_resume(tmp_path):
    dataset = SyntheticPairs()

    def make():
        model = EDSR.build(scale=2, n_feats=8, n_resblocks=1)
        return Trainer(
            model,
            dataset,
            None,
            batch_size=8,
            num_workers=1,
            max_iters=4,
            eval_interval=2,
            ckpt_path=str(tmp_path),
            bfloat16=False,
        )

    t1 = make()
    t1.run()
    params_before = t1.model.params

    t2 = make()
    # Standalone load before run() (reference Trainer supports it): load()
    # builds its own state skeleton when none exists yet.
    assert t2.state is None
    assert t2.load("latest")
    # Resumed params must equal the saved ones, not the fresh init.
    a = params_before["head.0"]["kernel"]
    b = t2.model.params["head.0"]["kernel"]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_trainer_resume_survives_corrupt_latest(tmp_path):
    """Crash-safe recovery (SURVEY §5): saves are atomic (tmp + os.replace —
    no .tmp debris, never a half-written visible file) and a corrupt
    ``latest`` (e.g. torn by a non-POSIX filesystem) falls back to ``best``
    instead of killing the restart."""
    dataset = SyntheticPairs()

    def make(evaluator=None):
        model = EDSR.build(scale=2, n_feats=8, n_resblocks=1)
        return Trainer(
            model,
            dataset,
            evaluator,
            batch_size=8,
            num_workers=1,
            max_iters=4,
            eval_interval=2,
            ckpt_path=str(tmp_path),
            bfloat16=False,
        )

    t1 = make(CountingEvaluator())
    t1.run()
    # Atomic writes leave no tmp debris behind.
    assert not [p for p in os.listdir(tmp_path) if p.endswith(".tmp")]
    tb = make()
    assert tb.load("best")
    best_kernel = np.asarray(tb.model.params["head.0"]["kernel"]).copy()
    best_psnr_expected = tb.best_psnr

    # Simulate a kill mid-save: truncate latest.model.ckpt to half its bytes.
    latest = tmp_path / "latest.model.ckpt"
    data = latest.read_bytes()
    latest.write_bytes(data[: len(data) // 2])

    t2 = make()
    with pytest.warns(UserWarning, match="corrupt"):
        assert t2.load("latest")  # falls back to best
    np.testing.assert_allclose(
        np.asarray(t2.model.params["head.0"]["kernel"]), best_kernel
    )
    assert t2.best_psnr == best_psnr_expected

    # Truncated train state (model file intact) must fall back too.
    (tmp_path / "latest.model.ckpt").write_bytes(data)
    train = tmp_path / "latest.train.ckpt"
    tdata = train.read_bytes()
    train.write_bytes(tdata[: len(tdata) // 3])
    t3 = make()
    with pytest.warns(UserWarning, match="corrupt"):
        assert t3.load("latest")

    # Both tags corrupt -> clean False (fresh start), not a crash.
    train.write_bytes(tdata[: len(tdata) // 3])
    (tmp_path / "best.model.ckpt").write_bytes(data[: len(data) // 4])
    t4 = make()
    with pytest.warns(UserWarning, match="corrupt"):
        assert not t4.load("latest")


def test_trainer_load_config_drift_fails_loudly(tmp_path):
    """A checkpoint whose bytes are intact but whose tree no longer matches
    the model (config changed between runs) must RAISE, not be mislabeled
    'corrupt' and silently discarded for a fresh start (ADVICE r4)."""
    dataset = SyntheticPairs()

    def make(n_feats):
        model = EDSR.build(scale=2, n_feats=n_feats, n_resblocks=1)
        return Trainer(
            model, dataset, None,
            batch_size=8, num_workers=1, max_iters=2, eval_interval=2,
            ckpt_path=str(tmp_path), bfloat16=False,
        )

    make(8).run()
    drifted = make(16)  # wider trunk: same tree paths, mismatched shapes
    with pytest.raises(Exception):
        drifted.load("latest")


def test_trainer_batchnorm_model():
    """SyncBatchNorm analog: BN model trains under the sharded step (batch
    stats mutate globally)."""
    model = SRResNet.build(scale=2, channels=8, num_rcb=1)
    before = np.asarray(model.variables["batch_stats"]["trunk.0"]["rcb.1"]["mean"]).copy()
    dataset = SyntheticPairs(size=8, scale=2)
    trainer = Trainer(
        model,
        dataset,
        None,
        batch_size=8,
        num_workers=1,
        max_iters=2,
        eval_interval=100,
        ckpt_path="/tmp/srresnet_test_ckpt",
        bfloat16=False,
    )
    trainer.run()
    after = np.asarray(trainer.model.variables["batch_stats"]["trunk.0"]["rcb.1"]["mean"])
    assert not np.allclose(before, after)


def test_trainer_maxsr_smoke(tmp_path):
    """MaxSR is the only model combining batch_stats (MBConv BN), dropout
    rngs, AND the adaptive square-padding rule inside the training forward —
    one Trainer step pins all three wired together."""
    import jax

    from studiosr_tpu.models import MaxSR

    model = MaxSR.build(scale=2, dim=16, dim_head=8, depth=[1, 1], window_size=4)
    dataset = SyntheticPairs(size=16, scale=2)
    trainer = Trainer(
        model,
        dataset,
        None,
        batch_size=8,
        num_workers=1,
        max_iters=2,
        eval_interval=100,
        ckpt_path=str(tmp_path / "maxsr_ckpt"),
        bfloat16=True,
    )
    trainer.run()
    stats = trainer.model.variables["batch_stats"]
    leaves = jax.tree_util.tree_leaves(stats)
    assert leaves and any(not np.allclose(np.asarray(l), 0) for l in leaves)


def test_training_config_splat():
    """The reference idiom Trainer(model, data, ev, **model.get_training_config())
    must work with every model's published recipe (docs/README.md:32-35)."""
    from studiosr_tpu.models import SRResNet, SwinIR

    for model in [
        EDSR.build(scale=2, n_feats=8, n_resblocks=1),
        SRResNet.build(scale=2, channels=8, num_rcb=1),
        SwinIR.build(scale=2, embed_dim=16, depths=[1], num_heads=[2], window_size=8),
    ]:
        cfg = model.get_training_config()
        trainer = Trainer(model, SyntheticPairs(n=4), None, ckpt_path="/tmp/splat_ckpt", **cfg)
        assert trainer.max_iters == cfg["max_iters"]


def test_loss_decreases():
    model = EDSR.build(scale=2, n_feats=16, n_resblocks=2)
    dataset = SyntheticPairs(n=8, size=8, scale=2)
    trainer = Trainer(
        model,
        dataset,
        None,
        batch_size=8,
        num_workers=1,
        learning_rate=1e-3,
        max_iters=30,
        eval_interval=1000,
        ckpt_path="/tmp/edsr_loss_test_ckpt",
        bfloat16=False,
    )
    trainer.run()
    # Verify training reduced L1 error on a training sample vs fresh init.
    lq, gt = dataset[0]
    out = np.asarray(trainer.model(lq[None]))[0]
    final_err = np.abs(out - gt).mean()

    fresh = EDSR.build(scale=2, n_feats=16, n_resblocks=2)
    fresh_err = np.abs(np.asarray(fresh(lq[None]))[0] - gt).mean()
    assert final_err < fresh_err


def test_fused_trainer_matches_plain_on_cpu(tmp_path):
    """End-to-end fused-Trainer wiring (``fused_train=True``): the custom-VJP
    Pallas blocks run in interpret mode on CPU, and a few optimizer steps land
    on the same parameters as the plain autodiff path. Auto-selection keeps
    the fused path off on CPU (``trainer.py``), so without this explicit
    opt-in CI would never execute the fused Trainer wiring."""
    from studiosr_tpu.models import SwinIR

    dataset = SyntheticPairs(n=16, size=16, scale=2)

    def run(fused):
        model = SwinIR.build(
            scale=2, embed_dim=16, depths=[2], num_heads=[2], window_size=8,
            drop_path_rate=0.0, upsampler="pixelshuffledirect", seed=0,
        )
        trainer = Trainer(
            model,
            dataset,
            None,
            batch_size=8,
            num_workers=1,
            max_iters=3,
            eval_interval=1000,
            ckpt_path=str(tmp_path / ("fused" if fused else "plain")),
            bfloat16=False,
            seed=0,
            fused_train=fused,
        )
        trainer.run()
        return trainer.state.params

    import jax

    plain, fused = run(False), run(True)
    flat_p = jax.tree_util.tree_leaves(plain)
    flat_f = jax.tree_util.tree_leaves(fused)
    assert len(flat_p) == len(flat_f)
    for a, b in zip(flat_p, flat_f):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4, rtol=5e-3)


def test_trainer_ema_weights(tmp_path):
    """EMA training (``ema_decay``): the shadow follows the exact recurrence
    ema <- d*ema + (1-d)*params inside the jitted step, is checkpointed as
    {tag}.ema.ckpt, survives resume, and is servable via
    ``load_model(..., ema=True)`` (the reference zoo's params_ema analog)."""
    import jax

    from studiosr_tpu.zoo.registry import load_model

    model = EDSR.build(scale=2, n_feats=8, n_resblocks=1)
    dataset = SyntheticPairs()
    kwargs = dict(
        batch_size=8, num_workers=0, max_iters=4, eval_interval=2,
        ckpt_path=str(tmp_path), bfloat16=False, ema_decay=0.5,
    )
    trainer = Trainer(model, dataset, CountingEvaluator(), **kwargs)
    trainer.run()
    assert os.path.exists(tmp_path / "latest.ema.ckpt")
    assert os.path.exists(tmp_path / "best.ema.ckpt")

    # The shadow lags the raw parameters (decay 0.5 over a few steps).
    params = jax.device_get(trainer.state.params)
    ema = jax.device_get(trainer.state.ema_params)
    diffs = jax.tree_util.tree_map(lambda p, e: float(np.abs(np.asarray(p) - np.asarray(e)).max()), params, ema)
    assert max(jax.tree_util.tree_leaves(diffs)) > 0

    # Servable through the registry: raw vs EMA weights differ.
    raw = load_model(str(tmp_path), "edsr", tag="latest")
    shadow = load_model(str(tmp_path), "edsr", tag="latest", ema=True)
    lq = (np.random.default_rng(2).random((8, 8, 3)) * 255).astype(np.uint8)
    assert not np.array_equal(raw.inference(lq), shadow.inference(lq)) or max(
        jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(
                lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
                raw.variables["params"], shadow.variables["params"],
            )
        )
    ) > 0

    # Resume restores the shadow (not re-seeded from params).
    trainer2 = Trainer(EDSR.build(scale=2, n_feats=8, n_resblocks=1), dataset, None, **kwargs)
    from studiosr_tpu.parallel import prepare_state

    trainer2.state = prepare_state(trainer2.model.variables, trainer2.tx, trainer2.mesh, ema_decay=0.5)
    assert trainer2.load("latest")
    ema2 = jax.device_get(trainer2.state.ema_params)
    for a, b in zip(jax.tree_util.tree_leaves(ema), jax.tree_util.tree_leaves(ema2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_ema_recurrence_exact():
    """The jitted step's EMA update equals the hand recurrence."""
    import jax
    import jax.numpy as jnp

    from studiosr_tpu.parallel import build_optimizer, get_mesh, make_train_step, prepare_state, shard_batch
    from studiosr_tpu.utils.losses import l1_loss

    model = EDSR.build(scale=2, n_feats=8, n_resblocks=1)
    tx = build_optimizer(learning_rate=1e-2)
    d = 0.75
    state = prepare_state(model.variables, tx, ema_decay=d)
    step = make_train_step(model.module, tx, l1_loss, bfloat16=False, ema_decay=d, donate=False)

    rng = np.random.default_rng(0)
    gt = rng.random((8, 16, 16, 3), dtype=np.float32)
    lq = gt.reshape(8, 8, 2, 8, 2, 3).mean(axis=(2, 4))
    batch = shard_batch((jnp.asarray(lq), jnp.asarray(gt)), get_mesh())

    ema_ref = jax.device_get(state.ema_params)
    for i in range(3):
        state, _ = step(state, batch[0], batch[1], jax.random.PRNGKey(i))
        params = jax.device_get(state.params)
        ema_ref = jax.tree_util.tree_map(
            lambda e, p: d * np.asarray(e, np.float32) + (1 - d) * np.asarray(p, np.float32), ema_ref, params
        )
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(state.ema_params)), jax.tree_util.tree_leaves(ema_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_grad_accumulation_matches_big_batch():
    """k accumulated micro-steps == one step on the concatenated batch:
    MultiSteps averages the micro-gradients, and the L1 loss's gradient over
    the 2B batch is the mean of the two B-batch gradients."""
    import jax
    import jax.numpy as jnp

    from studiosr_tpu.parallel import build_optimizer, get_mesh, make_train_step, prepare_state, shard_batch
    from studiosr_tpu.utils.losses import l1_loss

    model = EDSR.build(scale=2, n_feats=8, n_resblocks=1)
    mesh = get_mesh()
    rng = np.random.default_rng(0)
    gt = rng.random((16, 16, 16, 3), dtype=np.float32)
    lq = gt.reshape(16, 8, 2, 8, 2, 3).mean(axis=(2, 4))

    # two micro-steps, accumulating
    tx_a = build_optimizer(learning_rate=1e-2, accum_steps=2)
    state_a = prepare_state(model.variables, tx_a, mesh)
    step_a = make_train_step(model.module, tx_a, l1_loss, bfloat16=False, mesh=mesh, donate=False)
    for half in (slice(0, 8), slice(8, 16)):
        b = shard_batch((jnp.asarray(lq[half]), jnp.asarray(gt[half])), mesh)
        state_a, _ = step_a(state_a, b[0], b[1], jax.random.PRNGKey(0))

    # one step on the full batch
    tx_b = build_optimizer(learning_rate=1e-2)
    state_b = prepare_state(model.variables, tx_b, mesh)
    step_b = make_train_step(model.module, tx_b, l1_loss, bfloat16=False, mesh=mesh, donate=False)
    b = shard_batch((jnp.asarray(lq), jnp.asarray(gt)), mesh)
    state_b, _ = step_b(state_b, b[0], b[1], jax.random.PRNGKey(0))

    pa = jax.device_get(state_a.params)
    pb = jax.device_get(state_b.params)
    for a, bb in zip(jax.tree_util.tree_leaves(pa), jax.tree_util.tree_leaves(pb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb), atol=1e-6)


def test_grad_accumulation_resumes_mid_window():
    """MultiSteps state (micro-step counter + gradient accumulator) survives
    the checkpoint bytes round-trip: save after micro-step 1 of 2, restore
    into a fresh state, finish the window — parameters match the
    uninterrupted run exactly."""
    import jax
    import jax.numpy as jnp
    from flax import serialization

    from studiosr_tpu.parallel import build_optimizer, get_mesh, make_train_step, prepare_state, shard_batch
    from studiosr_tpu.utils.losses import l1_loss

    model = EDSR.build(scale=2, n_feats=8, n_resblocks=1)
    mesh = get_mesh()
    rng = np.random.default_rng(1)
    gt = rng.random((16, 16, 16, 3), dtype=np.float32)
    lq = gt.reshape(16, 8, 2, 8, 2, 3).mean(axis=(2, 4))
    halves = [shard_batch((jnp.asarray(lq[s]), jnp.asarray(gt[s])), mesh) for s in (slice(0, 8), slice(8, 16))]

    def fresh():
        tx = build_optimizer(learning_rate=1e-2, accum_steps=2)
        return tx, prepare_state(model.variables, tx, mesh)

    # uninterrupted: two micro-steps
    tx_a, state_a = fresh()
    step_a = make_train_step(model.module, tx_a, l1_loss, bfloat16=False, mesh=mesh, donate=False)
    for b in halves:
        state_a, _ = step_a(state_a, b[0], b[1], jax.random.PRNGKey(0))

    # interrupted: one micro-step, opt_state through bytes, then the second
    tx_b, state_b = fresh()
    step_b = make_train_step(model.module, tx_b, l1_loss, bfloat16=False, mesh=mesh, donate=False)
    state_b, _ = step_b(state_b, halves[0][0], halves[0][1], jax.random.PRNGKey(0))
    blob_opt = serialization.to_bytes(jax.device_get(state_b.opt_state))
    blob_params = serialization.to_bytes(jax.device_get(state_b.params))
    _, state_c = fresh()
    state_c = state_c.replace(
        params=serialization.from_bytes(jax.device_get(state_c.params), blob_params),
        opt_state=serialization.from_bytes(jax.device_get(state_c.opt_state), blob_opt),
    )
    state_c, _ = step_b(state_c, halves[1][0], halves[1][1], jax.random.PRNGKey(0))

    for a, c in zip(jax.tree_util.tree_leaves(jax.device_get(state_a.params)),
                    jax.tree_util.tree_leaves(jax.device_get(state_c.params))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=0)


def test_ema_applies_once_per_optimizer_update_under_grad_accum():
    """With optax.MultiSteps (grad accumulation), k-1 of every k micro-steps
    apply NO optimizer update — the EMA must decay exactly once per real
    update, not once per micro-step (which compounds 0.999 at k=8 into an
    effective 0.992, an ~8x shorter EMA horizon)."""
    import jax
    import jax.numpy as jnp

    from studiosr_tpu.parallel import build_optimizer, get_mesh, make_train_step, prepare_state, shard_batch
    from studiosr_tpu.utils.losses import l1_loss

    model = EDSR.build(scale=2, n_feats=8, n_resblocks=1)
    k, d = 2, 0.75
    tx = build_optimizer(learning_rate=1e-2, accum_steps=k)
    state = prepare_state(model.variables, tx, ema_decay=d)
    step = make_train_step(model.module, tx, l1_loss, bfloat16=False, ema_decay=d, donate=False)

    rng = np.random.default_rng(0)
    gt = rng.random((8, 16, 16, 3), dtype=np.float32)
    lq = gt.reshape(8, 8, 2, 8, 2, 3).mean(axis=(2, 4))
    batch = shard_batch((jnp.asarray(lq), jnp.asarray(gt)), get_mesh())

    ema0 = jax.device_get(state.ema_params)
    params0 = jax.device_get(state.params)

    # Micro-step 1 of 2: no optimizer update applied -> EMA unchanged.
    state, _ = step(state, batch[0], batch[1], jax.random.PRNGKey(0))
    for a, b in zip(
        jax.tree_util.tree_leaves(jax.device_get(state.ema_params)),
        jax.tree_util.tree_leaves(ema0),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(
        jax.tree_util.tree_leaves(jax.device_get(state.params)),
        jax.tree_util.tree_leaves(params0),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # Micro-step 2 of 2: the update applies -> EMA decays exactly ONCE.
    state, _ = step(state, batch[0], batch[1], jax.random.PRNGKey(1))
    params1 = jax.device_get(state.params)
    want = jax.tree_util.tree_map(
        lambda e, p: d * np.asarray(e, np.float32) + (1 - d) * np.asarray(p, np.float32), ema0, params1
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(jax.device_get(state.ema_params)),
        jax.tree_util.tree_leaves(want),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
