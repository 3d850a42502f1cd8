"""Multi-chip validation on the virtual 8-device CPU mesh: sharded train
step, DP gradient equivalence, tiled inference, and the driver entry."""

import numpy as np
import pytest


def test_dryrun_multichip_8():
    import __graft_entry__ as graft

    graft.dryrun_multichip(8)


def test_entry_compiles_tiny():
    """entry() returns (fn, args) that jit-compile. Use eval_shape to avoid
    compiling the full flagship model on CPU in tests."""
    import jax

    import __graft_entry__ as graft

    fn, args = graft.entry()
    out = jax.eval_shape(fn, *args)
    assert out.shape == (1, 256, 256, 3)


def test_uint8_batches_match_prenormalized():
    """uint8 batches normalize inside the jitted step — the update must
    equal the pre-normalized float path to float rounding (XLA folds the
    /255 into a multiply by the reciprocal: ~1 ulp, not bitwise)."""
    import jax
    import jax.numpy as jnp
    import optax

    from studiosr_tpu.models import EDSR
    from studiosr_tpu.parallel import get_mesh, make_train_step, prepare_state, shard_batch
    from studiosr_tpu.utils.losses import l1_loss

    model = EDSR.build(scale=2, n_feats=8, n_resblocks=1)
    tx = optax.sgd(1e-2)
    mesh = get_mesh(jax.devices()[:1])
    rng = np.random.default_rng(9)
    lq8 = rng.integers(0, 256, (2, 8, 8, 3), dtype=np.uint8)
    gt8 = rng.integers(0, 256, (2, 16, 16, 3), dtype=np.uint8)
    key = jax.random.PRNGKey(3)
    step = make_train_step(model.module, tx, l1_loss, bfloat16=False, mesh=mesh, donate=False)

    s_u8, loss_u8 = step(
        prepare_state(model.variables, tx, mesh), *shard_batch((jnp.asarray(lq8), jnp.asarray(gt8)), mesh), key
    )
    f = lambda a: jnp.asarray(a.astype(np.float32) / 255.0)
    s_f, loss_f = step(prepare_state(model.variables, tx, mesh), *shard_batch((f(lq8), f(gt8)), mesh), key)

    np.testing.assert_allclose(float(loss_u8), float(loss_f), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s_u8.params), jax.tree_util.tree_leaves(s_f.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_chained_train_step_matches_sequential():
    """chain=2 (one jit, lax.scan over steps — the dispatch-free bench mode)
    must produce the same state/loss as two sequential step calls with the
    per-step folded rngs."""
    import jax
    import jax.numpy as jnp
    import optax

    from studiosr_tpu.models import EDSR
    from studiosr_tpu.parallel import get_mesh, make_train_step, prepare_state, shard_batch
    from studiosr_tpu.utils.losses import l1_loss

    model = EDSR.build(scale=2, n_feats=8, n_resblocks=1)
    tx = optax.sgd(1e-2)
    mesh = get_mesh(jax.devices()[:1])
    rng = np.random.default_rng(4)
    lq, gt = shard_batch(
        (jnp.asarray(rng.random((2, 8, 8, 3), np.float32)), jnp.asarray(rng.random((2, 16, 16, 3), np.float32))),
        mesh,
    )
    key = jax.random.PRNGKey(7)

    step = make_train_step(model.module, tx, l1_loss, bfloat16=False, mesh=mesh, donate=False)
    state = prepare_state(model.variables, tx, mesh)
    state, _ = step(state, lq, gt, jax.random.fold_in(key, 0))
    state, loss_seq = step(state, lq, gt, jax.random.fold_in(key, 1))

    chained = make_train_step(model.module, tx, l1_loss, bfloat16=False, mesh=mesh, donate=False, chain=2)
    state_c, loss_chain = chained(prepare_state(model.variables, tx, mesh), lq, gt, key)

    np.testing.assert_allclose(float(loss_seq), float(loss_chain), atol=1e-7)
    for a, b in zip(jax.tree_util.tree_leaves(state.params), jax.tree_util.tree_leaves(state_c.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_dp_matches_single_device():
    """The sharded train step must produce the same update as single-device
    execution (gradient all-reduce correctness)."""
    import jax
    import jax.numpy as jnp

    from studiosr_tpu.models import EDSR
    from studiosr_tpu.parallel import build_optimizer, get_mesh, make_train_step, prepare_state, shard_batch
    from studiosr_tpu.utils.losses import l1_loss

    import optax

    model = EDSR.build(scale=2, n_feats=8, n_resblocks=1)
    # SGD so the parameter delta is exactly the (all-reduced) gradient:
    # Adam's sqrt-normalization would amplify reduction-order noise near
    # zero-gradient coordinates to lr-scale sign flips.
    tx = optax.sgd(1e-2)

    rng = np.random.default_rng(0)
    lq = rng.random((8, 8, 8, 3), dtype=np.float32)
    gt = rng.random((8, 16, 16, 3), dtype=np.float32)
    key = jax.random.PRNGKey(0)

    results = []
    for devices in (jax.devices()[:1], jax.devices()[:8]):
        mesh = get_mesh(devices)
        state = prepare_state(model.variables, tx, mesh)
        step = make_train_step(model.module, tx, l1_loss, bfloat16=False, mesh=mesh, donate=False)
        batch = shard_batch((jnp.asarray(lq), jnp.asarray(gt)), mesh)
        new_state, loss = step(state, batch[0], batch[1], key)
        results.append((float(loss), jax.device_get(new_state.params)))

    (loss1, params1), (loss8, params8) = results
    assert abs(loss1 - loss8) < 1e-6
    flat1 = jax.tree_util.tree_leaves(params1)
    flat8 = jax.tree_util.tree_leaves(params8)
    for a, b in zip(flat1, flat8):
        np.testing.assert_allclose(a, b, atol=1e-5)  # cross-shard reduction order


def test_multislice_mesh_matches_single_device():
    """A 2-D ("dcn", "data") multi-slice mesh (2 virtual slices x 4 devices)
    must produce the same update as single-device execution — batch sharded
    over BOTH axes, gradient reduction lowered hierarchically by XLA."""
    import jax
    import jax.numpy as jnp

    import optax

    from studiosr_tpu.models import EDSR
    from studiosr_tpu.parallel import build_optimizer, make_train_step, prepare_state, shard_batch
    from studiosr_tpu.parallel.mesh import get_mesh, get_multislice_mesh
    from studiosr_tpu.utils.losses import l1_loss

    model = EDSR.build(scale=2, n_feats=8, n_resblocks=1)
    tx = optax.sgd(1e-2)  # see test_dp_matches_single_device

    rng = np.random.default_rng(1)
    lq = rng.random((8, 8, 8, 3), dtype=np.float32)
    gt = rng.random((8, 16, 16, 3), dtype=np.float32)
    key = jax.random.PRNGKey(0)

    results = []
    for mesh in (get_mesh(jax.devices()[:1]), get_multislice_mesh(2, jax.devices()[:8])):
        state = prepare_state(model.variables, tx, mesh)
        step = make_train_step(model.module, tx, l1_loss, bfloat16=False, mesh=mesh, donate=False)
        batch = shard_batch((jnp.asarray(lq), jnp.asarray(gt)), mesh)
        new_state, loss = step(state, batch[0], batch[1], key)
        results.append((float(loss), jax.device_get(new_state.params)))

    (loss1, params1), (loss2, params2) = results
    assert abs(loss1 - loss2) < 1e-6
    for a, b in zip(jax.tree_util.tree_leaves(params1), jax.tree_util.tree_leaves(params2)):
        np.testing.assert_allclose(a, b, atol=1e-5)


def test_tiled_inference_matches_whole_image_conv():
    """For a pure local-conv model with enough overlap, tiled inference must
    equal whole-image inference except at tile borders; with halo >= receptive
    field it matches everywhere."""
    from studiosr_tpu.models import ESPCN
    from studiosr_tpu.parallel.tiled import tiled_inference

    model = ESPCN.build(scale=2)
    image = np.random.default_rng(0).integers(0, 256, (40, 56, 3), dtype=np.uint8)
    whole = model.inference(image)
    tiled = tiled_inference(model, image, tile=24, tile_overlap=6, tile_batch=4)
    np.testing.assert_array_equal(whole, tiled)


def test_tiled_inference_image_smaller_than_tile():
    """Default tile/overlap on a small frame: the tile clamps to the image,
    and the overlap must clamp with it (the unclamped default drove the
    stride negative and crashed on the assert)."""
    from studiosr_tpu.models import ESPCN
    from studiosr_tpu.parallel.tiled import tiled_inference

    model = ESPCN.build(scale=2)
    image = np.random.default_rng(6).integers(0, 256, (30, 30, 3), dtype=np.uint8)
    out = tiled_inference(model, image, tile=128, tile_overlap=16, tile_batch=4)
    np.testing.assert_array_equal(out, model.inference(image))


def test_tiled_device_loop_matches_host_loop():
    """The one-jit device tile loop must be pixel-identical to the host loop
    (same grid, same interior-write order — including a snapped last tile
    whose interior overwrites its predecessor's) and to whole-image
    inference for a local-conv model with halo >= receptive field."""
    from studiosr_tpu.models import ESPCN
    from studiosr_tpu.parallel.tiled import tiled_inference

    model = ESPCN.build(scale=2)
    # 40 is not a multiple of stride 12 -> the last tile snaps to the edge.
    image = np.random.default_rng(3).integers(0, 256, (40, 58, 3), dtype=np.uint8)
    whole = model.inference(image)
    host = tiled_inference(model, image, tile=24, tile_overlap=6, tile_batch=4, device_loop=False)
    dev = tiled_inference(model, image, tile=24, tile_overlap=6, tile_batch=4, device_loop=True)
    np.testing.assert_array_equal(host, dev)
    np.testing.assert_array_equal(whole, dev)


def test_tiled_device_loop_fetch_stream_counts():
    """The chunked-fetch frame split must be invariant to the stream count,
    including the degenerate single-chunk case and more streams than output
    rows (clamped). Each count builds a distinct jit program."""
    import studiosr_tpu.parallel.tiled as tiled_mod
    from studiosr_tpu.models import ESPCN
    from studiosr_tpu.parallel.tiled import tiled_inference

    model = ESPCN.build(scale=2)
    image = np.random.default_rng(5).integers(0, 256, (40, 58, 3), dtype=np.uint8)
    whole = model.inference(image)
    orig = tiled_mod._FETCH_STREAMS
    try:
        for streams in (1, 3, 1000):
            tiled_mod._FETCH_STREAMS = streams  # part of the program cache key
            dev = tiled_inference(model, image, tile=24, tile_overlap=6, tile_batch=4, device_loop=True)
            np.testing.assert_array_equal(whole, dev)
    finally:
        tiled_mod._FETCH_STREAMS = orig


def test_tiled_inference_short_wide_image():
    """Tile larger than one image dimension: edge-pad fallback path."""
    from studiosr_tpu.models import ESPCN
    from studiosr_tpu.parallel.tiled import tiled_inference

    model = ESPCN.build(scale=2)
    image = np.random.default_rng(2).integers(0, 256, (10, 90, 3), dtype=np.uint8)
    out = tiled_inference(model, image, tile=32, tile_overlap=8, tile_batch=4)
    assert out.shape == (20, 180, 3)


def test_tiled_inference_sharded_over_mesh():
    """Both mesh modes — host loop (one dispatch per sharded batch) and
    device loop (ONE dispatch, batches sharded inside lax.map) — must equal
    whole-image inference exactly."""
    from studiosr_tpu.models import ESPCN
    from studiosr_tpu.parallel import get_mesh
    from studiosr_tpu.parallel.tiled import tiled_inference

    model = ESPCN.build(scale=2)
    mesh = get_mesh()
    image = np.random.default_rng(1).integers(0, 256, (64, 64, 3), dtype=np.uint8)
    whole = model.inference(image)
    host = tiled_inference(model, image, tile=32, tile_overlap=8, tile_batch=8, mesh=mesh, device_loop=False)
    dev = tiled_inference(model, image, tile=32, tile_overlap=8, tile_batch=8, mesh=mesh, device_loop=True)
    np.testing.assert_array_equal(whole, host)
    np.testing.assert_array_equal(whole, dev)


def test_tiled_inference_sharded_over_multislice_mesh():
    """Tiled inference with tile batches sharded over a 2-D ("dcn", "data")
    mesh — the data_sharding all-axes default's serving-side consumer."""
    from studiosr_tpu.models import ESPCN
    from studiosr_tpu.parallel.mesh import get_multislice_mesh
    from studiosr_tpu.parallel.tiled import tiled_inference

    model = ESPCN.build(scale=2)
    mesh = get_multislice_mesh(2)
    image = np.random.default_rng(4).integers(0, 256, (64, 64, 3), dtype=np.uint8)
    whole = model.inference(image)
    dev = tiled_inference(model, image, tile=32, tile_overlap=8, tile_batch=8, mesh=mesh, device_loop=True)
    np.testing.assert_array_equal(whole, dev)


def test_tiled_inference_sharded_fused_swinir():
    """The fused Pallas serving path must run under mesh-sharded tiled
    inference (pallas_call inside the sharded jit on every device) — the
    multi-chip serving configuration for the transformer models."""
    import jax

    from studiosr_tpu.models import SwinIR
    from studiosr_tpu.parallel import get_mesh
    from studiosr_tpu.parallel.tiled import tiled_inference
    from studiosr_tpu.utils.metrics import compute_psnr

    model = SwinIR.build(scale=2, embed_dim=16, depths=[1], num_heads=[2], window_size=8)
    model.enable_fused(True)
    mesh = get_mesh()
    image = np.random.default_rng(2).integers(0, 256, (48, 48, 3), dtype=np.uint8)
    whole = model.inference(image)
    tiled = tiled_inference(model, image, tile=24, tile_overlap=8, tile_batch=8, mesh=mesh)
    assert tiled.shape == whole.shape
    # overlap-discard tiling is approximate for window attention: assert
    # PSNR-level equivalence, not bit equality.
    assert compute_psnr(tiled, whole) > 40.0


def test_sharded_tiled_fused_runs_manual_spmd():
    """Fused serving over a >1-device mesh must route through shard_map
    (Model.needs_manual_spmd: Mosaic kernels cannot be GSPMD-auto-
    partitioned — GSPMD jit raises NotImplementedError at lowering on real
    multi-chip hardware). Per shard the FULL single-chip fused path runs,
    so the per-image fused tails ENGAGE (the old GSPMD path had to decline
    them to keep the device-sharded batch parallel); outputs must match
    single-chip tiled serving."""
    from studiosr_tpu.models import SwinIR
    from studiosr_tpu.ops.pallas import engagement
    from studiosr_tpu.parallel import get_mesh
    from studiosr_tpu.parallel.tiled import tiled_inference

    model = SwinIR.build(
        scale=4, embed_dim=16, depths=[1], num_heads=[2], window_size=8, fast_init=True
    )
    model.enable_fused(True)
    assert model.needs_manual_spmd(get_mesh()) and not model.needs_manual_spmd(None)
    image = np.random.default_rng(3).integers(0, 256, (48, 64, 3), dtype=np.uint8)

    engagement.reset()
    sharded = tiled_inference(model, image, tile=24, tile_overlap=8, tile_batch=8, mesh=get_mesh())
    rec = engagement.counters().get("fused_upsample_x4", {})
    assert rec.get("engaged", 0) >= 1 and rec.get("fallback", 0) == 0

    # The host-loop mesh path (manual_forward_uint8) is a separate branch.
    sharded_host = tiled_inference(
        model, image, tile=24, tile_overlap=8, tile_batch=8, mesh=get_mesh(), device_loop=False
    )

    engagement.reset()
    single = tiled_inference(model, image, tile=24, tile_overlap=8, tile_batch=8)
    rec = engagement.counters().get("fused_upsample_x4", {})
    assert rec.get("engaged", 0) >= 1

    assert sharded.shape == sharded_host.shape == single.shape == (192, 256, 3)
    assert np.abs(sharded.astype(int) - single.astype(int)).max() <= 1
    np.testing.assert_array_equal(sharded_host, sharded)

    # The GSPMD sharded-batch contract (forward_uint8 sharded=True via
    # Model._forward_sharded) still declines the per-image tail lax.map —
    # it would serialize a device-sharded batch. Only non-fused models
    # reach it from tiled_inference now, but the contract stays pinned.
    import jax.numpy as jnp

    engagement.reset()
    batch = np.random.default_rng(4).integers(0, 256, (4, 24, 24, 3), dtype=np.uint8)
    out_decl = model.forward_uint8(jnp.asarray(batch), sharded=True)
    rec = engagement.counters().get("fused_upsample_x4", {})
    assert rec.get("fallback", 0) >= 1 and "batched_map disabled" in rec.get("reason", "")
    assert np.asarray(out_decl).shape == (4, 96, 96, 3)


def test_every_fused_capable_model_reports_manual_spmd():
    """EVERY model with a fused serving path must flag needs_manual_spmd on
    a >1-device mesh once fused — a model that forgets to set _fused in
    enable_fused silently takes the GSPMD path and crashes at lowering on a
    real pod (the exact bug class this pins: MaxSR.enable_fused once only
    cloned the module without setting the flag)."""
    from studiosr_tpu.models import HAT, MaxSR, SwinFIR, SwinIR
    from studiosr_tpu.parallel import get_mesh

    mesh = get_mesh()
    tiny = dict(scale=2, embed_dim=16, depths=[1], num_heads=[2], window_size=8, fast_init=True)
    models = [
        SwinIR.build(**tiny),
        SwinFIR.build(**tiny),
        HAT.build(scale=2, embed_dim=30, depths=[1], num_heads=[2], window_size=8,
                  fast_init=True),
        MaxSR.build(scale=2, dim=32, dim_head=16, depth=(1, 1, 1, 1), adaptive=False,
                    fast_init=True),
    ]
    for model in models:
        name = type(model).__name__
        assert not model.needs_manual_spmd(mesh), name  # unfused: GSPMD fine
        model.enable_fused(True)
        assert model.needs_manual_spmd(mesh), name
        assert not model.needs_manual_spmd(None), name
        model.enable_fused(False)
        assert not model.needs_manual_spmd(mesh), name


def test_maxsr_fused_mesh_serving_matches_single_chip():
    """The fused-MaxSR mesh path end to end: manual_forward_uint8 (shard_map
    over the 8-device mesh, batch sharded) must reproduce the single-chip
    fused forward_uint8 exactly. Real weights — zero-init would make the
    output constant and the parity vacuous."""
    import jax.numpy as jnp

    from studiosr_tpu.models import MaxSR
    from studiosr_tpu.parallel import get_mesh

    model = MaxSR.build(scale=2, adaptive=False, dim=32, dim_head=8, depth=[1, 1], window_size=8, dropout=0.0)
    model.enable_fused(True)
    mesh = get_mesh()
    assert model.needs_manual_spmd(mesh)
    batch = np.random.default_rng(5).integers(0, 256, (8, 16, 16, 3), dtype=np.uint8)
    single = np.asarray(model.forward_uint8(jnp.asarray(batch)))
    sharded = np.asarray(model.manual_forward_uint8(jnp.asarray(batch), mesh))
    np.testing.assert_array_equal(sharded, single)


def test_manual_shard_map_step_matches_automatic():
    """Fused-training modules must run under jax.shard_map on multi-device
    meshes: Mosaic (Pallas TPU) kernels cannot be GSPMD-auto-partitioned —
    jit raises NotImplementedError at lowering on real multi-chip hardware
    (jax tpu_custom_call.py; the CPU test mesh never sees it because the
    kernels run in interpret mode there). The manual step (per-shard
    compute + pmean gradient sync) must reproduce the automatic GSPMD
    update exactly, on both the 1-D and the 2-D multislice mesh."""
    import jax
    import jax.numpy as jnp
    import optax

    from studiosr_tpu.models.swinir import SwinIRModule
    from studiosr_tpu.parallel import get_mesh, make_train_step, prepare_state, shard_batch
    from studiosr_tpu.parallel.mesh import get_multislice_mesh
    from studiosr_tpu.utils.losses import l1_loss

    module = SwinIRModule(
        scale=2,
        embed_dim=16,
        depths=(2,),
        num_heads=(2,),
        window_size=8,
        mlp_ratio=2.0,
        drop_path_rate=0.0,
        upsampler="pixelshuffledirect",
        fused_train=True,
    )
    rng = np.random.default_rng(11)
    lq = jnp.asarray(rng.random((8, 16, 16, 3), np.float32))
    gt = jnp.asarray(rng.random((8, 32, 32, 3), np.float32))
    variables = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3), jnp.float32))
    # SGD: the parameter delta is exactly the synced gradient (see
    # test_dp_matches_single_device for why not Adam).
    tx = optax.sgd(1e-2)
    key = jax.random.PRNGKey(3)

    results = []
    for mesh, manual in (
        (get_mesh(jax.devices()[:8]), False),
        (get_mesh(jax.devices()[:8]), True),  # auto-resolution also picks True here
        (get_multislice_mesh(2, jax.devices()[:8]), True),  # 2-D ("dcn","data") pmean
    ):
        state = prepare_state(variables, tx, mesh)
        step = make_train_step(module, tx, l1_loss, bfloat16=False, mesh=mesh, donate=False, manual=manual)
        b_lq, b_gt = shard_batch((lq, gt), mesh)
        new_state, loss = step(state, b_lq, b_gt, key)
        results.append((float(loss), jax.device_get(new_state.params)))

    (l_auto, p_auto) = results[0]
    for l_man, p_man in results[1:]:
        assert abs(l_auto - l_man) < 1e-6
        for a, b in zip(jax.tree_util.tree_leaves(p_auto), jax.tree_util.tree_leaves(p_man)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_manual_step_batchnorm_matches_on_identical_shards():
    """Manual SPMD with a BatchNorm model uses per-shard normalization with
    pmean-ed running stats (DDP-without-SyncBN semantics — documented in
    make_train_step), so it does NOT generally equal the automatic path's
    exact global-batch stats. With a batch of 8 IDENTICAL samples the
    per-shard reductions equal the global ones, so the two paths must agree
    exactly — pinning the shard_map specs / pmean wiring for the
    batch_stats collection."""
    import jax
    import jax.numpy as jnp
    import optax

    from studiosr_tpu.models import SRResNet
    from studiosr_tpu.parallel import get_mesh, make_train_step, prepare_state, shard_batch
    from studiosr_tpu.utils.losses import l1_loss

    model = SRResNet.build(scale=2, channels=8, num_rcb=1)
    tx = optax.sgd(1e-2)
    rng = np.random.default_rng(5)
    lq = jnp.asarray(np.repeat(rng.random((1, 8, 8, 3), np.float32), 8, axis=0))
    gt = jnp.asarray(np.repeat(rng.random((1, 16, 16, 3), np.float32), 8, axis=0))
    key = jax.random.PRNGKey(1)

    results = []
    for manual in (False, True):
        mesh = get_mesh(jax.devices()[:8])
        state = prepare_state(model.variables, tx, mesh)
        step = make_train_step(model.module, tx, l1_loss, bfloat16=False, mesh=mesh, donate=False, manual=manual)
        b_lq, b_gt = shard_batch((lq, gt), mesh)
        new_state, loss = step(state, b_lq, b_gt, key)
        assert np.isfinite(float(loss))
        results.append((float(loss), jax.device_get(new_state.params), jax.device_get(new_state.batch_stats)))

    (l_a, p_a, s_a), (l_m, p_m, s_m) = results
    assert abs(l_a - l_m) < 1e-6
    for a, b in zip(jax.tree_util.tree_leaves(p_a), jax.tree_util.tree_leaves(p_m)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s_a), jax.tree_util.tree_leaves(s_m)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_manual_step_maxsr_fused_with_batchnorm():
    """MaxSR fused_train is the hardest manual-SPMD combination: custom-VJP
    Pallas blocks AND BatchNorm AND dropout rngs in one module. With
    identical shards (see test_manual_step_batchnorm_matches_on_identical_
    shards) and dropout disabled the manual step must equal the automatic
    one exactly."""
    import jax
    import jax.numpy as jnp
    import optax

    from studiosr_tpu.models.maxsr import MaxSRModule
    from studiosr_tpu.parallel import get_mesh, make_train_step, prepare_state, shard_batch
    from studiosr_tpu.utils.losses import l1_loss

    module = MaxSRModule(
        scale=2, dim=32, dim_head=8, depth=(1, 1), window_size=4, dropout=0.0,
        adaptive=False, fused_train=True,
    )
    rng = np.random.default_rng(7)
    lq = jnp.asarray(np.repeat(rng.random((1, 16, 16, 3), np.float32), 8, axis=0))
    gt = jnp.asarray(np.repeat(rng.random((1, 32, 32, 3), np.float32), 8, axis=0))
    variables = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3), jnp.float32), train=True)
    tx = optax.sgd(1e-2)
    key = jax.random.PRNGKey(2)

    results = []
    for manual in (False, True):
        mesh = get_mesh(jax.devices()[:8])
        state = prepare_state(variables, tx, mesh)
        step = make_train_step(module, tx, l1_loss, bfloat16=False, mesh=mesh, donate=False, manual=manual)
        b_lq, b_gt = shard_batch((lq, gt), mesh)
        new_state, loss = step(state, b_lq, b_gt, key)
        assert np.isfinite(float(loss))
        results.append((float(loss), jax.device_get(new_state.params), jax.device_get(new_state.batch_stats)))

    (l_a, p_a, s_a), (l_m, p_m, s_m) = results
    assert abs(l_a - l_m) < 1e-6
    for a, b in zip(jax.tree_util.tree_leaves(p_a), jax.tree_util.tree_leaves(p_m)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s_a), jax.tree_util.tree_leaves(s_m)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_manual_chained_batches_matches_sequential_with_donate():
    """The production Trainer path on a pod: manual SPMD + donated state +
    steps_per_dispatch (chain_batches — batches stacked on axis 0, sharded
    on axis 1 under P(None, axes)). k=2 in one dispatch must equal two
    sequential manual steps."""
    import jax
    import jax.numpy as jnp
    import optax

    from studiosr_tpu.models.swinir import SwinIRModule
    from studiosr_tpu.parallel import get_mesh, make_train_step, prepare_state, shard_batch
    from studiosr_tpu.utils.losses import l1_loss

    module = SwinIRModule(
        scale=2, embed_dim=16, depths=(2,), num_heads=(2,), window_size=8,
        mlp_ratio=2.0, drop_path_rate=0.0, upsampler="pixelshuffledirect",
        fused_train=True,
    )
    rng = np.random.default_rng(13)
    lqs = jnp.asarray(rng.random((2, 8, 16, 16, 3), np.float32))
    gts = jnp.asarray(rng.random((2, 8, 32, 32, 3), np.float32))
    variables = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3), jnp.float32))
    tx = optax.sgd(1e-2)
    keys = jax.random.split(jax.random.PRNGKey(5), 2)
    mesh = get_mesh(jax.devices()[:8])

    step = make_train_step(module, tx, l1_loss, bfloat16=False, mesh=mesh, donate=False, manual=True)
    state = prepare_state(variables, tx, mesh)
    for i in range(2):
        b_lq, b_gt = shard_batch((lqs[i], gts[i]), mesh)
        state, loss_seq = step(state, b_lq, b_gt, keys[i])

    chained = make_train_step(
        module, tx, l1_loss, bfloat16=False, mesh=mesh, donate=True, manual=True, chain=2, chain_batches=True
    )
    b_lqs, b_gts = shard_batch((lqs, gts), mesh, axis=1)
    state_c, losses = chained(prepare_state(variables, tx, mesh), b_lqs, b_gts, jnp.stack(keys))

    np.testing.assert_allclose(float(loss_seq), float(losses[-1]), atol=1e-7)
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(state.params)),
                    jax.tree_util.tree_leaves(jax.device_get(state_c.params))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
