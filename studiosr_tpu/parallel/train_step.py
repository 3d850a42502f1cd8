"""Jitted, mesh-sharded training step.

One XLA program per optimizer step: forward (optionally bf16 autocast),
loss, backward, Adam update, all fused and data-parallel over the mesh's
``data`` axis. Gradient synchronization is the XLA-inserted ``psum`` from
reducing the loss over the sharded batch axis — the TPU-native equivalent of
DDP's NCCL all-reduce (reference ``engine/trainer.py:89-106``).

BatchNorm models: batch statistics are computed over the *global* batch under
jit (XLA lowers the cross-shard mean to collectives), which is exactly
SyncBatchNorm semantics (reference ``trainer.py:90``) with no extra code.

bf16 policy: parameters and optimizer state stay float32 (master weights);
inside the step the params and batch are cast to bfloat16 for the forward,
and the loss/gradients come back in float32 — the autocast analog
(``trainer.py:69,80``) in TPU's native dtype.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Sequence

import flax
import jax
import jax.numpy as jnp
import optax

from studiosr_tpu.parallel.mesh import data_sharding, get_mesh, replicate, replicate_sharding

__all__ = ["TrainState", "multistep_schedule", "build_optimizer", "make_train_step"]


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any  # {} for models without BatchNorm
    opt_state: Any
    step: jnp.ndarray
    # EMA shadow of ``params`` (None = disabled). The reference zoo ships
    # EMA checkpoints (HAT loads key ``params_ema``, ``hat.py:576-593``)
    # but its Trainer never produces them; here the EMA update rides the
    # same jitted step (one fused elementwise pass, replicated like params).
    ema_params: Any = None


def multistep_schedule(learning_rate: float, milestones: Sequence[int], gamma: float) -> optax.Schedule:
    """MultiStepLR analog: lr * gamma^(milestones passed) (``trainer.py:140-145``)."""
    if not milestones:
        return optax.constant_schedule(learning_rate)
    return optax.piecewise_constant_schedule(learning_rate, {int(m): gamma for m in milestones})


def build_optimizer(
    learning_rate: float = 2e-4,
    beta1: float = 0.9,
    beta2: float = 0.99,
    weight_decay: float = 0.0,
    milestones: Sequence[int] = (),
    gamma: float = 0.5,
    accum_steps: int = 1,
) -> optax.GradientTransformation:
    """Adam with torch-style L2 (decay added to the raw gradient, before the
    moment estimates) and a multistep schedule (``trainer.py:133-145``).

    ``accum_steps > 1`` wraps the chain in ``optax.MultiSteps``: gradients
    from k consecutive micro-steps are averaged before one optimizer update
    (effective batch = k x batch). Milestones then count OPTIMIZER steps,
    not micro-iterations."""
    schedule = multistep_schedule(learning_rate, milestones, gamma)
    chain = []
    if weight_decay:
        chain.append(optax.add_decayed_weights(weight_decay))
    chain.append(optax.scale_by_adam(b1=beta1, b2=beta2))
    chain.append(optax.scale_by_learning_rate(schedule))
    tx = optax.chain(*chain)
    if accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=int(accum_steps))
    return tx


def make_train_step(
    module,
    tx: optax.GradientTransformation,
    loss_fn: Callable,
    bfloat16: bool = True,
    mesh=None,
    donate: bool = True,
    ema_decay: float = 0.0,
    chain: int = 0,
    chain_batches: bool = False,
    manual: bool = None,
):
    """Build ``(state, lq, gt, rng) -> (state, loss)`` jitted over ``mesh``.

    The returned callable expects the state replicated and the batch sharded
    on the mesh's data axis (see :func:`prepare_state` / ``shard_batch``).

    ``chain > 0`` runs that many optimizer steps per call under ``lax.scan``
    (rng folded per step, the SAME batch re-used each step) — a benchmarking
    mode that measures pure device step time with one dispatch/fetch,
    independent of the per-call RPC overhead of a relay-attached chip.

    ``chain_batches=True`` (with ``chain=k``) is the PRODUCTION chained
    form (Trainer ``steps_per_dispatch``): the callable becomes
    ``(state, lqs, gts, rngs) -> (state, losses)`` where ``lqs``/``gts``
    stack k batches on a new leading axis (sharded on axis 1 —
    ``shard_batch(..., axis=1)``), ``rngs`` stacks k per-step keys, and
    ``losses`` has shape (k,). Step i consumes batch i with key i — the
    exact sequence k separate calls would run, in one dispatch.

    ``manual``: run the step under ``jax.shard_map`` (manual SPMD) instead
    of GSPMD automatic partitioning. REQUIRED for fused-training modules on
    a >1-device mesh: Mosaic (Pallas TPU) custom calls cannot be
    automatically partitioned — jit raises ``NotImplementedError: Mosaic
    kernels cannot be automatically partitioned`` at lowering on real
    multi-chip hardware (jax ``tpu_custom_call.py``; the virtual CPU test
    mesh never sees this because CPU kernels run in interpret mode).
    ``None`` (default) auto-selects: manual when the mesh has >1 device and
    the module was built with ``fused_train=True``. Under manual SPMD each
    device computes its local batch shard through the Pallas kernels,
    gradients/loss are ``pmean``-ed over all mesh axes (XLA lowers the
    multi-axis pmean hierarchically on a ("dcn","data") mesh), and the
    dropout rng is folded with the device index so per-shard masks differ.
    BatchNorm models: batch statistics become per-shard (normalization over
    the local batch, running stats averaged across devices) — standard
    DDP-without-SyncBN semantics, unlike the automatic path's exact
    global-batch stats; of the fused-training families only MaxSR carries
    BatchNorm.
    """
    mesh = mesh if mesh is not None else get_mesh()
    if manual is None:
        manual = mesh.size > 1 and bool(getattr(module, "fused_train", False))
    axis_names = tuple(mesh.axis_names)

    def loss_and_updates(params, batch_stats, lq, gt, rng):
        if manual:
            # Distinct per-shard dropout/droppath masks: fold the linear
            # device index into the (replicated) step key.
            idx = jnp.int32(0)
            for name in axis_names:
                idx = idx * mesh.shape[name] + jax.lax.axis_index(name)
            rng = jax.random.fold_in(rng, idx)
        compute_params = params
        # uint8 batches normalize on device (the loader's host-side
        # astype(float32)/255 math to float rounding — XLA folds /255 into a
        # reciprocal multiply) — the host boundary carries 4x fewer bytes.
        if lq.dtype == jnp.uint8:
            lq = lq.astype(jnp.float32) / 255.0
        if gt.dtype == jnp.uint8:
            gt = gt.astype(jnp.float32) / 255.0
        x = lq
        if bfloat16:
            compute_params = jax.tree_util.tree_map(lambda p: p.astype(jnp.bfloat16), params)
            x = x.astype(jnp.bfloat16)
        if batch_stats:
            out, mutated = module.apply(
                {"params": compute_params, "batch_stats": batch_stats},
                x,
                train=True,
                rngs={"dropout": rng},
                mutable=["batch_stats"],
            )
            new_stats = mutated["batch_stats"]
        else:
            out = module.apply({"params": compute_params}, x, train=True, rngs={"dropout": rng})
            new_stats = batch_stats
        loss = loss_fn(out.astype(jnp.float32), gt)
        return loss, new_stats

    def step_fn(state: TrainState, lq, gt, rng):
        grad_fn = jax.value_and_grad(loss_and_updates, has_aux=True)
        (loss, new_stats), grads = grad_fn(state.params, state.batch_stats, lq, gt, rng)
        grads = jax.tree_util.tree_map(lambda g: g.astype(jnp.float32), grads)
        if manual:
            # The cross-device gradient sync GSPMD would otherwise insert.
            grads = jax.lax.pmean(grads, axis_names)
            loss = jax.lax.pmean(loss, axis_names)
            if new_stats:
                new_stats = jax.lax.pmean(new_stats, axis_names)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_ema = state.ema_params
        if ema_decay:
            d = jnp.float32(ema_decay)
            new_ema = jax.tree_util.tree_map(
                lambda e, p: d * e + (1.0 - d) * p.astype(jnp.float32), state.ema_params, new_params
            )
            if hasattr(new_opt_state, "mini_step"):
                # Grad accumulation (optax.MultiSteps): only the k-th
                # micro-step applies an optimizer update; decaying the EMA
                # on the k-1 no-op micro-steps too would compound the
                # configured decay to d^k per real update (0.999 at k=8 ->
                # effective 0.992, an ~8x shorter EMA horizon). mini_step
                # wraps to 0 exactly when the update was applied.
                applied = new_opt_state.mini_step == 0
                new_ema = jax.tree_util.tree_map(
                    lambda u, e: jnp.where(applied, u, e), new_ema, state.ema_params
                )
        return (
            TrainState(
                params=new_params,
                batch_stats=new_stats,
                opt_state=new_opt_state,
                step=state.step + 1,
                ema_params=new_ema,
            ),
            loss,
        )

    repl = replicate_sharding(mesh)
    batch_sh = data_sharding(mesh, 4)
    if chain and chain_batches:

        def stacked_fn(state: TrainState, lqs, gts, rngs):
            def body(carry, xs):
                lq, gt, r = xs
                new_state, loss = step_fn(carry, lq, gt, r)
                return new_state, loss

            return jax.lax.scan(body, state, (lqs, gts, rngs))

        outer_fn = stacked_fn
        batch_sh = data_sharding(mesh, 5, axis=1)
    elif chain:

        def chained_fn(state: TrainState, lq, gt, rng):
            def body(carry, i):
                new_state, loss = step_fn(carry, lq, gt, jax.random.fold_in(rng, i))
                return new_state, loss

            state, losses = jax.lax.scan(body, state, jnp.arange(chain))
            return state, losses[-1]

        outer_fn = chained_fn
    else:
        outer_fn = step_fn

    if manual:
        from jax.sharding import PartitionSpec as P

        batch_spec = P(None, axis_names) if (chain and chain_batches) else P(axis_names)
        sharded = jax.shard_map(
            outer_fn,
            mesh=mesh,
            in_specs=(P(), batch_spec, batch_spec, P()),
            out_specs=(P(), P()),
            # pmean makes state/loss device-invariant, but optax chains
            # (MultiSteps counters, schedule conds) defeat the automatic
            # variance checker.
            check_vma=False,
        )
        return jax.jit(sharded, donate_argnums=(0,) if donate else ())

    jitted = jax.jit(
        outer_fn,
        in_shardings=(repl, batch_sh, batch_sh, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate else (),
    )
    return jitted


def prepare_state(
    variables: Dict[str, Any], tx: optax.GradientTransformation, mesh=None, ema_decay: float = 0.0
) -> TrainState:
    """Build a replicated TrainState from model variables. ``ema_decay > 0``
    seeds the EMA shadow from the initial parameters."""
    mesh = mesh if mesh is not None else get_mesh()
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    ema = None
    if ema_decay:
        # copy=True: f32 params would otherwise alias the same buffers as
        # ``params``, and the donated step would donate each twice.
        ema = jax.tree_util.tree_map(lambda p: jnp.array(p, dtype=jnp.float32, copy=True), params)
    state = TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
        ema_params=ema,
    )
    return replicate(state, mesh)
