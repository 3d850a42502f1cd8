"""Iteration-based trainer: jitted train step, mesh data-parallelism,
checkpoint/resume, periodic best-PSNR-gated evaluation.

Same training capabilities as the reference ``studiosr/engine/trainer.py``
(hparams, MultiStepLR Adam recipe, eval every 1000 iters on the main process,
"best"/"latest" checkpoints + ``params.json``, resume-from-latest) —
rebuilt TPU-first:

* the whole optimizer step is ONE jitted XLA program (forward + loss +
  backward + Adam) data-parallel over the mesh (parallel/train_step.py);
  gradient sync is an XLA collective over ICI, not NCCL DDP;
* bf16 autocast uses TPU-native bfloat16 with float32 master weights;
* checkpoints are flax msgpack pytrees with the reference's triple-file tag
  scheme (``{tag}.model.ckpt`` / ``{tag}.train.ckpt`` / ``params.json``);
* optional on-step profiling via ``jax.profiler`` and opt-in NaN debugging
  (the tracing/sanitizer subsystems the reference lacks, SURVEY.md §5).
"""

from __future__ import annotations

import json
import os
import time
import warnings
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from studiosr_tpu.data import DataHandler
from studiosr_tpu.parallel import (
    build_optimizer,
    get_mesh,
    make_train_step,
    prepare_state,
    shard_batch,
)
from studiosr_tpu.parallel.train_step import TrainState
from studiosr_tpu.utils import Logger, get_loss

__all__ = ["Trainer"]


class Trainer:
    """Train a model wrapper on a paired dataset with periodic evaluation.

    Arguments mirror the reference Trainer (``trainer.py:31-50``);
    ``loss_function`` accepts a name ("l1", "mse", "charbonnier") or any
    ``(pred, target) -> scalar`` jit-compatible callable.
    """

    def __init__(
        self,
        model,
        train_dataset,
        evaluator=None,
        batch_size: int = 32,
        num_workers: int = 4,
        learning_rate: float = 0.0002,
        beta1: float = 0.9,
        beta2: float = 0.99,
        weight_decay: float = 0.0,
        max_iters: int = 500000,
        gamma: float = 0.5,
        milestones: List[int] = [250000, 400000, 450000, 475000],
        loss_function: Callable = "l1",
        eval_interval: int = 1000,
        ckpt_path: str = "checkpoints",
        bfloat16: bool = True,
        seed: int = 0,
        log_interval: int = 100,
        profile_dir: Optional[str] = None,
        debug_nans: bool = False,
        fused_train: Optional[bool] = None,
        ema_decay: float = 0.0,
        grad_accum_steps: int = 1,
        steps_per_dispatch: int = 1,
        eval_on_device: Optional[bool] = None,
    ) -> None:
        self.model = model
        self.dataset = train_dataset
        self.evaluator = evaluator

        self.batch_size = batch_size
        self.num_workers = num_workers
        self.max_iters = max_iters
        self.eval_interval = eval_interval
        self.ckpt_path = ckpt_path
        os.makedirs(self.ckpt_path, exist_ok=True)

        self.learning_rate = learning_rate
        self.betas = (beta1, beta2)
        self.weight_decay = weight_decay
        self.milestones = list(milestones)
        self.gamma = gamma
        self.bfloat16 = bfloat16 and jax.default_backend() != "cpu"
        self.seed = seed
        self.log_interval = log_interval
        self.profile_dir = profile_dir
        if debug_nans:
            jax.config.update("jax_debug_nans", True)

        # Fused-training kernels (custom-VJP Pallas blocks): opt in for
        # modules that support the flag; default = on for those on TPU.
        self.fused_train = False
        supports_fused = hasattr(type(model.module), "fused_train")
        module_already_fused = supports_fused and getattr(model.module, "fused_train")
        if supports_fused and not module_already_fused:
            if fused_train is None:
                fused_train = jax.default_backend() != "cpu" and not getattr(model.module, "drop_rate", 0.0)
            self.fused_train = bool(fused_train)
        elif fused_train is not None:
            # An explicit request we cannot honor: the module type has no
            # fused_train flag, or was built with fused_train=True already
            # (which this Trainer flag cannot turn back off). Be loud rather
            # than silently dropping the argument.
            if module_already_fused and fused_train is False:
                raise ValueError(
                    "fused_train=False cannot disable a module built with "
                    "fused_train=True; rebuild the module without the flag"
                )
            if not supports_fused and fused_train:
                warnings.warn(
                    f"fused_train=True ignored: {type(model.module).__name__} "
                    "has no fused-training path",
                    stacklevel=2,
                )

        # steps_per_dispatch > 1: k optimizer steps ride ONE device dispatch
        # (lax.scan over k stacked batches, parallel/train_step.py
        # chain_batches) — same step sequence, same rng folds, but the
        # per-call dispatch/fetch RPC overhead (substantial on relay-attached
        # chips) is paid once per k steps. Logging/eval still fire at their
        # iteration boundaries (loss is read from the per-step losses array);
        # eval sees the state at the end of the enclosing chunk, so keep
        # eval_interval a multiple of k for exact cadence parity.
        self.steps_per_dispatch = max(1, int(steps_per_dispatch))
        if self.steps_per_dispatch > 1 and eval_interval % self.steps_per_dispatch:
            warnings.warn(
                f"eval_interval={eval_interval} is not a multiple of "
                f"steps_per_dispatch={self.steps_per_dispatch}; evaluation "
                "fires at the end of the chunk containing each boundary",
                stacklevel=2,
            )
        if self.steps_per_dispatch > 1 and max_iters % self.steps_per_dispatch:
            warnings.warn(
                f"max_iters={max_iters} is not a multiple of "
                f"steps_per_dispatch={self.steps_per_dispatch}: the final "
                f"{max_iters % self.steps_per_dispatch} step(s) compile a "
                "second (single-step) train program at the end of the run",
                stacklevel=2,
            )
        self.criterion = get_loss(loss_function)
        self.ema_decay = float(ema_decay)
        # None = auto: chip-resident eval on accelerators when the evaluator
        # is one of ours (a custom evaluator only guarantees run(func)).
        self.eval_on_device = eval_on_device
        self.best_psnr = 0.0
        self.mesh = get_mesh()
        # grad_accum_steps > 1: k micro-iterations per optimizer update
        # (optax.MultiSteps; effective batch = k x batch_size). max_iters and
        # eval_interval keep counting micro-iterations; milestones count
        # optimizer steps.
        self.tx = build_optimizer(
            learning_rate=learning_rate,
            beta1=beta1,
            beta2=beta2,
            weight_decay=weight_decay,
            milestones=self.milestones,
            gamma=gamma,
            accum_steps=int(grad_accum_steps),
        )
        self.state: Optional[TrainState] = None

    # -- state <-> model ----------------------------------------------------

    def _state_variables(self) -> Dict[str, Any]:
        variables = {"params": self.state.params}
        if self.state.batch_stats:
            variables["batch_stats"] = self.state.batch_stats
        return variables

    def _host_state(self) -> Dict[str, Any]:
        """Host copy of the full train state, fetched ONCE per state object.

        An eval boundary reads it up to five times (evaluate's model sync +
        the best/latest saves each need params AND optimizer state) and a
        full fetch costs seconds at relay D2H rates; the cache keys on state
        identity, so the next train step invalidates it naturally."""
        snap = getattr(self, "_host_state_cache", None)
        if snap is None or snap[0] is not self.state:
            fetched = jax.device_get(
                dict(
                    variables=self._state_variables(),
                    opt_state=self.state.opt_state,
                    ema_params=self.state.ema_params,
                )
            )
            snap = (self.state, fetched)
            self._host_state_cache = snap
        return snap[1]

    def _sync_model_from_state(self) -> None:
        self.model.variables = self._host_state()["variables"]

    # -- main loop ----------------------------------------------------------

    def run(self) -> None:
        from studiosr_tpu.utils import enable_compilation_cache

        # Persistent XLA cache: restarts (the §5 failure-recovery model) and
        # eval's many distinct image shapes skip recompiles.
        enable_compilation_cache()
        print(f"device: {jax.default_backend()} x{len(jax.devices())}  bf16: {self.bfloat16}")

        # normalize=False: uint8 samples stay uint8 across the host boundary
        # (4x fewer H2D bytes per batch); the jitted step divides by 255 on
        # device (same f32 math to ~1 ulp). Float samples pass through.
        self.data_handler = DataHandler(
            self.dataset, self.batch_size, self.num_workers, seed=self.seed, normalize=False
        )
        self.data_handler.set_seed(self.seed)

        self.state = prepare_state(self.model.variables, self.tx, self.mesh, ema_decay=self.ema_decay)
        if self.load("latest"):
            print(f"-> The latest checkpoint was loaded. [best_psnr = {self.best_psnr:6.3f}]")

        train_module = self.model.module
        if self.fused_train:
            train_module = train_module.clone(fused_train=True)

        def build_step(chain: int):
            return make_train_step(
                train_module, self.tx, self.criterion, bfloat16=self.bfloat16, mesh=self.mesh,
                ema_decay=self.ema_decay, chain=chain, chain_batches=chain > 0,
            )

        k = self.steps_per_dispatch
        step_fn = build_step(k if k > 1 else 0)
        single_fn = step_fn if k == 1 else None  # tail steps; built on demand
        logger = Logger(os.path.join(self.ckpt_path, "train.log")) if self.data_handler.is_main_process else None

        if self.profile_dir:
            jax.profiler.start_trace(self.profile_dir)

        base_rng = jax.random.PRNGKey(self.seed)
        window_start, window_images = time.perf_counter(), 0
        def log_step(iterations: int, loss_value: float) -> None:
            nonlocal window_start, window_images
            elapsed = time.perf_counter() - window_start
            rate = window_images / max(elapsed, 1e-9)
            print(
                f" Iterations = {iterations:<8} loss = {loss_value:.5f} ({rate:7.1f} img/s)",
                end="\r",
            )
            window_start, window_images = time.perf_counter(), 0

        def eval_and_checkpoint(iterations: int) -> None:
            psnr, ssim = self.evaluate()
            log = f" Iterations = {iterations:<8}  PSNR: {psnr:6.3f} SSIM: {ssim:6.4f}"
            if logger:
                logger.info(log)
            # Without an evaluator there is no PSNR signal: 0.0 <= 0.0 would
            # rewrite a meaningless "best" (a full serialization pass) at
            # every boundary — only "latest" is meaningful then.
            if self.evaluator and self.best_psnr <= psnr:
                self.best_psnr = psnr
                self.save("best")
            self.save("latest")

        try:
            while self.data_handler.iterations < self.max_iters:
                if k > 1 and self.data_handler.iterations + k <= self.max_iters:
                    # k steps, one dispatch: stack k batches (+ their folded
                    # keys) and scan inside the jit — the identical step
                    # sequence, minus k-1 dispatch/fetch round-trips.
                    lqs, gts, its = [], [], []
                    for _ in range(k):
                        lq, gt = self.data_handler.get_batch()
                        lqs.append(lq)
                        gts.append(gt)
                        its.append(self.data_handler.iterations)
                        window_images += lq.shape[0]
                    batch = shard_batch((np.stack(lqs), np.stack(gts)), self.mesh, axis=1)
                    # One dispatch for all k keys (an eager fold_in per step
                    # would re-add the per-dispatch RPC this chunk removes).
                    rngs = jax.vmap(lambda i: jax.random.fold_in(base_rng, i))(jnp.asarray(its, jnp.uint32))
                    self.state, losses = step_fn(self.state, batch[0], batch[1], rngs)
                    losses_host = None
                    for j, iterations in enumerate(its):
                        if iterations % self.log_interval == 0:
                            if losses_host is None:
                                losses_host = np.asarray(losses)
                            log_step(iterations, float(losses_host[j]))
                    due = [it for it in its if it % self.eval_interval == 0]
                    if due and self.data_handler.is_main_process:
                        eval_and_checkpoint(due[-1])
                    continue

                if single_fn is None:
                    single_fn = build_step(0)  # tail: max_iters % k != 0
                # uint8 batches normalize inside the jitted step.
                lq, gt = self.data_handler.get_batch()
                batch = shard_batch((lq, gt), self.mesh)
                iterations = self.data_handler.iterations
                rng = jax.random.fold_in(base_rng, iterations)
                self.state, loss = single_fn(self.state, batch[0], batch[1], rng)
                window_images += lq.shape[0]

                if iterations % self.log_interval == 0:
                    log_step(iterations, float(loss))

                if iterations % self.eval_interval == 0 and self.data_handler.is_main_process:
                    eval_and_checkpoint(iterations)
        finally:
            if self.profile_dir:
                jax.profiler.stop_trace()
            self.data_handler.close()
        self._sync_model_from_state()

    def evaluate(self) -> Tuple[float, float]:
        psnr, ssim = 0.0, 0.0
        if self.evaluator:
            self._sync_model_from_state()
            if self._eval_on_device():
                # Chip-resident eval: SR + metrics in one program per image,
                # two scalars fetched — no HR image crosses the host boundary
                # (the host numpy protocol stays for standalone reporting).
                # The jitted eval is called once per image with the variables
                # as arguments: a host-numpy tree (what _sync just produced)
                # re-uploads the FULL parameter set per call on the relay —
                # put it on device ONCE per eval boundary instead.
                self.model.variables = jax.device_put(self.model.variables)
                psnr, ssim = self.evaluator.run(self.model, on_device=True)
            else:
                psnr, ssim = self.evaluator.run(self.model.inference)
        return psnr, ssim

    def _eval_on_device(self) -> bool:
        if self.eval_on_device is not None:
            return bool(self.eval_on_device)
        from studiosr_tpu.engine.evaluator import _EvaluatorBase

        return jax.default_backend() != "cpu" and isinstance(self.evaluator, _EvaluatorBase)

    # -- checkpointing ------------------------------------------------------

    @staticmethod
    def _atomic_write(path: str, data: bytes) -> None:
        """Crash-safe write: tmp file in the same directory + ``os.replace``.

        The reference writes checkpoints with plain ``torch.save``
        (``trainer.py:147-163``) — a kill mid-write leaves a truncated
        ``latest.*`` that the restart-based recovery model then chokes on.
        ``os.replace`` is atomic on POSIX, so readers only ever see the old
        or the new complete file (same treatment the dataset prepare got).
        """
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(data)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)

    def save(self, file_name: str) -> Tuple[str, str]:
        """Triple-file scheme: model weights, train state, params.json
        (``trainer.py:147-163``). All writes are atomic (tmp + replace)."""
        from flax import serialization

        os.makedirs(self.ckpt_path, exist_ok=True)
        model_path = os.path.join(self.ckpt_path, file_name + ".model.ckpt")
        train_path = os.path.join(self.ckpt_path, file_name + ".train.ckpt")

        host = self._host_state()
        variables = host["variables"]
        self._atomic_write(model_path, serialization.to_bytes(variables))

        train_dict = dict(
            opt_state=host["opt_state"],
            iteration=int(self.data_handler.iterations) if hasattr(self, "data_handler") else int(self.state.step),
            step=int(self.state.step),
            best_psnr=float(self.best_psnr),
        )
        self._atomic_write(train_path, serialization.to_bytes(train_dict))

        if self.state.ema_params is not None:
            # Separate file (the reference zoo's params_ema analog,
            # ``hat.py:576-593``): keeps {tag}.model.ckpt loadable by
            # registry templates that know nothing about EMA.
            ema_path = os.path.join(self.ckpt_path, file_name + ".ema.ckpt")
            self._atomic_write(ema_path, serialization.to_bytes(host["ema_params"]))

        self._atomic_write(
            os.path.join(self.ckpt_path, "params.json"),
            json.dumps(self.model.get_model_config()).encode(),
        )
        return model_path, train_path

    def load(self, file_name: str) -> bool:
        """Restore weights, optimizer state, iteration counter, best PSNR
        (``trainer.py:165-179``).

        A corrupt/truncated checkpoint (pre-atomic-write files, or torn
        non-POSIX filesystems) falls back ``latest`` -> ``best`` so a
        restart still resumes from the last *valid* state instead of
        crashing the recovery path. A checkpoint whose BYTES are intact but
        whose tree no longer matches the model (config drift between runs)
        is NOT "corrupt" — that re-raises, so a mis-configured resume fails
        loudly instead of silently discarding the intended state.
        """
        try:
            return self._load_tag(file_name)
        except Exception as e:
            if self._ckpt_bytes_intact(file_name):
                raise  # structural mismatch (e.g. model config drift), not file damage
            warnings.warn(f"checkpoint '{file_name}' is corrupt ({e!r})")
            if file_name == "latest":
                try:
                    if self._load_tag("best"):
                        warnings.warn("resumed from 'best' instead")
                        return True
                except Exception as e2:
                    if self._ckpt_bytes_intact("best"):
                        raise
                    warnings.warn(f"checkpoint 'best' is corrupt too ({e2!r})")
            return False

    def _ckpt_bytes_intact(self, file_name: str) -> bool:
        """True when every checkpoint file ``_load_tag`` actually READS for
        ``file_name`` parses as complete msgpack — i.e. a load failure is a
        tree/shape mismatch (fail loudly), not truncation/corruption (fall
        back). The ema file only counts when this trainer uses EMA: a stale
        truncated ``.ema.ckpt`` from an earlier run must not re-label a
        genuine config-drift failure as 'corrupt'."""
        import msgpack

        suffixes = [".model.ckpt", ".train.ckpt"]
        if self.ema_decay:
            suffixes.append(".ema.ckpt")
        for suffix in suffixes:
            path = os.path.join(self.ckpt_path, file_name + suffix)
            if not os.path.isfile(path):
                continue
            try:
                with open(path, "rb") as f:
                    msgpack.unpackb(f.read(), strict_map_key=False)
            except Exception:
                return False
        return True

    def _load_tag(self, file_name: str) -> bool:
        from flax import serialization

        model_path = os.path.join(self.ckpt_path, file_name + ".model.ckpt")
        train_path = os.path.join(self.ckpt_path, file_name + ".train.ckpt")
        if not (os.path.isfile(model_path) and os.path.isfile(train_path)):
            return False
        if self.state is None:
            # Standalone load (before run(), like the reference Trainer's):
            # build the state skeleton the checkpoint deserializes into.
            self.state = prepare_state(self.model.variables, self.tx, self.mesh, ema_decay=self.ema_decay)

        skeleton = jax.device_get(self._state_variables())
        with open(model_path, "rb") as f:
            variables = serialization.from_bytes(skeleton, f.read())
        # flax from_bytes only validates tree KEYS; fail loudly on config
        # drift here instead of later inside the jitted apply (ADVICE r4).
        from studiosr_tpu.utils.helpers import check_tree_shapes

        check_tree_shapes(variables, skeleton)
        target = dict(
            opt_state=jax.device_get(self.state.opt_state),
            iteration=0,
            step=0,
            best_psnr=0.0,
        )
        with open(train_path, "rb") as f:
            train_dict = serialization.from_bytes(target, f.read())

        ema = None
        if self.ema_decay:
            ema_path = os.path.join(self.ckpt_path, file_name + ".ema.ckpt")
            ema = jax.tree_util.tree_map(
                lambda p: np.asarray(p, np.float32), jax.device_get(variables["params"])
            )
            if os.path.isfile(ema_path):
                with open(ema_path, "rb") as f:
                    ema = serialization.from_bytes(ema, f.read())
            # else: resuming a pre-EMA checkpoint — seed the shadow from the
            # restored parameters.

        from studiosr_tpu.parallel.mesh import replicate

        self.state = replicate(
            TrainState(
                params=variables["params"],
                batch_stats=variables.get("batch_stats", {}),
                opt_state=train_dict["opt_state"],
                step=jnp.asarray(train_dict["step"], jnp.int32),
                ema_params=ema,
            ),
            self.mesh,
        )
        self.best_psnr = float(train_dict["best_psnr"])
        if hasattr(self, "data_handler"):
            self.data_handler.set_iterations(int(train_dict["iteration"]))
        self.model.variables = variables
        return True
