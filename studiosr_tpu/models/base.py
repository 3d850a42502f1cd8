"""The public model contract: numpy-in / numpy-out inference over jitted NHWC.

Mirrors the capabilities of the reference base class
(``studiosr/models/common.py:29-101``): ``inference`` takes an RGB uint8 HWC
array and returns the upscaled RGB uint8 HWC array;
``inference_with_self_ensemble`` averages the 8 rot90/flip variants;
``get_model_config``/``get_training_config`` expose reconstruction configs;
``from_pretrained`` loads the published PyTorch zoo via the translation layer.

TPU-native design differences:
* models are immutable flax modules + parameter pytrees, wrapped in this
  class; the forward is ``jax.jit``-ed once and re-specialized per input
  shape (the persistent XLA compilation cache makes repeated shapes cheap);
* layout is NHWC end-to-end — no permutes at the numpy boundary beyond
  adding/removing the batch axis;
* ``export`` emits StableHLO (the XLA-portable analog of the reference's
  ONNX export, ``common.py:86-98``).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["Model", "FusedServingModel", "diverge_images", "converge_images", "fast_init_variables"]


def fast_init_variables(module, x_shape, seed: int = 0):
    """Zero-filled variables with the module's exact tree/shapes/dtypes.

    ``module.init`` executes the whole forward (minutes for flagship models
    on CPU); this only traces shapes. Use where the values are irrelevant —
    benchmarking, compile checks, or weights about to be overwritten by a
    checkpoint. Fresh training should use the real initializers.
    """
    shapes = jax.eval_shape(
        lambda rng, x: module.init(rng, x), jax.random.PRNGKey(seed), jnp.zeros(x_shape, jnp.float32)
    )
    return jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)


def init_variables(module, x_shape, seed: int = 0, fast: bool = False):
    """Module variables: real initializers, or shape-only zeros when ``fast``
    (for checkpoint-bound or benchmark builds)."""
    if fast:
        return fast_init_variables(module, x_shape, seed)
    return module.init(jax.random.PRNGKey(seed), jnp.zeros(x_shape, jnp.float32))


def diverge_images(image: np.ndarray) -> List[np.ndarray]:
    """The 8 rot90 x fliplr variants of an HWC image (``common.py:10-16``)."""
    out = []
    for i in range(4):
        rotated = np.rot90(image, k=i, axes=(0, 1))
        flipped = np.fliplr(rotated)
        out.extend([rotated, flipped])
    return out


def converge_images(images: List[np.ndarray]) -> np.ndarray:
    """Invert :func:`diverge_images` on each output and average (``common.py:19-26``)."""
    undone = []
    for i, image in enumerate(images):
        image = np.fliplr(image) if i & 1 else image
        image = np.rot90(image, k=i // 2, axes=(1, 0))
        undone.append(image)
    return np.mean(np.stack(undone), axis=0)


class _ModelMeta(type):
    """Reference-ctor parity: ``SwinIR(scale=4)`` == ``SwinIR.build(scale=4)``.

    The reference constructs models directly with hyperparameters
    (``studiosr/models/swinir.py`` ctor; README usage ``SwinIR(scale=scale)``);
    our ``build`` classmethods take the same names. Hyperparameter calls are
    recognized by the absence of a positional flax module / ``module=``
    kwarg, so the internal ``cls(module, variables, config, ...)`` path is
    untouched.
    """

    def __call__(cls, *args, **kwargs):
        if cls is not Model and not args and "module" not in kwargs:
            return cls.build(**kwargs)
        return super().__call__(*args, **kwargs)


class Model(metaclass=_ModelMeta):
    """Wrapper binding a flax module, its variables, and the model config.

    Subclasses set ``module_cls`` and implement ``build`` (fresh init) and
    ``from_pretrained`` (zoo load). ``variables`` is the full flax variable
    dict (``{"params": ..., possibly "batch_stats": ...}``).
    """

    def __init__(
        self,
        module,
        variables: Dict[str, Any],
        config: Dict[str, Any],
        training_config: Optional[Dict[str, Any]] = None,
    ) -> None:
        if not hasattr(module, "apply"):
            raise TypeError(
                f"{type(self).__name__}() takes a flax module (internal path) or "
                f"hyperparameter KEYWORD arguments (e.g. {type(self).__name__}(scale=4)); "
                f"got positional {module!r}"
            )
        self.module = module
        self.variables = variables
        self.config = dict(config)
        self._training_config = dict(training_config or {})
        # Quality-correct by default: TPU "f32" matmuls truncate multiplies
        # to bf16 unless told otherwise (measured 0.03 max output error on
        # SwinIR vs 4e-6 with "highest"); fast serving paths (half()/
        # enable_fused) switch this off explicitly.
        self._matmul_precision = "highest"
        self._jit_forward = jax.jit(self._forward)

    # -- config accessors ---------------------------------------------------

    @property
    def scale(self) -> int:
        return int(self.config.get("scale", 4))

    @property
    def n_colors(self) -> int:
        return int(self.config.get("n_colors", 3))

    @property
    def img_range(self) -> float:
        return float(self.config.get("img_range", 1.0))

    @property
    def params(self):
        return self.variables.get("params", self.variables)

    def get_model_config(self) -> Dict[str, Any]:
        return dict(self.config)

    def get_training_config(self) -> Dict[str, Any]:
        return dict(self._training_config)

    # -- forward ------------------------------------------------------------

    def _forward(self, variables, x: jnp.ndarray) -> jnp.ndarray:
        """Eval-mode forward; overridable for models with extra state."""
        dtype = getattr(self, "_compute_dtype", None)
        if dtype is not None:
            x = x.astype(dtype)
        precision = getattr(self, "_matmul_precision", None)
        if precision:
            with jax.default_matmul_precision(precision):
                out = self.module.apply(variables, x, train=False)
        else:
            out = self.module.apply(variables, x, train=False)
        return out.astype(jnp.float32)

    def set_matmul_precision(self, precision: Optional[str]) -> "Model":
        """Matmul precision for inference: None (backend default — fastest,
        bf16 multiplies on TPU), "high", or "highest" (full f32 — use for
        0.01 dB quality-parity evaluation against the CUDA reference).
        """
        self._matmul_precision = precision
        self._jit_forward = jax.jit(self._forward)
        return self

    def serving_prep(self):
        """Pre-laid kernel weights for the fused serving path, or None.

        Models whose fused path supports load-time weight pre-layout
        (models/swinir.py) override this with an eager, cached builder —
        the per-forward weight-layout passes (head padding, conv tap
        stacking, tail quadrant assembly) then drop out of the compiled
        hot path entirely (they are NOT loop-hoisted by XLA; STATUS.md
        session 7)."""
        return None

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """Jitted eval forward on an NHWC float batch."""
        prep = self.serving_prep()
        if prep is not None:
            return self._jit_forward(self.variables, x, prep=prep)
        return self._jit_forward(self.variables, x)

    def _forward_sharded(self, variables, x, prep=None):
        """Forward for a DEVICE-SHARDED batch (mesh-sharded tiled
        inference). Default: identical to :meth:`_forward`; models whose
        fused serving contains per-image sequential kernels (SwinIR/HAT
        tail ``lax.map``) override it to keep the batch parallel."""
        if prep is not None:
            return self._forward(variables, x, prep=prep)
        return self._forward(variables, x)

    def needs_manual_spmd(self, mesh) -> bool:
        """True when forwards over ``mesh`` must run under ``jax.shard_map``
        (manual SPMD) instead of GSPMD automatic partitioning: Mosaic
        (Pallas TPU) kernels cannot be automatically partitioned — jit
        raises ``NotImplementedError`` at lowering on any >1-device mesh
        (jax ``tpu_custom_call.py``; CPU test meshes never see it because
        the kernels run in interpret mode there)."""
        return mesh is not None and getattr(self, "_fused", False) and mesh.size > 1

    @staticmethod
    def shard_map_batch(fn, mesh):
        """``jax.shard_map`` a ``fn(variables, batch, prep)`` with the batch
        axis sharded over ALL mesh axes and params/prep replicated — the one
        manual-SPMD wrapping every mesh-serving entry point shares
        (:meth:`manual_forward_uint8`, :meth:`sharded_forward`, and the
        device-loop tiled path in ``parallel/tiled.py``). Returned unjitted
        so it can embed in a larger program (the tiled device loop)."""
        from jax.sharding import PartitionSpec as P

        axes = tuple(mesh.axis_names)
        return jax.shard_map(
            fn,
            mesh=mesh,
            in_specs=(P(), P(axes), P()),
            out_specs=P(axes),
            check_vma=False,
        )

    def _manual_shard_map(self, cache_attr: str, fn, mesh):
        """Jitted :meth:`shard_map_batch`, cached per serving configuration
        (``_jit_forward`` identity — rebuilt by ``enable_fused``/``half``)
        and mesh (by equality: a fresh equal ``get_mesh()`` must not
        retrace)."""
        cache = getattr(self, cache_attr, None)
        if cache is None or cache[0] is not self._jit_forward or cache[1] != mesh:
            setattr(self, cache_attr, (self._jit_forward, mesh, jax.jit(self.shard_map_batch(fn, mesh))))
        return getattr(self, cache_attr)[2]

    def manual_forward_uint8(self, x: jnp.ndarray, mesh) -> jax.Array:
        """uint8 batch forward under ``jax.shard_map`` over ``mesh`` (batch
        axis sharded over all mesh axes) — the multi-chip form of the FUSED
        serving path (see :meth:`needs_manual_spmd`). Each shard runs the
        full single-chip fused path, so the per-image fused tails ENGAGE
        per shard (the GSPMD path had to decline them to keep the
        device-sharded batch parallel, :meth:`_forward_sharded`)."""
        fn = self._manual_shard_map(
            "_manual_u8_cache",
            lambda v, b, p: self._forward_uint8(v, b, sharded=False, prep=p),
            mesh,
        )
        return fn(self.variables, x, self.serving_prep())

    def sharded_forward(self, x: jnp.ndarray, mesh=None) -> jnp.ndarray:
        """Jitted :meth:`_forward_sharded`, cached per serving
        configuration (invalidated whenever ``_jit_forward`` is rebuilt —
        ``enable_fused``/``astype``/``set_matmul_precision``).

        Pass ``mesh`` when the batch is device-sharded AND the fused path
        is enabled: that combination must run under manual SPMD
        (:meth:`needs_manual_spmd`)."""
        if self.needs_manual_spmd(mesh):
            fn = self._manual_shard_map(
                "_manual_fwd_cache",
                lambda v, b, p: self._forward(v, b, **({} if p is None else {"prep": p})),
                mesh,
            )
            return fn(self.variables, x, self.serving_prep())
        cache = getattr(self, "_sharded_fwd_cache", None)
        if cache is None or cache[0] is not self._jit_forward:
            self._sharded_fwd_cache = (self._jit_forward, jax.jit(self._forward_sharded))
        prep = self.serving_prep()
        if prep is not None:
            return self._sharded_fwd_cache[1](self.variables, x, prep=prep)
        return self._sharded_fwd_cache[1](self.variables, x)

    def _forward_uint8(self, variables, x: jnp.ndarray, sharded: bool, prep=None) -> jnp.ndarray:
        """uint8 NHWC batch -> upscaled uint8 NHWC batch, entirely on device.

        The normalize / scale / round / clip steps ride in the same XLA
        program as the forward, so host transfers are uint8 both ways —
        4x fewer bytes than the float batch path. Used by tiled inference,
        where D2H volume (HR tiles) dominates the host<->device traffic.
        """
        in_range = 255.0 if self.img_range == 1.0 else 1.0
        fwd = self._forward_sharded if sharded else self._forward
        kw = {} if prep is None else {"prep": prep}
        y = fwd(variables, x.astype(jnp.float32) / in_range, **kw) * in_range
        return jnp.clip(jnp.round(y), 0, 255).astype(jnp.uint8)

    def forward_uint8(self, x: jnp.ndarray, sharded: bool = False) -> jax.Array:
        """Jitted :meth:`_forward_uint8`; returns the DEVICE array without
        blocking, so callers can pipeline host transfers against the next
        batch's compute. Cache invalidates with ``_jit_forward`` (rebuilt by
        ``enable_fused``/``half``/``set_matmul_precision``)."""
        cache = getattr(self, "_uint8_fwd_cache", None)
        if cache is None or cache[0] is not self._jit_forward:
            self._uint8_fwd_cache = (
                self._jit_forward,
                jax.jit(lambda v, b, p=None: self._forward_uint8(v, b, sharded=False, prep=p)),
                jax.jit(lambda v, b, p=None: self._forward_uint8(v, b, sharded=True, prep=p)),
            )
        fn = self._uint8_fwd_cache[2 if sharded else 1]
        prep = self.serving_prep()
        if prep is not None:
            return fn(self.variables, x, prep)
        return fn(self.variables, x)

    def _metric_stack(self, sr, gt, crop_border: int, y_only: bool):
        """PSNR + SSIM of one SR/GT pair as a (2,) stack — the single
        definition both on-device eval programs (:meth:`evaluate_uint8` and
        :meth:`evaluate_uint8_batch`) trace, so the metric chain (y_only /
        crop plumbing, the [psnr, ssim] order, the HIGHEST-precision convs
        inside the metric fns) cannot diverge between routes."""
        from studiosr_tpu.utils.metrics import compute_psnr_jax, compute_ssim_jax

        return jnp.stack(
            [
                compute_psnr_jax(sr, gt, y_only=y_only, crop_border=crop_border),
                compute_ssim_jax(sr, gt, y_only=y_only, crop_border=crop_border),
            ]
        )

    def evaluate_uint8(self, lq, gt, crop_border: int = 0, y_only: bool = True):
        """SR forward + PSNR/SSIM in ONE jitted program; fetches two scalars.

        The north-star eval loop never moves an HR image off the chip
        (BASELINE.json): the uint8 LQ/GT pair uploads, the same XLA program
        runs the (fused) forward, the normalize/round/clip, the Y-channel
        conversion and the PSNR/SSIM chain, and only two f32 scalars come
        back — vs the host protocol's full-HR fetch per image (reference
        ``evaluator.py:53-79`` scores on host). Matches the host numpy
        protocol to <1e-4 dB (tests/engine/test_on_device_eval.py).
        """
        cache = getattr(self, "_eval_uint8_cache", None)
        if cache is None or cache[0] is not self._jit_forward:
            # One program per distinct (LQ, GT) shape pair: a shape-diverse
            # benchmark set recompiles per image, which on a remote backend
            # is 30 s-15 min each — make the persistent cache unconditional
            # here rather than relying on every caller (Trainer/CLI do it;
            # a standalone Evaluator.run(on_device=True) did not).
            from studiosr_tpu.utils.helpers import enable_compilation_cache

            enable_compilation_cache()

            def _eval(v, lq, gt, p=None, *, crop_border, y_only):
                sr = self._forward_uint8(v, lq, sharded=False, prep=p)[0]
                return self._metric_stack(sr, gt, crop_border, y_only)

            self._eval_uint8_cache = (
                self._jit_forward,
                jax.jit(_eval, static_argnames=("crop_border", "y_only")),
            )
        fn = self._eval_uint8_cache[1]
        lq = jnp.asarray(np.asarray(lq))[None]
        gt = jnp.asarray(np.asarray(gt))
        prep = self.serving_prep()
        out = fn(self.variables, lq, gt, prep, crop_border=crop_border, y_only=y_only)
        psnr, ssim = np.asarray(out)
        return float(psnr), float(ssim)

    def evaluate_uint8_batch(self, lqs, gts, crop_border: int = 0, y_only: bool = True, mesh=None):
        """Per-image PSNR/SSIM for a SAME-SHAPE uint8 batch in one program.

        The pod form of :meth:`evaluate_uint8` (round-4 VERDICT item 7):
        with ``mesh`` the image axis is sharded over all mesh axes via
        ``jax.shard_map`` — each device runs the FULL single-chip (fused)
        forward + metric chain on its local images, so Mosaic kernels and
        the per-image fused tails engage per shard, and only a (B, 2) f32
        array crosses the host boundary. Returns ``(psnrs, ssims)`` numpy
        arrays of length B. ``B`` must divide by ``mesh.size``.

        Per-image eval (:meth:`evaluate_uint8`, the Evaluator route) stays
        single-chip by design: benchmark sets are shape-diverse, so there
        is no shared batch to shard — pods parallelize eval across images
        with this method (same-shape val crops) or across processes (each
        host scores its shard of the image list).
        """
        def _pair_metrics(sr, gt):
            return self._metric_stack(sr, gt, crop_border, y_only)

        def _eval_batch(v, batch, p=None):
            lq, gt = batch
            sr = self._forward_uint8(v, lq, sharded=False, prep=p)
            return jax.vmap(_pair_metrics)(sr, gt)

        # Dict cache keyed by configuration (alternating mesh/single-device
        # or crop/y_only must not evict each other's jitted program);
        # invalidated as a whole when the serving configuration changes.
        key = (crop_border, y_only, mesh)
        cache = getattr(self, "_eval_u8_batch_cache", None)
        if cache is None or cache[0] is not self._jit_forward:
            cache = (self._jit_forward, {})
            self._eval_u8_batch_cache = cache
        if key not in cache[1]:
            from studiosr_tpu.utils.helpers import enable_compilation_cache

            enable_compilation_cache()
            if mesh is not None:
                # shard_map even a 1-device mesh: it is the exact lowering
                # branch real pods take (Mosaic kernels cannot GSPMD), and
                # it is what lets scripts/exp_manual_spmd_tpu.py validate
                # the compiled-kernel mesh eval route on the single real
                # chip — a `mesh.size > 1` guard here made that check
                # compile the identical plain-jit program twice (vacuous).
                cache[1][key] = jax.jit(self.shard_map_batch(_eval_batch, mesh))
            else:
                cache[1][key] = jax.jit(_eval_batch)
        fn = cache[1][key]
        lqs = jnp.asarray(np.asarray(lqs))
        gts = jnp.asarray(np.asarray(gts))
        if mesh is not None and lqs.shape[0] % mesh.size:
            raise ValueError(
                f"evaluate_uint8_batch: batch {lqs.shape[0]} does not divide "
                f"over the {mesh.size}-device mesh — pad or drop images"
            )
        out = np.asarray(fn(self.variables, (lqs, gts), self.serving_prep()))
        return out[:, 0], out[:, 1]

    def apply_train(self, variables, x: jnp.ndarray, rngs=None, mutable=()):
        """Train-mode apply (dropout active, batch stats updating)."""
        return self.module.apply(variables, x, train=True, rngs=rngs, mutable=list(mutable))

    # -- numpy inference contract -------------------------------------------

    def inference(self, image: np.ndarray) -> np.ndarray:
        """uint8 HWC RGB -> upscaled uint8 HWC RGB (``common.py:36-48``).

        Rides :meth:`forward_uint8`: normalize and round/clip/cast live in
        the jitted program, so the host boundary carries uint8 both ways.
        """
        return np.asarray(self.forward_uint8(np.asarray(image)[None])[0])

    def inference_batch(self, images) -> list:
        """Batched :meth:`inference` over same-shaped images — ONE dispatch
        for the whole stack (batch rides the fused kernels' grid; per-call
        dispatch and transfer latency amortize). Returns a list of uint8
        HWC arrays in input order."""
        batch = np.stack([np.asarray(im) for im in images])
        return list(np.asarray(self.forward_uint8(batch)))

    def inference_with_self_ensemble(self, image: np.ndarray) -> np.ndarray:
        """8-way test-time ensemble (``common.py:50-67``)."""
        scale = 255.0 if self.img_range == 1.0 else 1.0
        outputs = []
        for variant in diverge_images(image.astype(np.float32) / scale):
            x = jnp.asarray(np.ascontiguousarray(variant))[None]
            y = self(x)[0]  # __call__ threads serving_prep (pre-laid weights)
            outputs.append(np.asarray(y))
        merged = converge_images(outputs) * scale
        return np.clip(np.round(merged), 0, 255).astype(np.uint8)

    def inference_tiled(
        self,
        image: np.ndarray,
        tile: int = 128,
        tile_overlap: int = 16,
        tile_batch: int = 8,
        mesh=None,
        device_loop: bool | None = None,
    ) -> np.ndarray:
        """Tiled-patch inference (static shapes; one compile per tile size).

        Preferable over :meth:`inference` for large or variably-sized inputs —
        see parallel/tiled.py for the pipeline, the one-jit ``device_loop``
        mode, and the sharded variant.
        """
        from studiosr_tpu.parallel.tiled import tiled_inference

        return tiled_inference(
            self, image, tile=tile, tile_overlap=tile_overlap, tile_batch=tile_batch, mesh=mesh,
            device_loop=device_loop,
        )

    # -- dtype policy --------------------------------------------------------

    def astype(self, dtype) -> "Model":
        """Cast parameters to ``dtype`` (e.g. jnp.bfloat16 for TPU serving).

        Inputs are cast to the parameter dtype inside ``_forward``; metrics
        parity configs should stay float32, bf16 roughly halves inference
        time on TPU.
        """
        self.variables = jax.tree_util.tree_map(lambda p: p.astype(dtype), self.variables)
        self._compute_dtype = dtype
        self._matmul_precision = None  # low-precision serving: fastest MXU path
        self._jit_forward = jax.jit(self._forward)
        return self

    def half(self) -> "Model":
        return self.astype(jnp.bfloat16)

    # -- reference-API chainables (torch idioms, ``common.py:29-63`` usage) --

    def eval(self) -> "Model":
        """Chainable no-op: eval is the only inference mode here — forwards
        always run ``train=False`` (BatchNorm uses running stats)."""
        return self

    def to(self, device: Any = None) -> "Model":
        """``.to(device)`` parity: with a ``jax.Device``, commits the
        variables there; with the reference's device strings (or anything
        else), a no-op — jit places data on the default backend."""
        if isinstance(device, jax.Device):
            self.variables = jax.device_put(self.variables, device)
        return self

    # -- persistence --------------------------------------------------------

    @classmethod
    def from_pretrained(cls, scale: int = 4) -> "Model":
        return cls.build(scale=scale)  # type: ignore[attr-defined]

    def export(self, path: Optional[str] = None, input_shape: List[int] = [1, 256, 256, 3]) -> str:
        """Serialize the jitted forward as StableHLO text.

        The XLA-native analog of the reference's ONNX export
        (``common.py:86-98``); the artifact is portable across XLA runtimes.
        """
        if path is None:
            path = f"{self.__class__.__name__}x{self.scale}.stablehlo"
        x = jnp.zeros(input_shape, jnp.float32)
        lowered = jax.jit(self._forward).lower(self.variables, x)
        with open(path, "w") as f:
            f.write(lowered.as_text())
        return path

    def export_onnx(self, path: Optional[str] = None, torch_module=None, input_shape: List[int] = [1, 3, 64, 64], opset: int = 17) -> str:
        """ONNX export via the torch round-trip (reference ``common.py:86-98``).

        Direct JAX->ONNX needs jax2onnx (not bundled), so the supported route
        is: :func:`studiosr_tpu.zoo.translate.export_state_dict` -> load into
        the torch-side architecture -> ``torch.onnx.export``. Pass the torch
        module explicitly, or leave ``torch_module=None`` to build it from an
        installed ``studiosr`` package (the reference library) using this
        model's config. Weight fidelity of the round-trip is asserted by
        tests/models/test_export_roundtrip.py; the ONNX emission itself
        requires the ``onnx`` package at call time.
        """
        import torch

        from studiosr_tpu.zoo.translate import export_state_dict

        if path is None:
            path = f"{self.__class__.__name__}x{self.scale}.onnx"
        if torch_module is None:
            import studiosr  # the reference library provides the torch-side architecture

            torch_cls = getattr(studiosr.models, self.__class__.__name__)
            torch_module = torch_cls(**self.get_model_config())
        state = {k: torch.from_numpy(v.copy()) for k, v in export_state_dict(self.variables).items()}
        torch_module.load_state_dict(state, strict=False)
        torch_module.eval()
        # TorchScript-based exporter: the dynamo path needs onnxscript on top
        # of onnx; the legacy path only needs onnx and handles these models.
        torch.onnx.export(torch_module, torch.zeros(*input_shape), path, opset_version=opset, dynamo=False)
        return path

    def count_parameters(self) -> int:
        leaves = jax.tree_util.tree_leaves(self.params)
        return int(sum(np.prod(leaf.shape) for leaf in leaves))


class FusedServingModel(Model):
    """Shared plumbing for models with a fused Pallas serving path
    (SwinIR and HAT; SwinFIR via SwinIR): ``enable_fused`` switching, the
    cached load-time ``serving_prep`` builder, and a ``_forward`` that
    threads dtype / matmul precision / ``tail_batched_map`` / ``prep``
    into the model's fast-forward. Subclasses implement only
    :meth:`_fused_fns` (lazy imports keep the models<->serving import
    order acyclic)."""

    def _fused_fns(self):
        """Return ``(fast_forward, prepare)``:
        ``fast_forward(variables, x, config, *, interpret,
        tail_batched_map, prep)`` and ``prepare(variables, config, dtype)``.
        """
        raise NotImplementedError

    def enable_fused(self, enabled: bool = True) -> "FusedServingModel":
        """Serve via the fused Pallas block kernels: same computation,
        VMEM-resident blocks (serving/swinir_fast.py, serving/hat_fast.py).
        """
        self._fused = enabled
        self._jit_forward = jax.jit(self._forward)
        return self

    def serving_prep(self):
        """Eager, cached kernel-layout weights for the fused serving path.

        Keyed on the variables object identity and compute dtype;
        ``half()``/``enable_fused`` invalidate via the ``_jit_forward``
        identity they rebuild. Built as ONE jitted program: the builder
        body is hundreds of small ops that would otherwise each be a
        separate eager dispatch over the remote relay (~24 ms RPC apiece)
        at every model load (STATUS.md session 7)."""
        if not getattr(self, "_fused", False):
            return None
        dtype = getattr(self, "_compute_dtype", None) or jnp.float32
        cache = getattr(self, "_serving_prep_cache", None)
        if cache is not None and cache[0] is self.variables and cache[1] == dtype:
            return cache[2]
        prepare = self._fused_fns()[1]
        prep = jax.jit(lambda v: prepare(v, self.config, dtype))(self.variables)
        self._serving_prep_cache = (self.variables, dtype, prep)
        return prep

    def _forward(self, variables, x, tail_batched_map: bool = True, prep=None):
        if getattr(self, "_fused", False):
            fast_forward = self._fused_fns()[0]
            dtype = getattr(self, "_compute_dtype", None)
            if dtype is not None:
                x = x.astype(dtype)
            interpret = jax.default_backend() == "cpu"
            kw = dict(interpret=interpret, tail_batched_map=tail_batched_map, prep=prep)
            precision = getattr(self, "_matmul_precision", None)
            if precision and dtype is None:  # f32 quality mode through the fused path
                with jax.default_matmul_precision(precision):
                    out = fast_forward(variables, x, self.config, **kw)
            else:
                out = fast_forward(variables, x, self.config, **kw)
            return out.astype(jnp.float32)
        return super()._forward(variables, x)

    def _forward_sharded(self, variables, x, prep=None):
        # Device-sharded batch (mesh-sharded tiled inference): the fused
        # tails' per-image lax.map would serialize the batch across chips —
        # take the batch-parallel XLA tail instead.
        return self._forward(variables, x, tail_batched_map=False, prep=prep)
