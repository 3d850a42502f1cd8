"""Audit: every public symbol + public method of the reference package must
have a counterpart in studiosr_tpu (same name, or a documented rename).

Walks /root/reference/studiosr's modules (via tests/reference_loader.py
stubs), collects module-level public classes/functions and each class's
public methods, then checks studiosr_tpu for a same-named attribute —
consulting RENAMES for deliberate, documented divergences. Prints anything
unmatched; exits nonzero if a genuinely-missing symbol is found.

Run CPU-forced:
    JAX_PLATFORMS=cpu python scripts/exp_api_surface.py
"""

from __future__ import annotations

import inspect
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import jax

jax.config.update("jax_platforms", "cpu")

# Deliberate renames / re-homes: reference name -> where the CAPABILITY lives
# in studiosr_tpu. Kept in sync with module docstrings; re-run this audit after
# adding models so a genuinely-missing reference capability can't hide.
RENAMES = {
    "get_device": "utils.helpers.default_device (jax devices, not cuda)",
    "array2tensor": "data.transforms.array2image (NHWC jax arrays, not CHW torch)",
    "ToTensor": "data.transforms.ToImage (NHWC)",
    "export": "Model.export (StableHLO) + Model.export_onnx (torch route)",
    "check_image_size": "ops.windows.pad_to_window_multiple (reflect)",
    "check_image_size_for_eval": "models/swinir.py eval flip-pad (chosen at eval like swinir.py:356)",
    "calculate_mask": "ops.windows.shift_attention_mask (trace-time constant)",
    "window_partition": "ops.windows.window_partition",
    "window_reverse": "ops.windows.window_reverse",
    # ---- shared core (common.py) ----
    "MeanShift": "models.blocks.Normalizer (frozen 1x1 conv folded to an XLA constant add)",
    "conv2d": "models.blocks conv helpers (flax nn.Conv NHWC)",
    "PatchEmbed": "models/swinir.py inline NHWC embed (no NCHW<->NHWC flip needed)",
    "PatchUnEmbed": "models/swinir.py inline (native NHWC maps, no unembed step)",
    # ---- SwinIR internals ----
    "BasicLayer": "models/swinir.py RSTB residual group (alternating-shift blocks)",
    "SwinIR.forward_features": "SwinIRModule.__call__ trunk (fused path: serving/swinir_fast.py)",
    "SwinFIR.forward_features": "inherited SwinIRModule trunk with SFB resi_connection (models/swinfir.py)",
    # ---- HAT internals ----
    "AttenBlocks": "models/hat.py RHAG (depth HABs + OCAB)",
    "HAT.calculate_rpi_sa": "ops.windows.relative_position_index (trace-time constant)",
    "HAT.calculate_rpi_oca": "ops.windows.relative_position_index_oca (trace-time constant)",
    "HAT.forward_features": "HATModule.__call__ trunk (fused path: serving/hat_fast.py)",
    # ---- HAN internals ----
    "LAM_Module": "models/han.py LAM (einsum attention over the 11-map stack)",
    "CSAM_Module": "models/han.py CSAM (channel-banded dense 3x3 conv, CSAM_IMPL='banded')",
    # ---- MaxSR internals (maxsr.py helper zoo) ----
    "BaseModule": "models.base.Model (single base class for all 12 families)",
    "Attention": "models/maxsr.py _Attention (static mode)",
    "Adaptive_Attention": "models/maxsr.py _Attention(static=False)",
    "BlockAttention": "models/maxsr.py _AttentionPair block mode (_block_partition)",
    "GridAttention": "models/maxsr.py _AttentionPair grid mode (_grid_partition/_shuffle_grid)",
    "block_att": "models/maxsr.py _block_partition/_block_reverse",
    "grid_att": "models/maxsr.py _grid_partition/_grid_reverse",
    "MaxSR.MaxViT_Block": "MaxSRModule stage loop (MBConv + block/grid _AttentionPair)",
    "MaxSR.Ada_MaxViT_Block": "MaxSRModule stage loop, adaptive mode",
    "MaxSR.calculate_window_size": "MaxSRModule adaptive ceil-sqrt window (padding-aware)",
    "HFFB": "models/maxsr.py hierarchical fusion in MaxSRModule (stage-feature concat + conv)",
    "Upsample": "models.blocks.Upsampler (conv + PixelShuffle ladder; fused Pallas tails)",
    "MBConvResidual": "models/maxsr.py MBConv (residual inline)",
    "PreNormResidual": "models/maxsr.py _AttentionPair (LN + residual inline)",
    "FeedForward": "models/maxsr.py _FeedForward",
    "Dropsample": "models.blocks.DropPath (per-sample stochastic depth; reference impl has a latent bug maxsr.py:87)",
    "cast_tuple": "not needed (static configs)",
    "default": "not needed (python defaults)",
    "exists": "not needed (is not None inline)",
    "norm": "models/swinir.py LayerNorm / flax nn.LayerNorm",
    "pad": "jnp.pad at call sites (ops.windows.pad_to_window_multiple)",
    "clip": "jnp.clip at call sites (Model._forward_uint8 round/clip)",
    # ---- IMDN factory helpers (imdn.py:12-118) ----
    "activation": "models/imdn.py _lrelu + flax activations",
    "conv_layer": "flax nn.Conv NHWC (models/imdn.py)",
    "conv_block": "models/imdn.py inline conv+act",
    "sequential": "flax module composition",
    "get_valid_padding": "SAME padding via flax",
    "pixelshuffle_block": "models.blocks.Upsampler direct variant",
    "stdv_channels": "models/imdn.py CCALayer contrast (inline mean/std)",
    "mean_channels": "models/imdn.py CCALayer (inline)",
    "load_state_dict": "zoo translation layer strips 'module.' prefixes (models/imdn.py from_pretrained)",
    # ---- engine/utils ----
    "Trainer.build_optimizer": "parallel.build_optimizer (optax adam + multistep schedule)",
    "MouseHandler": "utils/compare.py ViewerState + render (immutable-state rewrite)",
}
# Torch/internals with no meaning in JAX (functional params, no nn.Module protocol).
TORCH_PROTOCOL = {
    "forward", "load_state_dict", "state_dict", "to", "cuda", "cpu", "train",
    "eval", "half", "float", "double", "parameters", "named_parameters",
    "buffers", "named_buffers", "modules", "named_modules", "children",
    "named_children", "apply", "register_buffer", "register_parameter",
    "zero_grad", "requires_grad_", "share_memory", "extra_repr", "flops",
    "no_weight_decay", "no_weight_decay_keywords",
}


def public_surface(pkg):
    """{module_name: {symbol: [methods...]}} for defs owned by the package."""
    out = {}
    prefix = pkg.__name__ + "."
    mods = [(k, v) for k, v in sys.modules.items()
            if k == pkg.__name__ or k.startswith(prefix)]
    for name, mod in sorted(mods):
        if mod is None or "test" in name:
            continue
        syms = {}
        for sym, obj in vars(mod).items():
            if sym.startswith("_") or not (inspect.isclass(obj) or inspect.isfunction(obj)):
                continue
            if getattr(obj, "__module__", "").split(".")[0] != pkg.__name__.split(".")[0]:
                continue  # re-exported third-party
            methods = []
            if inspect.isclass(obj):
                # Walk the MRO so methods hoisted into a package-owned base
                # class still count as the subclass's surface (e.g. the
                # shared download_dataset on _EvaluatorBase); third-party
                # bases (torch nn.Module etc.) stay excluded.
                pkg_root = pkg.__name__.split(".")[0]
                seen = set()
                for klass in obj.__mro__:
                    if getattr(klass, "__module__", "").split(".")[0] != pkg_root:
                        continue
                    for m, f in vars(klass).items():
                        if m.startswith("_") or m in TORCH_PROTOCOL or m in seen:
                            continue
                        if inspect.isfunction(f) or isinstance(f, (staticmethod, classmethod)):
                            seen.add(m)
                            methods.append(m)
            syms[sym] = sorted(methods)
        if syms:
            out[name] = syms
    return out


def flatten(surface):
    flat = {}
    for mod, syms in surface.items():
        for sym, methods in syms.items():
            flat.setdefault(sym, set()).update(methods)
    return flat


def main() -> int:
    from reference_loader import load_reference, reference_available

    if not reference_available():
        print("reference tree absent; nothing to audit")
        return 0
    ref_pkg = load_reference()
    # import all reference submodules
    import importlib
    for sub in ("models", "data", "engine", "utils"):
        importlib.import_module(f"studiosr.{sub}")
    for m in ("srcnn", "espcn", "vdsr", "srresnet", "edsr", "rcan", "han",
              "imdn", "swinir", "swinfir", "hat", "maxsr", "common"):
        importlib.import_module(f"studiosr.models.{m}")
    for m in ("dataset", "transforms", "handler"):
        importlib.import_module(f"studiosr.data.{m}")
    for m in ("trainer", "evaluator"):
        importlib.import_module(f"studiosr.engine.{m}")
    for m in ("metrics", "losses", "helpers", "compare"):
        importlib.import_module(f"studiosr.utils.{m}")

    import studiosr
    ref_flat = flatten(public_surface(studiosr))

    import studiosr_tpu
    for sub in ("models", "data", "engine", "utils", "parallel", "serving", "ops"):
        importlib.import_module(f"studiosr_tpu.{sub}")
    for m in ("base", "blocks", "srcnn", "espcn", "vdsr", "srresnet", "edsr",
              "rcan", "han", "imdn", "swinir", "swinfir", "hat", "maxsr"):
        importlib.import_module(f"studiosr_tpu.models.{m}")
    for m in ("dataset", "transforms", "handler"):
        importlib.import_module(f"studiosr_tpu.data.{m}")
    for m in ("trainer", "evaluator"):
        importlib.import_module(f"studiosr_tpu.engine.{m}")
    for m in ("metrics", "losses", "helpers", "compare"):
        importlib.import_module(f"studiosr_tpu.utils.{m}")
    ours_flat = flatten(public_surface(studiosr_tpu))
    ours_names = set(ours_flat)
    ours_methods = set()
    for s, ms in ours_flat.items():
        ours_methods.update(ms)

    missing = []
    for sym, methods in sorted(ref_flat.items()):
        if sym in RENAMES:
            print(f"  renamed   {sym:34s} -> {RENAMES[sym]}")
            continue
        if sym not in ours_names:
            missing.append((sym, None))
            continue
        for m in sorted(methods):
            if m in RENAMES or f"{sym}.{m}" in RENAMES:
                continue
            if m not in ours_flat.get(sym, set()) and m not in ours_methods:
                missing.append((sym, m))

    if missing:
        print("\nMISSING from studiosr_tpu:")
        for sym, m in missing:
            print(f"  {sym}" + (f".{m}" if m else ""))
        return 1
    print(f"\nOK: all {len(ref_flat)} reference symbols covered "
          f"({sum(len(v) for v in ref_flat.values())} methods checked)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
