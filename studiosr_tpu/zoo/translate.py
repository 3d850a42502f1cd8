"""PyTorch-checkpoint -> JAX-pytree weight translation.

The reference's ``from_pretrained`` methods load published torch
``state_dict``s (see /root/reference: ``swinir.py:404-445``, ``edsr.py:77-112``,
``hat.py:576-593``, ``imdn.py:172-181`` ...). This module re-targets those
checkpoints onto our NHWC flax models.

Design: every model in this package names its leaf linen modules so that the
**joined linen path equals the torch key prefix** (see models/blocks.py
docstring). Translation is then a single generic pass:

* torch ``{prefix}.weight`` rank-4 (O,I,kH,kW)  -> ``kernel`` (kH,kW,I,O)
* torch ``{prefix}.weight`` rank-5 (O,I,kD,kH,kW) -> ``kernel`` (kD,kH,kW,I,O)
* torch ``{prefix}.weight`` rank-2 (O,I)        -> ``kernel`` (I,O) (Dense)
  or ``embedding`` (N,D) verbatim (nn.Embed)
* torch ``{prefix}.weight`` rank-1              -> ``scale`` (LayerNorm /
  BatchNorm) or ``alpha`` (PReLU)
* torch ``{prefix}.bias``                       -> ``bias``
* torch ``{prefix}.running_mean/var``           -> batch_stats ``mean``/``var``
* any other torch leaf name (``gamma``,
  ``relative_position_bias_table`` ...)          -> same-named raw param

Key unwrapping reproduces the reference variants: ``params`` (SwinIR),
``params_ema`` (HAT), ``module.`` DataParallel prefix stripping (IMDN).
Buffers that we recompute at trace time (``relative_position_index``,
``attn_mask``, ``num_batches_tracked``) and the frozen MeanShift convs
(constants here) are dropped, mirroring the reference's ``strict=False``
loads.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

__all__ = ["load_torch_state_dict", "translate_state_dict", "export_state_dict", "TranslationReport"]

# Torch keys that have no parameter counterpart in the JAX models: trace-time
# constants or frozen buffers.
_DEFAULT_DROPPED_SUFFIXES = (
    "relative_position_index",
    "relative_position_index_SA",
    "relative_position_index_OCA",
    "rel_pos_indices",
    "num_batches_tracked",
    "attn_mask",
)
_DEFAULT_DROPPED_PREFIXES = (
    "sub_mean",  # frozen MeanShift convs -> constants (blocks.mean_shift)
    "add_mean",
    "normalizer",
)


def load_torch_state_dict(
    path: str, key: Optional[str] = "auto", allow_pickle: bool = False
) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint to numpy, handling the zoo's wrapper keys.

    ``key='auto'`` unwraps ``params``/``params_ema`` if present (reference
    ``swinir.py:441-442``, ``hat.py:591``) and strips ``module.`` DataParallel
    prefixes (``imdn.py:172-181``).

    Loads with ``weights_only=True`` (plain state_dicts need no pickled code;
    downloaded checkpoints should not execute arbitrary payloads). Set
    ``allow_pickle=True`` to opt into full unpickling for exotic checkpoints.
    """
    import torch

    try:
        obj = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        if not allow_pickle:
            raise
        obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict):
        if key == "auto":
            for candidate in ("params_ema", "params", "state_dict"):
                if candidate in obj and isinstance(obj[candidate], dict):
                    obj = obj[candidate]
                    break
        elif key is not None:
            if key not in obj:
                # Silently skipping an explicitly requested wrapper key
                # surfaces much later as hundreds of "untranslated" leaves
                # (the top-level training dict gets iterated as weights).
                raise KeyError(
                    f"checkpoint {path} has no {key!r} entry; top-level keys: "
                    f"{sorted(obj)[:10]}"
                )
            obj = obj[key]
    state = {}
    for k, v in obj.items():
        if k.startswith("module."):
            k = k[len("module.") :]
        state[k] = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
    return state


@dataclass
class TranslationReport:
    matched: List[str] = field(default_factory=list)
    missing: List[str] = field(default_factory=list)  # target leaves with no torch source
    unused: List[str] = field(default_factory=list)  # torch keys never consumed
    dropped: List[str] = field(default_factory=list)  # torch keys intentionally dropped

    def raise_if_missing(self) -> None:
        if self.missing:
            raise KeyError(f"untranslated target parameters: {self.missing[:20]} (+{max(0, len(self.missing)-20)} more)")


# Tuple-keyed dict flattening: flax ships exactly this (and handles the
# edge cases); keep thin aliases rather than a private re-implementation.
def _flatten(tree: Dict[str, Any], prefix: Tuple[str, ...] = ()) -> Dict[Tuple[str, ...], Any]:
    from flax.traverse_util import flatten_dict

    flat = flatten_dict(tree)
    return {prefix + k: v for k, v in flat.items()} if prefix else flat


def _unflatten(flat: Dict[Tuple[str, ...], Any]) -> Dict[str, Any]:
    from flax.traverse_util import unflatten_dict

    return unflatten_dict(flat)


def _convert(leaf_name: str, source: np.ndarray, target_shape: Tuple[int, ...]) -> np.ndarray:
    if leaf_name == "kernel":
        if source.ndim == 4:
            out = source.transpose(2, 3, 1, 0)
        elif source.ndim == 5:
            out = source.transpose(2, 3, 4, 1, 0)
        elif source.ndim == 2:
            out = source.transpose(1, 0)
        else:
            out = source
    else:
        out = source
    if out.shape != tuple(target_shape):
        raise ValueError(f"shape mismatch for {leaf_name}: torch {out.shape} vs target {tuple(target_shape)}")
    return np.ascontiguousarray(out.astype(np.float32))


_LEAF_TO_TORCH = {
    "kernel": "weight",
    "scale": "weight",
    "embedding": "weight",
    "alpha": "weight",
    "bias": "bias",
    "mean": "running_mean",
    "var": "running_var",
}


def translate_state_dict(
    state_dict: Dict[str, np.ndarray],
    variables: Dict[str, Any],
    strict: bool = True,
) -> Tuple[Dict[str, Any], TranslationReport]:
    """Fill a flax variable dict from a torch ``state_dict``.

    ``variables`` is a template (e.g. from ``module.init``) providing the
    target tree structure and shapes; a new variable dict with translated
    values is returned. ``strict=True`` raises if any target leaf has no
    source (mirroring ``load_state_dict(strict=True)``); extra torch keys are
    reported but never fatal (the reference loads several zoo checkpoints
    with ``strict=False``, e.g. ``edsr.py:111``).
    """
    report = TranslationReport()
    consumed = set()

    grouped: Dict[str, Dict[str, np.ndarray]] = {}
    for key, value in state_dict.items():
        prefix, _, leaf = key.rpartition(".")
        grouped.setdefault(prefix, {})[leaf] = value

    new_flat: Dict[Tuple[str, ...], Any] = {}
    for path, target in _flatten(variables).items():
        collection, *rest = path
        if collection not in ("params", "batch_stats"):
            new_flat[path] = target
            continue
        prefix = ".".join(rest[:-1])
        leaf = rest[-1]
        torch_leaf = _LEAF_TO_TORCH.get(leaf, leaf)
        source = grouped.get(prefix, {}).get(torch_leaf)
        if source is None:
            report.missing.append(".".join(rest))
            new_flat[path] = target
            continue
        new_flat[path] = _convert(leaf, source, target.shape)
        consumed.add(f"{prefix}.{torch_leaf}" if prefix else torch_leaf)
        report.matched.append(".".join(rest))

    for key in state_dict:
        if key in consumed:
            continue
        if key.endswith(_DEFAULT_DROPPED_SUFFIXES) or key.startswith(_DEFAULT_DROPPED_PREFIXES):
            report.dropped.append(key)
        else:
            report.unused.append(key)

    if strict:
        report.raise_if_missing()
    return _unflatten(new_flat), report


def _convert_back(leaf_name: str, value: np.ndarray) -> np.ndarray:
    if leaf_name == "kernel":
        if value.ndim == 4:
            return value.transpose(3, 2, 0, 1)
        if value.ndim == 5:
            return value.transpose(4, 3, 0, 1, 2)
        if value.ndim == 2:
            return value.transpose(1, 0)
    return value


def export_state_dict(variables: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Inverse translation: flax variables -> torch-convention state_dict.

    Lets weights trained here flow back to the PyTorch ecosystem (the
    reference's checkpoint format): HWIO kernels -> OIHW, Dense kernels
    transposed, flax leaf names -> torch names, batch_stats -> running
    stats. Trace-time constants (masks, rel-pos indices) are recomputed by
    the consumer, matching the reference's buffer handling.
    """
    state: Dict[str, np.ndarray] = {}
    for path, value in _flatten(variables).items():
        collection, *rest = path
        if collection not in ("params", "batch_stats"):
            continue
        prefix = ".".join(rest[:-1])
        leaf = rest[-1]
        torch_leaf = _LEAF_TO_TORCH.get(leaf, leaf)
        key = f"{prefix}.{torch_leaf}" if prefix else torch_leaf
        state[key] = _convert_back(leaf, np.asarray(value))
    return state
