"""Model registry + checkpoint reconstruction.

The Trainer writes ``params.json`` with the model config next to each
checkpoint (reference ``trainer.py:159-162``); this module closes the loop:
``load_model(ckpt_dir)`` rebuilds the model class from its config and
restores the weights from the msgpack checkpoint.
"""

from __future__ import annotations

import json
import os
from collections.abc import Mapping as _Mapping
from typing import Any, Dict

__all__ = ["MODEL_REGISTRY", "get_model_class", "load_model"]


def _registry() -> Dict[str, Any]:
    from studiosr_tpu import models

    return {
        "srcnn": models.SRCNN,
        "espcn": models.ESPCN,
        "vdsr": models.VDSR,
        "srresnet": models.SRResNet,
        "edsr": models.EDSR,
        "rcan": models.RCAN,
        "han": models.HAN,
        "imdn": models.IMDN,
        "swinir": models.SwinIR,
        "swinfir": models.SwinFIR,
        "hat": models.HAT,
        "maxsr": models.MaxSR,
    }


class _LazyRegistry(_Mapping):
    """Dict-like view over the model registry, built lazily (importing the
    models package at module import would be circular). Exporting the bare
    ``_registry`` function here made ``'swinir' in MODEL_REGISTRY`` a
    TypeError — the natural dict-style reads must work."""

    def __getitem__(self, name: str):
        reg = _registry()
        try:
            return reg[name.lower()]
        except KeyError:
            # A typo (or a comma-joined list passed as one name) must fail
            # with the available choices, not a bare KeyError from deep
            # inside a sweep script.
            raise KeyError(
                f"unknown model {name!r}; available: {sorted(reg)}"
            ) from None

    def __iter__(self):
        return iter(_registry())

    def __len__(self) -> int:
        return len(_registry())


MODEL_REGISTRY = _LazyRegistry()


def get_model_class(name: str):
    return MODEL_REGISTRY[name]


def load_model(ckpt_dir: str, model_name: str, tag: str = "best", ema: bool = False):
    """Rebuild a model from ``{ckpt_dir}/params.json`` + ``{tag}.model.ckpt``.

    ``ema=True`` serves the EMA shadow weights from ``{tag}.ema.ckpt``
    (written by ``Trainer(ema_decay=...)`` — the reference zoo's
    ``params_ema`` analog) in place of the raw parameters."""
    import inspect

    from flax import serialization

    with open(os.path.join(ckpt_dir, "params.json")) as f:
        config = json.load(f)
    cls = get_model_class(model_name)
    # fast_init where the builder supports it: the checkpoint overwrites
    # every value, and the real initializer runs a full forward (minutes for
    # flagship models on CPU — models/base.py fast_init_variables).
    if "fast_init" in inspect.signature(cls.build).parameters:
        config = dict(config, fast_init=True)
    model = cls.build(**config)
    from studiosr_tpu.utils.helpers import check_tree_shapes

    path = os.path.join(ckpt_dir, f"{tag}.model.ckpt")
    with open(path, "rb") as f:
        restored = serialization.from_bytes(model.variables, f.read())
    # from_bytes only checks tree keys — a ckpt whose params.json was edited
    # (or whose files were mixed between runs) restores wrong shapes silently
    # and explodes later inside the jitted forward. Fail loudly here, the
    # same contract as Trainer resume (engine/trainer.py _load_tag).
    check_tree_shapes(restored, model.variables, context=path)
    model.variables = restored
    if ema:
        ema_path = os.path.join(ckpt_dir, f"{tag}.ema.ckpt")
        with open(ema_path, "rb") as f:
            ema_params = serialization.from_bytes(model.variables["params"], f.read())
        check_tree_shapes(ema_params, model.variables["params"], context=ema_path)
        model.variables = dict(model.variables, params=ema_params)
    return model
