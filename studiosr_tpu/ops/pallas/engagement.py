"""Kernel-engagement accounting for the fused Pallas serving/training paths.

Round 2's costliest bug was *silent* fallback: every fused kernel returns
``None`` when a layout doesn't fit and the caller quietly takes the XLA path,
so a kernel that "should" be running can be absent at the benchmark shape
without any signal (STATUS.md round-2 findings). This module makes every such
decision loud:

- ``engaged(name)`` / ``fallback(name, reason)`` are called at TRACE time by
  every fused kernel entry point (the layout decision is static), feeding a
  process-wide counter table readable via ``counters()``.
- strict mode (``set_strict(True)`` or env ``STUDIOSR_TPU_STRICT_ENGAGE=1``)
  raises ``KernelFallback`` the moment any fused kernel declines, turning a
  silent perf regression into a hard error. Off by default because layered
  fallbacks are legitimate (whole-block kernel -> split kernels -> XLA).

Counters increment when the Python body of a kernel wrapper actually runs;
jit caching can skip re-tracing, so tests must ``reset()`` and
``jax.clear_caches()`` before tracing (see tests/ops/test_engagement.py).
"""

from __future__ import annotations

import collections
import os
import threading

__all__ = [
    "KernelFallback",
    "engaged",
    "fallback",
    "counters",
    "reset",
    "set_strict",
]

_lock = threading.Lock()
_counters: collections.Counter = collections.Counter()
_fallback_reasons: dict = {}
_strict = os.environ.get("STUDIOSR_TPU_STRICT_ENGAGE", "0") not in ("", "0")


class KernelFallback(RuntimeError):
    """A fused kernel declined to run while strict engagement was on."""


def set_strict(on: bool = True) -> None:
    global _strict
    _strict = bool(on)


def engaged(name: str) -> None:
    """Record that fused kernel ``name`` is being emitted for this trace."""
    with _lock:
        _counters[(name, "engaged")] += 1


def fallback(name: str, reason: str, structural: bool = False):
    """Record that ``name`` declined; returns None (the fallback sentinel).

    In strict mode raises instead, so silent-fallback regressions fail fast.
    ``structural=True`` marks a BY-DESIGN decline — no kernel exists for
    this configuration at all (e.g. the scale-8 upsample tail) — which is
    recorded for visibility but never raises: strict mode exists to catch
    layout regressions of kernels that should run, and a structural decline
    is not distinguishable from one by the caller otherwise.
    """
    with _lock:
        _counters[(name, "fallback")] += 1
        _fallback_reasons[name] = reason
    if _strict and not structural:
        raise KernelFallback(f"fused kernel {name!r} fell back: {reason}")
    return None


def structural_tail_decline(scale: int) -> None:
    """Record the by-design fused-upsample-tail decline for ``scale``.

    One helper shared by every fused serving path (SwinIR/HAT): no fused
    tail exists outside scales 2/3/4 — the XLA log2 ladder (reference
    ``common.py:130-133``) serves those — so the name, reason format and
    ``structural`` flag stay in sync across serving files (the engagement
    tests grep the reason for "log2-ladder")."""
    fallback(
        "fused_upsample_tail",
        f"scale {scale}: no fused tail (XLA log2-ladder path)",
        structural=True,
    )


def counters() -> dict:
    """{kernel name: {"engaged": n, "fallback": m, ["reason": last]}}."""
    with _lock:
        out: dict = {}
        for (name, kind), count in _counters.items():
            out.setdefault(name, {})[kind] = count
        for name, reason in _fallback_reasons.items():
            out.setdefault(name, {})["reason"] = reason
        return out


def reset() -> None:
    with _lock:
        _counters.clear()
        _fallback_reasons.clear()
