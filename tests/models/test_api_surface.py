"""Pin the reference-API-surface audit: every public symbol/method of the
reference package has a studiosr_tpu counterpart (same name or a documented
rename in scripts/exp_api_surface.py RENAMES)."""

import importlib.util
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from reference_loader import reference_available  # noqa: E402

SCRIPT = os.path.join(os.path.dirname(__file__), "..", "..", "scripts", "exp_api_surface.py")


@pytest.mark.skipif(not reference_available(), reason="reference tree absent")
def test_reference_api_surface_covered():
    spec = importlib.util.spec_from_file_location("exp_api_surface", SCRIPT)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert mod.main() == 0
