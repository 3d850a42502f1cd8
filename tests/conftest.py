"""Test harness configuration.

Runs the whole suite on a virtual 8-device CPU mesh so multi-chip sharding is
exercised without TPU hardware (the fake-backend mechanism the reference
lacks — its DDP path is untested config-driven code, see SURVEY.md §4).

Note: this environment pre-imports jax via a sitecustomize that registers a
remote TPU backend; the backend is not initialized until first use, so
forcing the platform config here (before any jax op runs) is sufficient.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.devices()[0].platform == "cpu"


@pytest.fixture
def rng():
    return np.random.default_rng(0)
