"""Test configuration: force the CPU backend with 8 virtual devices so
multi-chip sharding logic (mesh, psum reductions, DP reconstruction) is
exercised without TPU hardware.

Note: the environment pins JAX_PLATFORMS=axon via sitecustomize, so the
env var alone is not enough — we must set the config flag before any
backend is initialized."""
import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"
# hermetic autotune: probe decisions must not leak across test runs or
# in from a TPU session's cache (calib/autotune.py)
os.environ["DIPOORLET_TPU_AUTOTUNE_CACHE"] = os.path.join(
    os.environ.get("TMPDIR", "/tmp"), f"dipoorlet_autotune_test_{os.getpid()}.json")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(0)
