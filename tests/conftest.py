"""Test harness: force CPU with 8 virtual devices so multi-chip sharding
paths are exercised without TPU hardware (the capability the reference's
empty test suite lacked — see SURVEY.md §4)."""

import os

# Must be set before jax import. The environment may pre-set
# JAX_PLATFORMS=axon (real TPU tunnel) — tests always run on host CPU.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import jax  # noqa: E402

# The axon site hook can override JAX_PLATFORMS; force CPU at config level.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
