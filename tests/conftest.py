"""Test configuration: force an 8-device CPU platform before jax imports.

This gives every test a virtual 8-device mesh for sharding/collective tests
without TPU hardware (SURVEY.md §4).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the shell may pin a TPU platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# pytest plugins (jaxtyping) import jax before this conftest runs, which
# bakes the env's JAX_PLATFORMS into jax.config — override it directly.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
