"""Test configuration: CPU backend with 8 virtual devices + float64.

Must run before JAX initialises a backend; pytest imports conftest first.
The 8-device CPU mesh is the standard JAX way to exercise multi-chip
sharding logic without a pod (SURVEY.md §4).
"""

import os

# NOTE: in this image a sitecustomize imports jax at interpreter startup, so
# env vars alone are too late; jax.config.update is the reliable override.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from iadmm_tpu.problems import generators  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def tiny_qp():
    """Small dense QP family batch (8 instances, n=24, mi=12, me=12)."""
    return generators.generate("QP", num_var=24, num_ineq=12, num_eq=12,
                               data_size=8, seed=3)
