"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without hardware via
``--xla_force_host_platform_device_count=8`` — the standard JAX answer to
testing distributed code on one host (SURVEY.md §4).

Env vars must be set before the first ``import jax`` anywhere in the test
process, which is why this happens at conftest import time.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(0)
