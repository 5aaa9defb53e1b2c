"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without hardware via
``--xla_force_host_platform_device_count=8`` — the standard JAX answer to
testing distributed code on one host (SURVEY.md §4).

Env vars must be set before the first ``import jax`` anywhere in the test
process, which is why this happens at conftest import time.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
# Persistent compile cache: the model graphs are large and CPU XLA compiles
# are the dominant test cost; cache them across pytest runs.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tests")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault(
    "JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon PJRT plugin (sitecustomize) force-registers the TPU backend and
# overrides JAX_PLATFORMS; pin the config explicitly so tests run on the
# virtual 8-device CPU mesh. FMC_TEST_TPU=1 opts in to the real TPU
# backend instead, un-skipping the Pallas-kernel tests
# (test_preprocess_pallas, test_vit_flash's grad test, ...).
if os.environ.get("FMC_TEST_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(0)
