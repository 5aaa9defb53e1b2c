"""Multi-chip (virtual 8-device CPU mesh) data-parallel tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fmc_uia_tpu.parallel import (
    batch_sharding,
    make_mesh,
    replicate,
    shard_batch,
)


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_shard_batch_layout():
    mesh = make_mesh()
    batch = {
        "image": np.zeros((16, 8, 8, 3), np.uint8),
        "label": np.zeros((16,), np.int32),
        "task_index": np.int32(3),
        "task_id": "x",
    }
    out = shard_batch(batch, mesh)
    assert out["task_id"] == "x"
    sh = out["image"].sharding
    assert sh.spec == jax.sharding.PartitionSpec("data")
    # each device holds 16/8 = 2 rows
    shard_shapes = {s.data.shape for s in out["image"].addressable_shards}
    assert shard_shapes == {(2, 8, 8, 3)}


def test_dp_grad_matches_single_device():
    """Data-parallel mean-loss gradient == single-device gradient."""
    mesh = make_mesh()

    def loss_fn(w, x, y):
        pred = x @ w
        return jnp.mean((pred - y) ** 2)

    rng = np.random.RandomState(0)
    w = rng.randn(4, 2).astype(np.float32)
    x = rng.randn(16, 4).astype(np.float32)
    y = rng.randn(16, 2).astype(np.float32)

    g_single = jax.grad(loss_fn)(jnp.asarray(w), jnp.asarray(x),
                                 jnp.asarray(y))

    bs = batch_sharding(mesh)
    w_r = replicate(jnp.asarray(w), mesh)
    x_s = jax.device_put(jnp.asarray(x), bs)
    y_s = jax.device_put(jnp.asarray(y), bs)
    g_dp = jax.jit(jax.grad(loss_fn))(w_r, x_s, y_s)

    np.testing.assert_allclose(np.asarray(g_dp), np.asarray(g_single),
                               rtol=1e-5, atol=1e-6)


def test_dryrun_multichip_entrypoint():
    """The driver-facing full-train-step dry run on the virtual mesh."""
    import importlib.util
    import pathlib

    path = pathlib.Path(__file__).resolve().parent.parent / "__graft_entry__.py"
    spec = importlib.util.spec_from_file_location("graft_entry", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)
