"""Device dataset cache under a multi-device mesh (VERDICT r4 #6 /
ADVICE r4 medium).

Round 4's cache staged banks unsharded on the default device, so with
``parallel.mesh`` set the gather emitted single-device arrays that (a) cost
a full-batch reshard every step and (b) crashed jitted eval steps fed
mesh-sharded params (incompatible device sets). These tests pin the fix:
banks stage sharded over the mesh's ``data`` axis, gathered batches come
out batch-sharded, and the values still match host collate bit-for-bit.
"""

import numpy as np
import pytest

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from fmc_uia_tpu.data.dataset import MultiTaskDataset
from fmc_uia_tpu.data.device_cache import DeviceDatasetCache
from fmc_uia_tpu.data.pipeline import _collate
from fmc_uia_tpu.parallel import make_mesh
from fmc_uia_tpu.tasks import TaskRegistry

pytestmark = pytest.mark.slow

S = 48


@pytest.fixture(scope="module")
def ds_registry(tmp_path_factory):
    from fmc_uia_tpu.data.synthetic import generate_synthetic_dataset

    root = tmp_path_factory.mktemp("synth_devcache_mesh")
    generate_synthetic_dataset(str(root), samples_per_task=9, seed=5)
    ds = MultiTaskDataset(str(root), image_size=S)
    registry = TaskRegistry(ds.derive_task_configs())
    return ds, registry


@pytest.fixture(scope="module")
def mesh():
    return make_mesh()  # 8 virtual CPU devices over the 'data' axis


@pytest.mark.parametrize("task_name", [
    "segmentation", "classification", "detection", "Regression"])
def test_mesh_gather_matches_host_collate(ds_registry, mesh, task_name):
    ds, registry = ds_registry
    cache = DeviceDatasetCache(ds, range(len(ds)), registry, mesh=mesh)
    df = ds.dataframe
    rows = list(df.index[df["task_name"] == task_name][:8])
    rows = [rows[k] for k in (3, 0, 6, 1, 7, 2, 5, 4)]  # shuffled order
    got = cache.get_batch(rows)
    want = _collate([ds[i] for i in rows], registry)
    assert np.array_equal(np.asarray(got["image"]), want["image"])
    want_label = want["label"]
    if want_label.dtype == np.uint8:
        want_label = want_label.astype(np.int32)
    assert np.array_equal(np.asarray(got["label"]), want_label)


def test_mesh_gather_outputs_batch_sharded(ds_registry, mesh):
    """The gathered batch must actually be sharded over the data axis —
    a replicated or single-device output would pass the numerics test but
    re-introduce the per-step reshard copy."""
    ds, registry = ds_registry
    cache = DeviceDatasetCache(ds, range(len(ds)), registry, mesh=mesh)
    df = ds.dataframe
    rows = list(df.index[df["task_name"] == "segmentation"][:8])
    got = cache.get_batch(rows)
    want = NamedSharding(mesh, P("data"))
    assert got["image"].sharding.is_equivalent_to(want, got["image"].ndim)
    assert got["label"].sharding.is_equivalent_to(want, got["label"].ndim)


def test_mesh_banks_are_sharded_not_replicated(ds_registry, mesh):
    """Staged banks shard over the sample axis (HBM cost = dataset/n_data
    per device), never a full replica per device."""
    ds, registry = ds_registry
    cache = DeviceDatasetCache(ds, range(len(ds)), registry, mesh=mesh)
    for tid, bank in cache._images.items():
        assert bank.sharding.is_equivalent_to(
            NamedSharding(mesh, P("data")), bank.ndim), tid
        shard_rows = {s.data.shape[0] for s in bank.addressable_shards}
        assert max(shard_rows) < bank.shape[0], (
            f"bank {tid} replicated on some device")


def test_mesh_batch_feeds_sharded_eval_step(ds_registry, mesh):
    """The ADVICE r4 crash repro: a jitted fn consuming mesh-sharded params
    AND a cache-gathered batch must compile+run (r4's committed device-0
    arrays raised incompatible-devices here)."""
    import jax.numpy as jnp

    ds, registry = ds_registry
    cache = DeviceDatasetCache(ds, range(len(ds)), registry, mesh=mesh)
    df = ds.dataframe
    rows = list(df.index[df["task_name"] == "classification"][:8])
    batch = cache.get_batch(rows)

    w = jax.device_put(np.ones((3,), np.float32),
                       NamedSharding(mesh, P()))  # mesh-replicated "params"

    @jax.jit
    def eval_step(w, image, label):
        x = image.astype(jnp.float32) / 255.0
        return (x.mean(axis=(1, 2)) @ w).sum() + label.sum()

    out = eval_step(w, batch["image"], batch["label"])
    assert np.isfinite(float(out))


def test_no_data_axis_mesh_falls_back_to_default_staging(ds_registry):
    """A mesh without a 'data' axis (pure tensor-parallel) stages the old
    way instead of crashing on the missing axis."""
    ds, registry = ds_registry
    mesh = make_mesh(axes=("model",))
    cache = DeviceDatasetCache(ds, range(len(ds)), registry, mesh=mesh)
    assert cache.mesh is None
    df = ds.dataframe
    rows = list(df.index[df["task_name"] == "detection"][:3])
    got = cache.get_batch(rows)
    want = _collate([ds[i] for i in rows], registry)
    assert np.array_equal(np.asarray(got["image"]), want["image"])
