"""Multi-host DCN wiring: hybrid mesh construction + process-count-1 smoke.

True multi-process needs a cluster; these tests validate the single-process
degenerate paths (SURVEY.md §2.11 / §7 step 7 contract) and the hybrid mesh
geometry on the virtual 8-CPU device set (num_slices simulated).
"""

import copy

import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from fmc_uia_tpu.config import Config
from fmc_uia_tpu.parallel import (
    batch_sharding,
    init_distributed,
    make_hybrid_mesh,
    mesh_from_config,
)
from tests.helpers import TINY_CONFIG


def test_init_distributed_noop_single_process():
    assert init_distributed(None) is False  # no env, no config -> no-op
    cfg_dict = copy.deepcopy(TINY_CONFIG)
    cfg_dict["parallel"] = {"distributed": {"enabled": True,
                                            "num_processes": 1}}
    assert init_distributed(Config(config_dict=cfg_dict)) is False


def test_hybrid_mesh_geometry():
    # simulate 2 slices x 4 chips on the virtual 8-device set
    mesh = make_hybrid_mesh(ici_axes={"data": -1}, num_slices=2)
    assert mesh.axis_names == ("dcn_data", "data")
    assert mesh.devices.shape == (2, 4)

    mesh2 = make_hybrid_mesh(ici_axes={"data": -1, "model": 2},
                             num_slices=2)
    assert mesh2.devices.shape == (2, 2, 2)

    with pytest.raises(ValueError):
        make_hybrid_mesh(ici_axes={"data": 3}, num_slices=2)  # 3*2 != 8


def test_hybrid_batch_sharding_spans_dcn_and_ici():
    mesh = make_hybrid_mesh(ici_axes={"data": -1}, num_slices=2)
    bs = batch_sharding(mesh)
    assert bs.spec == P(("dcn_data", "data"))
    x = jax.device_put(np.zeros((16, 4), np.float32), bs)
    # 8 shards of 2 rows each
    assert len(x.addressable_shards) == 8
    assert x.addressable_shards[0].data.shape == (2, 4)


def test_mesh_from_config():
    cfg_dict = copy.deepcopy(TINY_CONFIG)
    assert mesh_from_config(Config(config_dict=cfg_dict)) is None

    cfg_dict["parallel"] = {"mesh": {"data": -1}}
    mesh = mesh_from_config(Config(config_dict=cfg_dict))
    assert mesh.axis_names == ("data",)
    assert mesh.devices.shape == (8,)

    cfg_dict["parallel"] = {"mesh": {"data": -1, "model": 2}}
    mesh = mesh_from_config(Config(config_dict=cfg_dict))
    assert mesh.devices.shape == (4, 2)


def test_train_step_on_hybrid_mesh():
    """Full jitted train step with the batch sharded over dcn_data x data."""
    from fmc_uia_tpu.models import build_model
    from fmc_uia_tpu.models.multitask import init_variables
    from fmc_uia_tpu.tasks import TaskRegistry
    from fmc_uia_tpu.train import Trainer

    cfg = Config(config_dict=copy.deepcopy(TINY_CONFIG))
    reg = TaskRegistry.from_config(cfg)
    model = build_model(cfg, reg)
    S, B = 64, 8
    variables = init_variables(model, jax.random.PRNGKey(0), S, B)
    mesh = make_hybrid_mesh(ici_axes={"data": -1}, num_slices=2)
    trainer = Trainer(cfg, model, reg, variables["params"],
                      jax.random.PRNGKey(0), mesh=mesh)
    rng = np.random.RandomState(0)
    batch = {
        "image": rng.randint(0, 255, (B, S, S, 3)).astype(np.uint8),
        "label": rng.randint(0, 2, (B, S, S)).astype(np.int32),
        "task_id": "T2A_organ_a", "task_index": 0,
        "task_type": "segmentation",
    }
    logs = trainer.train_batch(batch, epoch=0)
    assert np.isfinite(float(logs["total_loss"]))
