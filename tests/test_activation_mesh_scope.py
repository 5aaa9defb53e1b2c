"""Regression tests for the r3 process-global activation-mesh leak.

Round 3's ``Trainer.__init__`` installed the activation-constraint mesh
process-wide and never removed it; a later, unrelated ``enc.init`` then
traced under the leaked 8-device ``{data, model}`` mesh, committed its
params to 8 devices, and a 2-device pipeline ``shard_map`` rejected them —
the order-dependent ``test_pipeline_swin_stage_matches_sequential`` failure
(VERDICT r3 Weak #1). The mesh is now only ever installed as a scope around
the Trainer's own trace/execute points (train.py:_act_scope); these tests
pin that a constructed-and-used Trainer cannot perturb later computations.
"""

import copy

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fmc_uia_tpu.parallel import (
    activation_mesh,
    activation_mesh_scope,
    set_activation_mesh,
    shard_activation,
)
from fmc_uia_tpu.parallel.mesh import make_mesh

pytestmark = pytest.mark.slow


def test_scope_restores_previous_mesh():
    assert activation_mesh() is None
    outer = make_mesh(jax.devices()[:2], axes=("data",))
    inner = make_mesh(jax.devices()[:4], axes=("data",))
    with activation_mesh_scope(outer):
        assert activation_mesh() is outer
        with activation_mesh_scope(inner):
            assert activation_mesh() is inner
        assert activation_mesh() is outer
    assert activation_mesh() is None


def test_scope_restores_on_exception():
    mesh = make_mesh(jax.devices()[:2], axes=("data",))
    with pytest.raises(RuntimeError, match="boom"):
        with activation_mesh_scope(mesh):
            raise RuntimeError("boom")
    assert activation_mesh() is None


def test_shard_activation_identity_without_mesh():
    x = jnp.ones((4, 8))
    assert shard_activation(x, "data") is x


def _tp_trainer():
    """Same setup as test_tensor_parallel.test_trainer_tp_end_to_end so the
    step compile is shared through the persistent cache."""
    from fmc_uia_tpu.config import Config
    from fmc_uia_tpu.models import build_model
    from fmc_uia_tpu.models.multitask import init_variables
    from fmc_uia_tpu.tasks import TaskRegistry
    from fmc_uia_tpu.train import Trainer
    from tests.helpers import TINY_CONFIG

    cfg_dict = copy.deepcopy(TINY_CONFIG)
    cfg_dict["model"]["encoder"] = {"name": "swin_nano", "pretrained": None,
                                    "drop_path_rate": 0.0}
    cfg_dict["parallel"] = {"tensor_parallel": True, "tp_min_dim": 32}
    cfg = Config(config_dict=cfg_dict)
    registry = TaskRegistry.from_config(cfg)
    model = build_model(cfg, registry)
    S, B = 64, 8
    variables = init_variables(model, jax.random.PRNGKey(0), S, B)
    mesh = make_mesh(axes=("data", "model"), shape=(2, 4))
    trainer = Trainer(cfg, model, registry, variables["params"],
                      jax.random.PRNGKey(0), mesh=mesh)
    batch = {
        "image": np.random.RandomState(0).randint(
            0, 255, (B, S, S, 3)).astype(np.uint8),
        "label": np.random.RandomState(1).randint(
            0, 2, (B, S, S)).astype(np.int32),
        "task_id": "T2A_organ_a", "task_index": 0,
        "task_type": "segmentation",
    }
    return trainer, batch


def test_used_trainer_does_not_perturb_later_computations():
    """The exact r3 failure ordering, in one test: a mesh'd Trainer traces
    a step, then an unrelated encoder init + 2-device pipeline must behave
    as if the Trainer never existed."""
    trainer, batch = _tp_trainer()
    assert activation_mesh() is None, "Trainer.__init__ leaked the mesh"
    logs = trainer.train_batch(batch, epoch=0)
    assert np.isfinite(float(logs["total_loss"]))
    assert activation_mesh() is None, "train_batch leaked the mesh"
    del trainer

    # victim: the pipeline-parallel swin-stage wiring that failed in r3
    from fmc_uia_tpu.models.encoders.swin import SwinEncoder
    from fmc_uia_tpu.parallel.pipeline import pipeline_swin_stage

    enc = SwinEncoder(embed_dim=16, depths=(2, 2, 4, 2),
                      num_heads=(2, 2, 2, 2), window_size=4,
                      drop_path_rate=0.0, scan_blocks=True,
                      dtype=jnp.float32)
    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    params = enc.init(jax.random.PRNGKey(0), img)["params"]
    # init must NOT have committed params onto the (discarded) 8-dev mesh
    for leaf in jax.tree_util.tree_leaves(params):
        assert len(leaf.devices()) == 1, (
            f"param committed to {len(leaf.devices())} devices — a leaked "
            f"activation mesh injected sharding constraints into init")

    mesh2 = make_mesh(jax.devices()[:2], axes=("pipe",))
    x = jnp.zeros((4, 8, 8, enc.embed_dim * 4), jnp.float32)
    out = pipeline_swin_stage(enc, params, 2, x, mesh2, microbatches=4)
    assert np.all(np.isfinite(np.asarray(out)))


def test_warm_compile_scopes_mesh():
    trainer, batch = _tp_trainer()
    times = trainer.warm_compile(
        {"segmentation": batch}, parallel=False)
    assert "segmentation" in times
    assert activation_mesh() is None, "warm_compile leaked the mesh"
    # the AOT executable still runs fine after the scope closed
    logs = trainer.train_batch(batch, epoch=0)
    assert np.isfinite(float(logs["total_loss"]))
    assert activation_mesh() is None


def test_foreign_install_does_not_reach_trainer_traces():
    """mesh=None Trainers open a None scope, shielding their traces from
    any foreign process-global install."""
    from fmc_uia_tpu.config import Config
    from fmc_uia_tpu.models import build_model
    from fmc_uia_tpu.models.multitask import init_variables
    from fmc_uia_tpu.tasks import TaskRegistry
    from fmc_uia_tpu.train import Trainer
    from tests.helpers import TINY_CONFIG

    cfg_dict = copy.deepcopy(TINY_CONFIG)
    cfg_dict["model"]["encoder"] = {"name": "swin_nano", "pretrained": None,
                                    "drop_path_rate": 0.0}
    cfg = Config(config_dict=cfg_dict)
    registry = TaskRegistry.from_config(cfg)
    model = build_model(cfg, registry)
    S, B = 64, 4
    variables = init_variables(model, jax.random.PRNGKey(0), S, B)
    trainer = Trainer(cfg, model, registry, variables["params"],
                      jax.random.PRNGKey(0))  # mesh=None
    batch = {
        "image": np.random.RandomState(0).randint(
            0, 255, (B, S, S, 3)).astype(np.uint8),
        "label": np.random.RandomState(1).randint(
            0, 2, (B, S, S)).astype(np.int32),
        "task_id": "T2A_organ_a", "task_index": 0,
        "task_type": "segmentation",
    }
    foreign = make_mesh(axes=("data", "model"), shape=(2, 4))
    set_activation_mesh(foreign)  # simulate a badly-behaved caller
    try:
        logs = trainer.train_batch(batch, epoch=0)
        assert np.isfinite(float(logs["total_loss"]))
        # single-device state stays single-device
        for leaf in jax.tree_util.tree_leaves(
                trainer.state.params["model"]):
            assert len(leaf.devices()) == 1
    finally:
        set_activation_mesh(None)
