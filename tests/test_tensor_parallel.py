"""Tensor-parallel sharding tests on a 2x4 virtual mesh."""

import copy

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from fmc_uia_tpu.parallel import (
    apply_param_sharding,
    make_mesh,
    make_param_specs,
    tp_spec_for_path,
)


def test_tp_spec_rules():
    assert tp_spec_for_path("encoder/stage0_block0/attn/qkv/kernel", 2) == \
        P(None, "model")
    assert tp_spec_for_path("encoder/stage0_block0/attn/proj/kernel", 2) == \
        P("model", None)
    assert tp_spec_for_path("encoder/stage0_block0/mlp_fc1/kernel", 2) == \
        P(None, "model")
    assert tp_spec_for_path("encoder/stage0_block0/mlp_fc2/kernel", 2) == \
        P("model", None)
    assert tp_spec_for_path("encoder/stage0_block0/norm1/scale", 1) == P()
    assert tp_spec_for_path("fpn_seg/lateral5/kernel", 4) == P()


def test_min_dim_gate():
    params = {
        "big": {"mlp_fc1": {"kernel": np.zeros((512, 2048))}},
        "small": {"mlp_fc1": {"kernel": np.zeros((32, 64))}},
    }
    specs = make_param_specs(params, min_shard_dim=256)
    assert specs["big"]["mlp_fc1"]["kernel"] == P(None, "model")
    assert specs["small"]["mlp_fc1"]["kernel"] == P()


def test_tp_matmul_matches_single_device():
    """Column+row parallel pair: sharded result == replicated result."""
    mesh = make_mesh(axes=("data", "model"), shape=(2, 4))
    rng = np.random.RandomState(0)
    x = rng.randn(8, 64).astype(np.float32)
    w1 = rng.randn(64, 128).astype(np.float32)  # column parallel
    w2 = rng.randn(128, 64).astype(np.float32)  # row parallel

    def f(x, w1, w2):
        return jax.nn.relu(x @ w1) @ w2

    expected = f(x, w1, w2)

    from jax.sharding import NamedSharding

    xs = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P("data", None)))
    w1s = jax.device_put(jnp.asarray(w1),
                         NamedSharding(mesh, P(None, "model")))
    w2s = jax.device_put(jnp.asarray(w2),
                         NamedSharding(mesh, P("model", None)))
    got = jax.jit(f)(xs, w1s, w2s)
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-4,
                               atol=1e-4)


def test_trainer_tp_end_to_end():
    """Full train step with TP-sharded swin params on a (2, 4) mesh."""
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

    # at least one encoder kernel actually sharded over 'model'
    sharded = [
        leaf for leaf in jax.tree_util.tree_leaves(
            trainer.state.params["model"]["encoder"])
        if hasattr(leaf, "sharding")
        and "model" in str(leaf.sharding.spec)
    ]
    assert sharded, "no encoder param was tensor-sharded"

    batch = {
        "image": np.random.RandomState(0).randint(
            0, 255, (B, S, S, 3)).astype(np.uint8),
        "label": np.random.RandomState(1).randint(
            0, 2, (B, S, S)).astype(np.int32),
        "task_id": "T2A_organ_a", "task_index": 0,
        "task_type": "segmentation",
    }
    logs = trainer.train_batch(batch, epoch=0)
    assert np.isfinite(float(logs["total_loss"]))
