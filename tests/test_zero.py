"""ZeRO-1 optimizer-state sharding tests (virtual 8-device CPU mesh).

The reference has no distributed training at all (SURVEY.md §2.11); ZeRO-1
is part of the new first-class parallelism subsystem. Correctness bar: the
sharded-optimizer trainer must produce the same parameters as the plain
data-parallel trainer, and the moment shards must stay sharded across
donated train steps (a layout reset would silently re-replicate and burn
the memory savings).
"""

import copy

import jax
import jax.numpy as jnp
import numpy as np

from fmc_uia_tpu.parallel import (
    make_mesh,
    shard_opt_state,
    zero_sharded_fraction,
    zero_spec_for_leaf,
)


def _ones(shape):
    return jnp.ones(shape, jnp.float32)


def test_zero_spec_rules():
    mesh = make_mesh(axes=("data",))  # 8 devices
    # large conv kernel moment: first divisible dim gets 'data'
    ps = zero_spec_for_leaf("opt/mu/conv/kernel", _ones((3, 3, 128, 256)),
                           mesh)
    assert "data" in ps
    # tiny leaves stay replicated
    ps = zero_spec_for_leaf("opt/mu/norm/bias", _ones((128,)), mesh)
    assert ps == jax.sharding.PartitionSpec()
    # TP-sharded qkv moment keeps the model dim and adds data on a free dim
    mesh2 = make_mesh(axes=("data", "model"), shape=(4, 2))
    ps = zero_spec_for_leaf("mu/blocks/qkv/kernel", _ones((256, 768)), mesh2)
    assert ps[-1] == "model" and "data" in ps


def test_shard_opt_state_fraction():
    mesh = make_mesh(axes=("data",))
    opt_state = {
        "mu": {"k": _ones((256, 1024)), "b": _ones((64,))},
        "nu": {"k": _ones((256, 1024)), "b": _ones((64,))},
        "count": jnp.zeros((), jnp.int32),
    }
    sharded = shard_opt_state(opt_state, mesh)
    frac = zero_sharded_fraction(sharded)
    assert frac > 0.95  # the two big kernels dominate the bytes
    spec = sharded["mu"]["k"].sharding.spec
    assert "data" in spec


def test_zero_trainer_matches_plain_dp():
    """2 train steps: ZeRO-1 params == plain-DP params; shards persist."""
    from fmc_uia_tpu.config import Config
    from fmc_uia_tpu.models import build_model
    from fmc_uia_tpu.models.multitask import init_variables
    from fmc_uia_tpu.tasks import TaskRegistry
    from fmc_uia_tpu.train import Trainer
    from tests.helpers import TINY_CONFIG

    S, B = 64, 8
    rng = np.random.RandomState(0)
    batch = {
        "image": rng.randint(0, 255, (B, S, S, 3)).astype(np.uint8),
        "label": rng.randint(0, 2, (B, S, S)).astype(np.int32),
        "task_id": "T2A_organ_a", "task_index": 0,
        "task_type": "segmentation",
    }

    def run(zero: bool):
        cfg_dict = copy.deepcopy(TINY_CONFIG)
        cfg_dict["parallel"] = {"tensor_parallel": False,
                                "zero_optimizer": zero}
        cfg = Config(config_dict=cfg_dict)
        registry = TaskRegistry.from_config(cfg)
        model = build_model(cfg, registry)
        variables = init_variables(model, jax.random.PRNGKey(0), S, B)
        mesh = make_mesh(axes=("data",))
        trainer = Trainer(cfg, model, registry, variables["params"],
                          jax.random.PRNGKey(0), mesh=mesh)
        if zero:
            assert zero_sharded_fraction(trainer.state.opt_state) > 0.3
        for _ in range(2):
            logs = trainer.train_batch(dict(batch), epoch=0)
        assert np.isfinite(float(logs["total_loss"]))
        return trainer

    t_plain = run(False)
    t_zero = run(True)

    p_plain = jax.tree_util.tree_leaves(t_plain.state.params["model"])
    p_zero = jax.tree_util.tree_leaves(t_zero.state.params["model"])
    for a, b in zip(p_plain, p_zero):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)

    # moment shards survived two donated steps (no silent re-replication)
    assert zero_sharded_fraction(t_zero.state.opt_state) > 0.3
