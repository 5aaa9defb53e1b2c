"""Expert-parallel MoE via sharding rules on the (data, model) mesh.

The MoE block computes all experts as expert-grouped convs
(models/conditioning.py); sharding those kernels' expert-major channel axes
over the ``model`` mesh axis distributes experts across devices and GSPMD
inserts the combine collectives — the shard_map-free expert parallelism
(SURVEY.md §2.11 'optional later').
"""

import copy

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from fmc_uia_tpu.config import Config
from fmc_uia_tpu.models import build_model
from fmc_uia_tpu.models.multitask import init_variables
from fmc_uia_tpu.parallel import make_mesh, make_param_specs
from fmc_uia_tpu.tasks import TaskRegistry
from fmc_uia_tpu.train import Trainer
from tests.helpers import TINY_CONFIG

S, B = 64, 8


def _cfg():
    cfg_dict = copy.deepcopy(TINY_CONFIG)
    cfg_dict["model"]["moe"] = {
        "enabled": True, "num_experts": 8, "top_k": 2,
        "stage_indices": [2, 3], "expert_hidden": 64,
        "router_hidden": 32, "use_task_embedding": True,
        "task_embedding_dim": 8, "use_residual": True, "dropout": 0.0,
        "balance_loss_weight": 0.05,
    }
    cfg_dict["parallel"] = {"tensor_parallel": True, "tp_min_dim": 64}
    return Config(config_dict=cfg_dict)


def test_moe_expert_kernels_get_model_specs():
    cfg = _cfg()
    reg = TaskRegistry.from_config(cfg)
    model = build_model(cfg, reg)
    variables = init_variables(model, jax.random.PRNGKey(0), S, B)
    specs = make_param_specs(variables["params"], min_shard_dim=64)
    flat = jax.tree_util.tree_flatten_with_path(specs)[0]
    moe_sharded = [
        (jax.tree_util.keystr(path), spec) for path, spec in flat
        if "moe" in jax.tree_util.keystr(path) and spec != P()
    ]
    assert moe_sharded, "no MoE expert kernel was sharded"
    assert any("expert_in" in p for p, _ in moe_sharded)


def test_ep_train_step_matches_replicated():
    """One train step: EP-sharded == fully replicated params (numerics)."""
    cfg = _cfg()
    reg = TaskRegistry.from_config(cfg)
    model = build_model(cfg, reg)
    variables = init_variables(model, jax.random.PRNGKey(0), S, B)

    rng = np.random.RandomState(0)
    batch = {
        "image": rng.randint(0, 255, (B, S, S, 3)).astype(np.uint8),
        "label": rng.randint(0, 2, (B, S, S)).astype(np.int32),
        "task_id": "T2A_organ_a", "task_index": 0,
        "task_type": "segmentation",
    }

    def host_params():
        # each trainer gets independent host copies: the donated-state train
        # step may otherwise alias and delete shared buffers
        return jax.tree_util.tree_map(np.asarray, variables["params"])

    mesh = make_mesh(axes=("data", "model"), shape=(2, 4))
    t_ep = Trainer(cfg, model, reg, host_params(),
                   jax.random.PRNGKey(0), mesh=mesh)
    logs_ep = t_ep.train_batch(dict(batch), epoch=0)

    cfg2 = _cfg()
    cfg2.config["parallel"]["tensor_parallel"] = False
    t_rep = Trainer(cfg2, model, reg, host_params(),
                    jax.random.PRNGKey(0), mesh=mesh)
    logs_rep = t_rep.train_batch(dict(batch), epoch=0)

    assert np.isfinite(float(logs_ep["total_loss"]))
    np.testing.assert_allclose(float(logs_ep["total_loss"]),
                               float(logs_rep["total_loss"]),
                               rtol=1e-4, atol=1e-5)
