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


# ---------------------------------------------------------------------------
# Ragged (all_to_all token dispatch) expert parallelism — parallel/expert.py
# ---------------------------------------------------------------------------
from fmc_uia_tpu.parallel.expert import (  # noqa: E402
    default_capacity,
    dense_moe_reference,
    ragged_moe_apply,
)


def _expert_fn(params, tokens):
    # tokens: [n, F]; params: {'w': [F, F], 'b': [F]}
    return jnp.tanh(tokens @ params["w"] + params["b"])


def _make_moe_inputs(rng, B=16, E=8, F=32):
    x = jnp.asarray(rng.randn(B, F), jnp.float32)
    logits = jnp.asarray(rng.randn(B, E), jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    params = {
        "w": jnp.asarray(rng.randn(E, F, F) * 0.2, jnp.float32),
        "b": jnp.asarray(rng.randn(E, F) * 0.1, jnp.float32),
    }
    return x, probs, params


def test_ragged_dispatch_matches_dense_no_drops():
    """With capacity >= local_tokens * top_k nothing overflows and the
    all_to_all dispatch must reproduce the dense all-expert combine."""
    rng = np.random.RandomState(1)
    B, E, F, K = 16, 8, 32, 2
    x, probs, params = _make_moe_inputs(rng, B, E, F)
    mesh = make_mesh(jax.devices()[:4], axes=("model",))

    ref = dense_moe_reference(_expert_fn, params, x, probs, top_k=K)
    # capacity_factor E/K makes capacity == bloc * top_k -> zero drops
    out = ragged_moe_apply(_expert_fn, params, x, probs, mesh,
                           axis="model", top_k=K, capacity_factor=E / K)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_ragged_dispatch_top1():
    rng = np.random.RandomState(2)
    B, E, F = 16, 8, 16
    x, probs, params = _make_moe_inputs(rng, B, E, F)
    mesh = make_mesh(jax.devices()[:4], axes=("model",))
    ref = dense_moe_reference(_expert_fn, params, x, probs, top_k=1)
    out = ragged_moe_apply(_expert_fn, params, x, probs, mesh,
                           axis="model", top_k=1, capacity_factor=float(E))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_ragged_dispatch_capacity_drops_are_bounded():
    """With a tight capacity, output is a masked version of dense: every
    token's output is either the dense value or zero (dropped), never
    garbage."""
    rng = np.random.RandomState(3)
    B, E, F = 16, 4, 8
    x, probs, params = _make_moe_inputs(rng, B, E, F)
    mesh = make_mesh(jax.devices()[:4], axes=("model",))
    ref = np.asarray(
        dense_moe_reference(_expert_fn, params, x, probs, top_k=1))
    out = np.asarray(
        ragged_moe_apply(_expert_fn, params, x, probs, mesh,
                         axis="model", top_k=1, capacity_factor=1.0))
    ok = (np.isclose(out, ref, rtol=1e-4, atol=1e-5)
          | np.isclose(out, 0.0, atol=1e-6))
    assert ok.all()


def test_ragged_dispatch_under_jit_and_grad():
    rng = np.random.RandomState(4)
    B, E, F, K = 16, 8, 16, 2
    x, probs, params = _make_moe_inputs(rng, B, E, F)
    mesh = make_mesh(jax.devices()[:4], axes=("model",))

    def loss(p, xx, pp):
        out = ragged_moe_apply(_expert_fn, p, xx, pp, mesh,
                               axis="model", top_k=K,
                               capacity_factor=E / K)
        return jnp.mean(out ** 2)

    def dense_loss(p, xx, pp):
        return jnp.mean(
            dense_moe_reference(_expert_fn, p, xx, pp, top_k=K) ** 2)

    v, g = jax.jit(jax.value_and_grad(loss))(params, x, probs)
    v_ref, g_ref = jax.value_and_grad(dense_loss)(params, x, probs)
    np.testing.assert_allclose(float(v), float(v_ref), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g),
                    jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_default_capacity_guarantee():
    assert default_capacity(4, 8, 2, capacity_factor=4.0) == 4
    # factor E/K -> cap == bloc * K (zero-drop bound)
    assert default_capacity(4, 8, 2, capacity_factor=8 / 2) == 4


def test_moe_conv_block_ragged_mode_matches_dense():
    """MoEConvBlock(dispatch_mode='ragged') at zero-drop capacity must
    reproduce the dense all-expert combine bit-for-tolerance, from the SAME
    param tree (dispatch is a pure execution mode)."""
    from fmc_uia_tpu.models.conditioning import MoEConvBlock

    E, K, B, Sp, C = 8, 2, 8, 16, 32
    mesh = make_mesh(jax.devices()[:4], axes=("model",))
    kw = dict(num_experts=E, expert_hidden=16, router_hidden=16, top_k=K,
              use_task_embedding=False, num_tasks=4, use_residual=True,
              dropout=0.0, dtype=jnp.float32)
    dense = MoEConvBlock(**kw)
    ragged = MoEConvBlock(dispatch_mode="ragged", ep_mesh=mesh,
                          ep_axis="model", capacity_factor=E / K, **kw)

    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(B, Sp, Sp, C), jnp.float32)
    params = dense.init(jax.random.PRNGKey(0), x)["params"]
    # identical param trees across modes
    p2 = ragged.init(jax.random.PRNGKey(0), x)["params"]
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(p2))

    out_d, aux_d, st_d = dense.apply({"params": params}, x)
    out_r, aux_r, st_r = ragged.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(out_r), np.asarray(out_d),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(aux_r), float(aux_d), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(st_r["importance"]),
                               np.asarray(st_d["importance"]), rtol=1e-5)


def test_moe_conv_block_ragged_requires_mesh():
    from fmc_uia_tpu.models.conditioning import MoEConvBlock

    blk = MoEConvBlock(num_experts=8, dispatch_mode="ragged")
    x = jnp.zeros((8, 8, 8, 16), jnp.float32)
    try:
        blk.init(jax.random.PRNGKey(0), x)
        raise AssertionError("expected ValueError for missing ep_mesh")
    except ValueError as e:
        assert "ep_mesh" in str(e)


def test_pick_dispatch_mode_auto():
    """`model.moe.dispatch: auto` resolves from (E, top_k, EP mesh shape):
    dense without a multi-device EP axis or at small E; ragged at large,
    evenly-divisible expert counts."""
    from fmc_uia_tpu.models.conditioning import pick_dispatch_mode

    mesh = make_mesh(axes=("data", "model"), shape=(2, 4))
    assert pick_dispatch_mode(64, 2, None, "model") == "dense"
    assert pick_dispatch_mode(64, 2, mesh, "absent") == "dense"
    assert pick_dispatch_mode(8, 2, mesh, "model") == "dense"
    assert pick_dispatch_mode(64, 2, mesh, "model") == "ragged"
    assert pick_dispatch_mode(66, 2, mesh, "model") == "dense"  # 66 % 4
    assert pick_dispatch_mode(64, 16, mesh, "model") == "dense"  # topk-heavy
    # a 1-device axis never goes ragged
    one = make_mesh(jax.devices()[:1], axes=("model",))
    assert pick_dispatch_mode(64, 2, one, "model") == "dense"


def test_moe_dispatch_auto_through_build_model():
    cfg_dict = copy.deepcopy(TINY_CONFIG)
    cfg_dict["model"]["moe"] = {
        "enabled": True, "num_experts": 32, "top_k": 2,
        "stage_indices": [3], "expert_hidden": 8, "router_hidden": 8,
        "use_task_embedding": False, "use_residual": True, "dropout": 0.0,
        "balance_loss_weight": 0.05, "dispatch": "auto",
        "capacity_factor": 16.0,
    }
    cfg = Config(config_dict=cfg_dict)
    reg = TaskRegistry.from_config(cfg)
    mesh = make_mesh(axes=("data", "model"), shape=(2, 4))
    moe_cfg = cfg.get("model.moe")
    model = build_model(cfg, reg, mesh=mesh)
    assert model._resolve_dispatch(moe_cfg) == "ragged"
    model_nomesh = build_model(cfg, reg)
    assert model_nomesh._resolve_dispatch(moe_cfg) == "dense"
    # and the resolved mode builds + runs end-to-end
    variables = init_variables(model, jax.random.PRNGKey(0), 32, 8)
    assert variables["params"]
