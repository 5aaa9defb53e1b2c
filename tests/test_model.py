"""Model stack tests: encoder/decoder/head shapes, banked-head selection."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fmc_uia_tpu.models import build_model
from fmc_uia_tpu.models.multitask import init_variables
from fmc_uia_tpu.tasks import TaskRegistry
from tests.helpers import make_tiny_config

B, S = 2, 64  # batch, image size


@pytest.fixture(scope="module")
def model_and_params():
    cfg = make_tiny_config()
    reg = TaskRegistry.from_config(cfg)
    model = build_model(cfg, reg)
    variables = init_variables(model, jax.random.PRNGKey(0), S, B)
    return cfg, reg, model, variables


def test_segmentation_output_shape(model_and_params):
    _, reg, model, variables = model_and_params
    x = jnp.ones((B, S, S, 3), jnp.float32)
    out = model.apply(variables, x, "segmentation", jnp.int32(0), train=False)
    assert out.shape == (B, S, S, reg.max_classes("segmentation"))


def test_classification_output_shape(model_and_params):
    _, reg, model, variables = model_and_params
    x = jnp.ones((B, S, S, 3), jnp.float32)
    gidx = reg["T1_planes"].global_index
    out = model.apply(variables, x, "classification", jnp.int32(gidx),
                      train=False)
    assert out.shape == (B, reg.max_classes("classification"))


def test_detection_output_shapes(model_and_params):
    _, reg, model, variables = model_and_params
    x = jnp.ones((B, S, S, 3), jnp.float32)
    gidx = reg["T4_box"].global_index
    out = model.apply(variables, x, "detection", jnp.int32(gidx), train=False)
    assert set(out.keys()) == {"heatmap", "size", "offset"}
    assert out["heatmap"].shape == (B, S // 4, S // 4, 1)
    assert out["size"].shape == (B, S // 4, S // 4, 2)
    assert out["offset"].shape == (B, S // 4, S // 4, 2)
    # offset sigmoid in [0,1], size ReLU >= 0
    assert float(jnp.min(out["offset"])) >= 0.0
    assert float(jnp.max(out["offset"])) <= 1.0
    assert float(jnp.min(out["size"])) >= 0.0


def test_regression_output_shape_and_range(model_and_params):
    _, reg, model, variables = model_and_params
    x = jnp.ones((B, S, S, 3), jnp.float32)
    gidx = reg["T5_points"].global_index
    out = model.apply(variables, x, "Regression", jnp.int32(gidx), train=False)
    assert out.shape == (B, reg.max_classes("Regression") * 2)
    assert float(jnp.min(out)) >= 0.0 and float(jnp.max(out)) <= 1.0


def test_banked_heads_differ_across_tasks(model_and_params):
    """Two subtasks of the same type give different outputs (distinct banks)."""
    _, reg, model, variables = model_and_params
    x = jnp.linspace(0, 1, B * S * S * 3).reshape(B, S, S, 3).astype(jnp.float32)
    out0 = model.apply(variables, x, "segmentation", jnp.int32(0), train=False)
    out1 = model.apply(variables, x, "segmentation", jnp.int32(1), train=False)
    assert not np.allclose(np.asarray(out0), np.asarray(out1))


def test_one_jit_program_serves_all_subtasks(model_and_params):
    """task_index is a device arg: no retrace across subtasks of one type."""
    _, reg, model, variables = model_and_params
    x = jnp.ones((B, S, S, 3), jnp.float32)

    @jax.jit
    def fwd(v, x, idx):
        return model.apply(v, x, "segmentation", idx, train=False)

    out0 = fwd(variables, x, jnp.int32(0))
    out1 = fwd(variables, x, jnp.int32(1))
    assert fwd._cache_size() == 1
    assert out0.shape == out1.shape


def test_train_mode_needs_dropout_rng(model_and_params):
    _, reg, model, variables = model_and_params
    x = jnp.ones((B, S, S, 3), jnp.float32)
    out = model.apply(
        variables, x, "classification",
        jnp.int32(reg["T1_planes"].global_index), train=True,
        rngs={"dropout": jax.random.PRNGKey(1)},
    )
    assert out.shape[0] == B


def test_deep_supervision_outputs():
    cfg = make_tiny_config(
        model={"heads": {"segmentation": {"use_deep_supervision": True}}}
    )
    reg = TaskRegistry.from_config(cfg)
    model = build_model(cfg, reg)
    x = jnp.zeros((B, S, S, 3), jnp.float32)
    variables = init_variables(model, jax.random.PRNGKey(0), S, B)
    main, auxs = model.apply(variables, x, "segmentation", jnp.int32(0),
                             train=False)
    assert main.shape == (B, S, S, 2)
    assert len(auxs) == 2
    assert auxs[0].shape == (B, S // 4, S // 4, 2)


def test_moe_intermediates():
    cfg = make_tiny_config(
        model={"moe": {
            "enabled": True, "num_experts": 4, "top_k": 2,
            "stage_indices": [2, 3], "expert_hidden": 8,
            "router_hidden": 8, "use_task_embedding": True,
            "task_embedding_dim": 8, "use_residual": True, "dropout": 0.0,
            "balance_loss_weight": 0.05,
        }}
    )
    reg = TaskRegistry.from_config(cfg)
    model = build_model(cfg, reg)
    x = jnp.zeros((B, S, S, 3), jnp.float32)
    variables = init_variables(model, jax.random.PRNGKey(0), S, B)
    out, state = model.apply(
        variables, x, "segmentation", jnp.int32(0), train=False,
        mutable=["intermediates"],
    )
    inter = state["intermediates"]
    aux_vals = jax.tree_util.tree_leaves(
        {k: v for k, v in inter.items() if "moe_aux" in str(k)}
    )
    # flatten: sown values live under submodule scopes
    flat = jax.tree_util.tree_leaves(inter)
    assert len(flat) > 0
    assert out.shape == (B, S, S, 2)
