"""Gradient accumulation tests: N micro-batches == one big batch update."""

import copy

import jax
import jax.numpy as jnp
import numpy as np

from fmc_uia_tpu.config import Config
from fmc_uia_tpu.models import build_model
from fmc_uia_tpu.models.multitask import init_variables
from fmc_uia_tpu.tasks import TaskRegistry
from fmc_uia_tpu.train import Trainer
from tests.helpers import TINY_CONFIG

S = 64


def _make(accum, seed=0, dropout0=True):
    cfg_dict = copy.deepcopy(TINY_CONFIG)
    cfg_dict["training"]["accumulation_steps"] = accum
    if dropout0:  # determinism across paths
        cfg_dict["model"]["decoder"]["dropout"] = 0.0
        cfg_dict["model"]["heads"]["classification"]["dropout"] = 0.0
        cfg_dict["model"]["heads"]["regression"]["dropout"] = 0.0
        cfg_dict["data"]["augmentation"]["train"] = {
            "random_brightness_contrast": 0.0, "gauss_noise": 0.0,
        }
    cfg = Config(config_dict=cfg_dict)
    reg = TaskRegistry.from_config(cfg)
    model = build_model(cfg, reg)
    variables = init_variables(model, jax.random.PRNGKey(seed), S, 2)
    trainer = Trainer(cfg, model, reg, variables["params"],
                      jax.random.PRNGKey(seed))
    return cfg, reg, model, trainer


def _cls_batch(rng, n):
    return {
        "image": rng.randint(0, 255, (n, S, S, 3)).astype(np.uint8),
        "label": rng.randint(0, 3, (n,)).astype(np.int32),
        "task_id": "T1_planes", "task_index": 2,
        "task_type": "classification",
    }


def test_no_update_until_boundary():
    _, _, _, trainer = _make(accum=3)
    rng = np.random.RandomState(0)
    p0 = jax.tree_util.tree_map(np.asarray, trainer.state.params["model"])
    trainer.train_batch(_cls_batch(rng, 2), epoch=0)  # micro 1
    trainer.train_batch(_cls_batch(rng, 2), epoch=0)  # micro 2
    p_mid = trainer.state.params["model"]
    for a, b in zip(jax.tree_util.tree_leaves(p0),
                    jax.tree_util.tree_leaves(p_mid)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    trainer.train_batch(_cls_batch(rng, 2), epoch=0)  # micro 3 -> update
    changed = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(p0),
                        jax.tree_util.tree_leaves(
                            trainer.state.params["model"])))
    assert changed


def test_accum_matches_big_batch():
    """2 micro-batches of 2 == 1 batch of 4 (same data, same rng path)."""
    rng = np.random.RandomState(7)
    data = _cls_batch(rng, 4)

    _, _, _, t_accum = _make(accum=2, seed=1)
    half1 = {**data, "image": data["image"][:2], "label": data["label"][:2]}
    half2 = {**data, "image": data["image"][2:], "label": data["label"][2:]}
    t_accum.train_batch(half1, epoch=0)
    t_accum.train_batch(half2, epoch=0)

    _, _, _, t_big = _make(accum=1, seed=1)
    t_big.train_batch(data, epoch=0)

    pa = jax.tree_util.tree_leaves(t_accum.state.params["model"])
    pb = jax.tree_util.tree_leaves(t_big.state.params["model"])
    # means of per-sample CE gradients over equal halves == big-batch grad;
    # adam normalization is scale-free, so params should match closely
    max_diff = max(
        float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
        for a, b in zip(pa, pb))
    assert max_diff < 5e-5, max_diff
