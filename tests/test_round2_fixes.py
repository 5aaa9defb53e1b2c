"""Regression tests for the round-1 verdict's correctness edges:

1. gradient accumulation under a tensor-parallel mesh keeps its accumulator
2. regression loss / MAE mask padded point columns (banked heads pad to
   2*Pmax across tasks)
3. ReduceLROnPlateau ignores validation-skipped epochs (score=None)
"""

import copy

import jax
import jax.numpy as jnp
import numpy as np

from fmc_uia_tpu.config import Config
from fmc_uia_tpu.losses import l1_loss, mse_loss, smooth_l1_loss
from fmc_uia_tpu.metrics import mae_pixels
from fmc_uia_tpu.models import build_model
from fmc_uia_tpu.models.multitask import init_variables
from fmc_uia_tpu.parallel import make_mesh
from fmc_uia_tpu.tasks import TaskRegistry
from fmc_uia_tpu.train import LRScheduler, Trainer
from tests.helpers import TINY_CONFIG

S, B = 64, 8


# --------------------------------------------------------------------------
# 1. grad accumulation x tensor parallel
# --------------------------------------------------------------------------
def test_grad_accum_survives_tp_mesh():
    cfg_dict = copy.deepcopy(TINY_CONFIG)
    cfg_dict["model"]["encoder"] = {"name": "swin_nano", "pretrained": None,
                                    "drop_path_rate": 0.0}
    cfg_dict["parallel"] = {"tensor_parallel": True, "tp_min_dim": 32}
    cfg_dict["training"]["accumulation_steps"] = 2
    cfg = Config(config_dict=cfg_dict)
    reg = TaskRegistry.from_config(cfg)
    model = build_model(cfg, reg)
    variables = init_variables(model, jax.random.PRNGKey(0), S, B)
    mesh = make_mesh(axes=("data", "model"), shape=(2, 4))
    trainer = Trainer(cfg, model, reg, variables["params"],
                      jax.random.PRNGKey(0), mesh=mesh)

    assert trainer.state.grad_accum is not None, (
        "TP branch dropped the gradient accumulator")
    # the accumulator follows the params' shardings
    specs_p = [str(getattr(x.sharding, "spec", None)) for x in
               jax.tree_util.tree_leaves(trainer.state.params)]
    specs_a = [str(getattr(x.sharding, "spec", None)) for x in
               jax.tree_util.tree_leaves(trainer.state.grad_accum)]
    assert specs_p == specs_a

    rng = np.random.RandomState(0)
    batch = {
        "image": rng.randint(0, 255, (B, S, S, 3)).astype(np.uint8),
        "label": rng.randint(0, 3, (B,)).astype(np.int32),
        "task_id": "T1_planes", "task_index": 2,
        "task_type": "classification",
    }
    p0 = jax.tree_util.tree_map(np.asarray, trainer.state.params["model"])
    logs = trainer.train_batch(dict(batch), epoch=0)  # micro 1: no update
    assert np.isfinite(float(logs["total_loss"]))
    unchanged = all(
        np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(p0),
                        jax.tree_util.tree_leaves(
                            trainer.state.params["model"])))
    assert unchanged, "params moved before the accumulation boundary"
    logs = trainer.train_batch(dict(batch), epoch=0)  # micro 2: update
    assert np.isfinite(float(logs["total_loss"]))
    changed = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(p0),
                        jax.tree_util.tree_leaves(
                            trainer.state.params["model"])))
    assert changed, "no update at the accumulation boundary under TP"


# --------------------------------------------------------------------------
# 2. regression padded-column masking
# --------------------------------------------------------------------------
def test_regression_loss_masks_padded_columns():
    rng = np.random.RandomState(0)
    pred4 = rng.randn(8, 4).astype(np.float32)
    target4 = rng.randn(8, 4).astype(np.float32)
    # pad to width 8 with garbage predictions and zero labels
    pred8 = np.concatenate([pred4, rng.randn(8, 4).astype(np.float32) * 50],
                           axis=1)
    target8 = np.concatenate([target4, np.zeros((8, 4), np.float32)], axis=1)
    for fn in (mse_loss, l1_loss, smooth_l1_loss):
        unpadded = float(fn(jnp.asarray(pred4), jnp.asarray(target4)))
        masked = float(fn(jnp.asarray(pred8), jnp.asarray(target8),
                          num_valid_cols=jnp.asarray(4)))
        np.testing.assert_allclose(masked, unpadded, rtol=1e-6)
        # and without the mask the padding poisons the loss
        poisoned = float(fn(jnp.asarray(pred8), jnp.asarray(target8)))
        assert abs(poisoned - unpadded) > 1e-3


def test_mae_pixels_masks_padded_columns():
    rng = np.random.RandomState(1)
    labels4 = rng.rand(4, 4).astype(np.float32)
    preds4 = rng.rand(4, 4).astype(np.float32)
    labels8 = np.concatenate([labels4, np.zeros((4, 4), np.float32)], axis=1)
    preds8 = np.concatenate([preds4, rng.rand(4, 4).astype(np.float32)],
                            axis=1)
    unpadded = float(mae_pixels(jnp.asarray(labels4), jnp.asarray(preds4)))
    masked = float(mae_pixels(jnp.asarray(labels8), jnp.asarray(preds8),
                              num_valid_cols=jnp.asarray(4)))
    np.testing.assert_allclose(masked, unpadded, rtol=1e-5)


# --------------------------------------------------------------------------
# 3. plateau scheduler ignores skip epochs
# --------------------------------------------------------------------------
def _plateau_cfg():
    cfg_dict = copy.deepcopy(TINY_CONFIG)
    cfg_dict["training"]["scheduler"] = {
        "type": "ReduceLROnPlateau", "mode": "max", "factor": 0.5,
        "patience": 1,
    }
    return Config(config_dict=cfg_dict)


def test_plateau_scheduler_ignores_none_score():
    sch = LRScheduler(_plateau_cfg())
    sch.step(0.5)          # best = 0.5
    assert sch.scale == 1.0
    for _ in range(10):    # validation-skipped epochs: no signal
        sch.step(None)
    assert sch.scale == 1.0, "skip epochs were counted as bad epochs"
    sch.step(0.4)          # bad 1
    sch.step(0.4)          # bad 2 > patience -> reduce
    assert sch.scale == 0.5


# --------------------------------------------------------------------------
# 4. fixed-shape eval batches (no per-residual-shape recompiles)
# --------------------------------------------------------------------------
def test_eval_engine_pads_final_chunk():
    from fmc_uia_tpu.data.pipeline import DataEngine, build_data_engines
    from fmc_uia_tpu.data.synthetic import generate_synthetic_dataset
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        generate_synthetic_dataset(tmp, samples_per_task=7, seed=0)
        cfg_dict = copy.deepcopy(TINY_CONFIG)
        cfg_dict["data"]["root_path"] = tmp
        cfg_dict["data"]["batch_size"] = 4
        cfg_dict["data"]["image_size"] = 32
        cfg_dict["data"]["val_split"] = 0.5
        cfg = Config(config_dict=cfg_dict)
        _, val_engine, reg = build_data_engines(cfg)
        saw_padded = False
        for batch in val_engine:
            assert batch["image"].shape[0] == 4, (
                "eval batch not padded to the fixed batch size")
            assert batch["valid"].shape == (4,)
            n_valid = int(batch["valid"].sum())
            assert batch["valid"][:n_valid].all()
            if n_valid < 4:
                saw_padded = True
                # padding repeats the last valid row
                np.testing.assert_array_equal(
                    batch["image"][n_valid - 1], batch["image"][-1])
        assert saw_padded, "fixture produced no residual chunk"


def test_dice_sample_mask_matches_unpadded():
    from fmc_uia_tpu.metrics import dice_coefficient

    rng = np.random.RandomState(2)
    labels = rng.randint(0, 3, (4, 8, 8)).astype(np.int32)
    logits = rng.randn(4, 8, 8, 3).astype(np.float32)
    unpadded = float(dice_coefficient(jnp.asarray(labels),
                                      jnp.asarray(logits)))
    # pad with 2 garbage samples and mask them out
    labels_p = np.concatenate(
        [labels, rng.randint(0, 3, (2, 8, 8)).astype(np.int32)])
    logits_p = np.concatenate(
        [logits, rng.randn(2, 8, 8, 3).astype(np.float32)])
    mask = np.array([True] * 4 + [False] * 2)
    masked = float(dice_coefficient(jnp.asarray(labels_p),
                                    jnp.asarray(logits_p),
                                    sample_mask=jnp.asarray(mask)))
    np.testing.assert_allclose(masked, unpadded, rtol=1e-6)


# --------------------------------------------------------------------------
# 5. lax.scan burst driver
# --------------------------------------------------------------------------
def test_train_burst_matches_step_count_and_runs():
    from fmc_uia_tpu.models import build_model
    from fmc_uia_tpu.models.multitask import init_variables
    from fmc_uia_tpu.train import Trainer as T

    cfg = Config(config_dict=copy.deepcopy(TINY_CONFIG))
    reg = TaskRegistry.from_config(cfg)
    model = build_model(cfg, reg)
    variables = init_variables(model, jax.random.PRNGKey(0), S, 2)
    trainer = T(cfg, model, reg, variables["params"], jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    batch = {
        "image": rng.randint(0, 255, (2, S, S, 3)).astype(np.uint8),
        "label": rng.randint(0, 3, (2,)).astype(np.int32),
        "task_id": "T1_planes", "task_index": 2,
        "task_type": "classification",
    }
    out = trainer.train_burst(batch, 5)
    assert out["losses"].shape == (5,)
    assert np.isfinite(np.asarray(out["losses"])).all()
    assert int(trainer.state.step) == 5
    # losses drop over the burst (same batch, 5 optimizer steps)
    assert float(out["losses"][-1]) < float(out["losses"][0])
    # single-step path still works after a burst, and scalar caching
    # produces identical per-step args
    logs = trainer.train_batch(batch, epoch=0)
    assert int(trainer.state.step) == 6
    assert np.isfinite(float(logs["total_loss"]))


# --------------------------------------------------------------------------
# 6. parity polish: multi-stage FiLM + normalize-conflict warning
# --------------------------------------------------------------------------
def test_multi_film_modulates_encoder_features():
    from fmc_uia_tpu.models import build_model
    from fmc_uia_tpu.models.multitask import init_variables

    cfg_dict = copy.deepcopy(TINY_CONFIG)
    cfg_dict["model"]["use_film"] = True
    cfg_dict["model"]["film"] = {"use_task_embedding": False,
                                 "use_affine": True, "multi_stage": True}
    cfg = Config(config_dict=cfg_dict)
    reg = TaskRegistry.from_config(cfg)
    model = build_model(cfg, reg)
    variables = init_variables(model, jax.random.PRNGKey(0), S, 2)
    assert "multi_film" in variables["params"], (
        "MultiFiLM params not registered")
    x = jnp.asarray(np.random.RandomState(0).rand(2, S, S, 3),
                    jnp.float32)
    out = model.apply({"params": variables["params"]}, x, "segmentation",
                      jnp.int32(0), train=False)
    assert np.isfinite(np.asarray(out)).all()


def test_adaptive_norm_conflict_warns():
    import warnings

    from fmc_uia_tpu.ops.image import input_prep_fns

    cfg_dict = copy.deepcopy(TINY_CONFIG)
    cfg_dict["data"]["use_adaptive_norm"] = True
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        input_prep_fns(Config(config_dict=cfg_dict))
    assert any("CONFLICT" in str(x.message) for x in w)

    # identity stats: no warning
    cfg_dict["data"]["augmentation"]["normalize"] = {
        "mean": [0, 0, 0], "std": [1, 1, 1]}
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        input_prep_fns(Config(config_dict=cfg_dict))
    assert not any("CONFLICT" in str(x.message) for x in w)
