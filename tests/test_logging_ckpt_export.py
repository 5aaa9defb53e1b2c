"""Logger, checkpoint/resume, and export tests."""

import copy
import json
import os

import jax
import numpy as np
import pandas as pd
import pytest

from fmc_uia_tpu.config import Config
from fmc_uia_tpu.utils.logger import (
    TrainingLogger,
    plot_comprehensive_training_curves,
    plot_training_curves,
)
from tests.helpers import TINY_CONFIG

S = 64


def _val_df():
    return pd.DataFrame([
        {"Task ID": "T2A", "Task Name": "segmentation", "Dice": 0.8},
        {"Task ID": "T1", "Task Name": "classification", "Accuracy": 0.9,
          "F1-Score": 0.85},
        {"Task ID": "T5", "Task Name": "Regression",
          "MAE (pixels)": 12.0},
    ])


def test_logger_files(tmp_path):
    logger = TrainingLogger(tmp_path, "exp")
    logger.save_config({"a": 1})
    for epoch in [1, 2]:
        logger.log_epoch(
            epoch=epoch,
            train_losses={"T2A": [0.5, 0.4], "T1": [1.2]},
            val_results_df=_val_df(),
            learning_rate=1e-4 * epoch,
            epoch_time=3.2,
            adaptive_weights={"weights": {"segmentation": 0.6},
                               "sigmas": {"segmentation": 0.9}},
            moe_stats={"by_task_id": {"T2A": {
                "task_name": "segmentation",
                "importance": [0.5, 0.5], "load": [0.4, 0.6],
                "aux_loss": 1.9}}},
        )
    d = logger.get_experiment_dir()
    for fname in ["training_history.json", "train_losses.csv",
                   "training_summary.csv", "val_metrics.csv",
                   "moe_stats.csv", "config.yaml"]:
        assert (d / fname).exists(), fname

    hist = json.loads((d / "training_history.json").read_text())
    assert len(hist) == 2
    assert hist[0]["train_losses"]["T2A"]["mean"] == pytest.approx(0.45)

    losses = pd.read_csv(d / "train_losses.csv")
    assert set(losses["task_id"]) == {"T2A", "T1"}
    val = pd.read_csv(d / "val_metrics.csv")
    assert set(val["metric"]) == {"Dice", "Accuracy", "F1-Score",
                                  "MAE (pixels)"}

    logger.save_final_summary(best_epoch=2, best_score=0.83)
    assert (d / "final_summary.json").exists()
    logger.save_best_model_summary(
        {"segmentation": 0.8,
          "classification": {"Accuracy": 0.9, "F1-Score": 0.85}})
    assert (d / "best_model_summary.txt").exists()

    plot_training_curves(d)
    plot_comprehensive_training_curves(d)
    assert (d / "training_curves.png").exists()
    # reference artifact set (reference logger.py:579-928)
    assert (d / "training_loss_per_task.png").exists()
    assert (d / "validation_metrics_per_task.png").exists()
    assert (d / "training_summary_comprehensive.png").exists()
    # best-model summary carries the reference's section layout
    txt = (d / "best_model_summary.txt").read_text()
    assert "Per-task validation metrics of Best Epoch" in txt
    assert "Group mean primary metrics:" in txt
    assert "Best Model Evaluation on Training Set:" in txt


@pytest.fixture(scope="module")
def tiny_trained(tmp_path_factory):
    from fmc_uia_tpu.data.synthetic import generate_synthetic_dataset
    from fmc_uia_tpu.data.pipeline import build_data_engines
    from fmc_uia_tpu.models import build_model
    from fmc_uia_tpu.models.multitask import init_variables
    from fmc_uia_tpu.train import Trainer

    root = tmp_path_factory.mktemp("synth_ckpt")
    generate_synthetic_dataset(str(root), samples_per_task=8, seed=0)
    cfg_dict = copy.deepcopy(TINY_CONFIG)
    cfg_dict["data"]["root_path"] = str(root)
    cfg_dict["data"]["batch_size"] = 4
    cfg_dict["data"]["image_size"] = S
    cfg_dict["training"]["steps_per_epoch"] = 2
    cfg = Config(config_dict=cfg_dict)
    train_engine, val_engine, registry = build_data_engines(cfg)
    model = build_model(cfg, registry)
    variables = init_variables(model, jax.random.PRNGKey(0), S, 4)
    trainer = Trainer(cfg, model, registry, variables["params"],
                      jax.random.PRNGKey(0))
    for batch in train_engine:
        trainer.train_batch(batch, epoch=0)
    return cfg, registry, model, trainer, str(root)


def test_checkpoint_roundtrip(tiny_trained, tmp_path):
    from fmc_uia_tpu import checkpoint as ckpt_lib

    cfg, registry, model, trainer, _ = tiny_trained
    path = ckpt_lib.save_checkpoint(tmp_path, trainer.state, epoch=1,
                                    best_score=0.5, config_dict=cfg.config)
    found = ckpt_lib.latest_checkpoint(tmp_path)
    assert found is not None
    fpath, meta = found
    assert meta["epoch"] == 1 and meta["best_score"] == 0.5

    restored = ckpt_lib.restore_checkpoint(fpath, trainer.state)
    assert int(restored.step) == int(trainer.state.step)
    for a, b in zip(jax.tree_util.tree_leaves(restored.params),
                    jax.tree_util.tree_leaves(trainer.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_best_params_roundtrip(tiny_trained, tmp_path):
    from fmc_uia_tpu import checkpoint as ckpt_lib

    _, _, _, trainer, _ = tiny_trained
    ckpt_lib.save_best_params(tmp_path, trainer.model_params)
    loaded = ckpt_lib.load_best_params(tmp_path, trainer.model_params)
    for a, b in zip(jax.tree_util.tree_leaves(loaded),
                    jax.tree_util.tree_leaves(trainer.model_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_export_challenge_outputs(tiny_trained, tmp_path):
    from fmc_uia_tpu.export import export_predictions

    cfg, registry, model, trainer, root = tiny_trained
    out = export_predictions(
        model, trainer.model_params, root, str(tmp_path / "preds"),
        registry, cfg.get("data.augmentation.normalize.mean"),
        cfg.get("data.augmentation.normalize.std"), S, batch_size=4)

    assert len(out) == len(registry)
    # segmentation: mask PNGs at original resolution
    seg = json.load(open(out["T2A_syn_organ"]))
    assert len(seg) == 8
    mask_path = tmp_path / "preds" / "masks" / seg[0]["mask"]
    assert mask_path.exists()
    import cv2

    mask = cv2.imread(str(mask_path), cv2.IMREAD_GRAYSCALE)
    assert mask.shape == (96, 112)  # original synthetic resolution

    cls = json.load(open(out["T1_syn_planes"]))
    assert all(0 <= r["class"] < 3 for r in cls)

    det = json.load(open(out["T4_syn_box"]))
    assert all(r["x_max"] <= 112 + 1e-3 and r["y_max"] <= 96 + 1e-3
               for r in det)

    reg = json.load(open(out["T5_syn_points"]))
    assert all(len(r["points"]) == 4 for r in reg)
