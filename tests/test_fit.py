"""Full fit() loop smoke test: train 2 epochs end-to-end on synthetic data."""

import copy
import json

import numpy as np
import pytest

from fmc_uia_tpu.config import Config
from fmc_uia_tpu.data.synthetic import generate_synthetic_dataset
from fmc_uia_tpu.fit import fit
from tests.helpers import TINY_CONFIG


def test_fit_end_to_end(tmp_path):
    root = tmp_path / "data"
    generate_synthetic_dataset(str(root), samples_per_task=8, seed=0)

    cfg_dict = copy.deepcopy(TINY_CONFIG)
    cfg_dict["data"]["root_path"] = str(root)
    cfg_dict["data"]["batch_size"] = 4
    cfg_dict["data"]["image_size"] = 64
    cfg_dict["experiment"]["output_dir"] = str(tmp_path / "out")
    cfg_dict["experiment"]["save_checkpoints"] = True
    cfg_dict["experiment"]["checkpoint_freq"] = 1
    cfg_dict["training"]["num_epochs"] = 2
    cfg_dict["training"]["steps_per_epoch"] = 4
    cfg = Config(config_dict=cfg_dict)

    result = fit(config=cfg)
    assert result["best_epoch"] >= 1
    assert 0.0 <= result["best_score"] <= 1.0

    exp_dir = result["experiment_dir"]
    from pathlib import Path

    d = Path(exp_dir)
    for f in ["training_history.json", "train_losses.csv",
              "training_summary.csv", "val_metrics.csv", "config.yaml",
              "final_summary.json", "best_model_summary.txt",
              "training_curves.png"]:
        assert (d / f).exists(), f

    hist = json.loads((d / "training_history.json").read_text())
    assert len(hist) == 2
    assert all(np.isfinite(v["mean"]) for e in hist
               for v in e["train_losses"].values())
    # best-on-train evaluation produced group summaries
    assert result["best_eval_on_train"] is not None
    assert "segmentation" in result["best_eval_on_train"]
    # periodic checkpoint written and resumable
    from fmc_uia_tpu import checkpoint as ckpt_lib

    found = ckpt_lib.latest_checkpoint(d)
    assert found is not None and found[1]["epoch"] == 2
