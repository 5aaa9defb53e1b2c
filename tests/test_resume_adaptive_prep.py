"""fit(resume=True) end-to-end + adaptive-norm input-prep training."""

import copy
import json
from pathlib import Path

import numpy as np
import pytest

from fmc_uia_tpu.config import Config
from fmc_uia_tpu.data.synthetic import generate_synthetic_dataset
from fmc_uia_tpu.fit import fit
from tests.helpers import TINY_CONFIG

S = 64


def _cfg(root, out, **overrides):
    cfg_dict = copy.deepcopy(TINY_CONFIG)
    cfg_dict["data"]["root_path"] = str(root)
    cfg_dict["data"]["batch_size"] = 4
    cfg_dict["data"]["image_size"] = S
    cfg_dict["experiment"]["output_dir"] = str(out)
    cfg_dict["experiment"]["save_checkpoints"] = True
    cfg_dict["experiment"]["checkpoint_freq"] = 1
    cfg_dict["training"]["num_epochs"] = 1
    cfg_dict["training"]["steps_per_epoch"] = 3

    def deep_update(dst, src):
        for k, v in src.items():
            if isinstance(v, dict) and isinstance(dst.get(k), dict):
                deep_update(dst[k], v)
            else:
                dst[k] = v

    deep_update(cfg_dict, overrides)
    return Config(config_dict=cfg_dict)


def test_fit_resume_continues_from_checkpoint(tmp_path):
    root = tmp_path / "data"
    generate_synthetic_dataset(str(root), samples_per_task=8, seed=0)
    out = tmp_path / "out"

    r1 = fit(config=_cfg(root, out))
    assert (Path(r1["experiment_dir"]) / "checkpoint_epoch_1").exists()

    # resume with more epochs: continues run 1's experiment dir, keeping
    # its epoch-1 history and appending only the new epoch 2
    cfg2 = _cfg(root, out, training={"num_epochs": 2})
    r2 = fit(config=cfg2, resume=True)
    assert r2["experiment_dir"] == r1["experiment_dir"]
    hist = json.loads(
        (Path(r2["experiment_dir"]) / "training_history.json").read_text())
    epochs_run = [e["epoch"] for e in hist]
    assert epochs_run == [1, 2], epochs_run


def test_fit_with_adaptive_norm_input_prep(tmp_path):
    """Adaptive per-image normalization: float batches flow through the
    identity device-prep path and training still converges numerically."""
    root = tmp_path / "data"
    generate_synthetic_dataset(str(root), samples_per_task=8, seed=1)
    cfg = _cfg(root, tmp_path / "out2",
               data={"use_adaptive_norm": True, "force_grayscale": True})
    result = fit(config=cfg)
    assert np.isfinite(result["best_score"])
    hist = json.loads(
        (Path(result["experiment_dir"]) / "training_history.json").read_text())
    for e in hist:
        for stats in e["train_losses"].values():
            assert np.isfinite(stats["mean"])
