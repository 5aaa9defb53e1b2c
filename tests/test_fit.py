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


def test_preemption_guard_sigterm_sets_flag():
    """The guard installs a real SIGTERM handler that only flips a flag."""
    import os
    import signal as _signal

    from fmc_uia_tpu.fit import _PreemptionGuard

    g = _PreemptionGuard(True)
    try:
        assert not g.requested
        os.kill(os.getpid(), _signal.SIGTERM)
        assert g.requested  # handler ran at the bytecode boundary
    finally:
        g.close()
    # handler restored: a disabled guard installs nothing
    assert _signal.getsignal(_signal.SIGTERM) is _signal.SIG_DFL or callable(
        _signal.getsignal(_signal.SIGTERM))


def test_preemption_checkpoints_and_resumes(tmp_path, monkeypatch):
    """Preemption mid-epoch writes a full checkpoint, returns cleanly with
    preempted=True, and --resume picks the run back up."""
    import fmc_uia_tpu.fit as fit_mod
    from fmc_uia_tpu import checkpoint as ckpt_lib

    root = tmp_path / "data"
    generate_synthetic_dataset(str(root), samples_per_task=8, seed=0)

    cfg_dict = copy.deepcopy(TINY_CONFIG)
    cfg_dict["data"]["root_path"] = str(root)
    cfg_dict["data"]["batch_size"] = 4
    cfg_dict["data"]["image_size"] = 64
    cfg_dict["experiment"]["output_dir"] = str(tmp_path / "out")
    cfg_dict["experiment"]["save_checkpoints"] = True
    cfg_dict["experiment"]["checkpoint_freq"] = 50  # only preemption saves
    cfg_dict["training"]["num_epochs"] = 2
    cfg_dict["training"]["steps_per_epoch"] = 4

    class FakeGuard:
        """Deterministic stand-in: 'SIGTERM arrives' at the 3rd stop-check
        (mid-first-epoch) — the signal wiring itself is covered above."""

        def __init__(self, enabled=True):
            self.checks = 0

        @property
        def requested(self):
            self.checks += 1
            return self.checks > 3

        def close(self):
            pass

    monkeypatch.setattr(fit_mod, "_PreemptionGuard", FakeGuard)
    result = fit(config=Config(config_dict=copy.deepcopy(cfg_dict)))
    assert result["preempted"] is True

    found = ckpt_lib.latest_checkpoint(cfg_dict["experiment"]["output_dir"])
    assert found is not None
    assert found[1]["epoch"] == 0  # epoch 0 was interrupted, redo it

    monkeypatch.undo()  # real guard for the resumed run
    exp_dirs_before = sorted(
        p for p in (tmp_path / "out").iterdir() if p.is_dir())
    result2 = fit(config=Config(config_dict=copy.deepcopy(cfg_dict)),
                  resume=True)
    assert "preempted" not in result2
    assert result2["best_epoch"] >= 1

    # --resume continues the SAME experiment dir (no new timestamped dir);
    # history, best_model and checkpoints end up together, so the final
    # best-model evaluation can find its weights
    exp_dirs_after = sorted(
        p for p in (tmp_path / "out").iterdir() if p.is_dir())
    assert exp_dirs_after == exp_dirs_before
    exp = exp_dirs_after[0]
    assert (exp / "best_model").exists()
    import json as _json

    hist = _json.load(open(exp / "training_history.json"))
    epochs = [e["epoch"] for e in hist]
    assert epochs == sorted(set(epochs))  # no duplicate redone epochs
    assert epochs[-1] == cfg_dict["training"]["num_epochs"]
