"""Training logger: JSON/CSV history + plots.

Functional equivalent of the reference's TrainingLogger
(reference utils/logger.py:15-476) writing the same artifact set into a
timestamped experiment dir:

  training_history.json   complete nested per-epoch history
  train_losses.csv        per-task per-epoch loss mean/std/min/max
  val_metrics.csv         long-format per-task per-epoch metrics
  training_summary.csv    per-epoch averages (+ lr, epoch_time)
  moe_stats.csv           per-expert importance/load by task
  config.yaml             config snapshot
  final_summary.json/.txt best epoch/score
  best_model_summary.txt  best-model train-set evaluation
  training_curves.png / comprehensive_curves*.png  (post-training plots)
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np
import pandas as pd
import yaml


class TrainingLogger:
    def __init__(self, log_dir, experiment_name: str):
        timestamp = time.strftime("%Y%m%d_%H%M%S")
        self.experiment_dir = Path(log_dir) / f"{experiment_name}_{timestamp}"
        self.experiment_dir.mkdir(parents=True, exist_ok=True)
        self.experiment_name = experiment_name
        self.history: List[Dict] = []

    def get_experiment_dir(self) -> Path:
        return self.experiment_dir

    # -- per-epoch logging -------------------------------------------------
    def log_epoch(
        self,
        epoch: int,
        train_losses: Dict[str, List[float]],
        val_results_df: Optional[pd.DataFrame],
        learning_rate: float,
        epoch_time: float,
        adaptive_weights: Optional[Dict] = None,
        moe_stats: Optional[Dict] = None,
    ) -> None:
        entry: Dict = {
            "epoch": epoch,
            "learning_rate": float(learning_rate),
            "epoch_time": float(epoch_time),
            "train_losses": {
                tid: {
                    "mean": float(np.mean(v)),
                    "std": float(np.std(v)),
                    "min": float(np.min(v)),
                    "max": float(np.max(v)),
                    "count": len(v),
                }
                for tid, v in train_losses.items() if len(v)
            },
        }
        if val_results_df is not None and not val_results_df.empty:
            entry["val_metrics"] = val_results_df.to_dict(orient="records")
        if adaptive_weights:
            entry["adaptive_weights"] = adaptive_weights
        if moe_stats:
            entry["moe_stats"] = moe_stats
        self.history.append(entry)
        self._rewrite_files()

    def _rewrite_files(self) -> None:
        with open(self.experiment_dir / "training_history.json", "w") as f:
            json.dump(self.history, f, indent=2, default=float)

        loss_rows = []
        summary_rows = []
        val_rows = []
        moe_rows = []
        for entry in self.history:
            epoch = entry["epoch"]
            means = []
            for tid, stats in entry["train_losses"].items():
                loss_rows.append({"epoch": epoch, "task_id": tid, **stats})
                means.append(stats["mean"])
            summary_rows.append({
                "epoch": epoch,
                "avg_train_loss": float(np.mean(means)) if means else np.nan,
                "learning_rate": entry["learning_rate"],
                "epoch_time": entry["epoch_time"],
            })
            for rec in entry.get("val_metrics", []):
                for metric, value in rec.items():
                    if metric in ("Task ID", "Task Name"):
                        continue
                    if value is None or (isinstance(value, float)
                                         and np.isnan(value)):
                        continue
                    val_rows.append({
                        "epoch": epoch,
                        "task_id": rec["Task ID"],
                        "task_name": rec["Task Name"],
                        "metric": metric,
                        "value": float(value),
                    })
            for scope_name, scope in (entry.get("moe_stats") or {}).items():
                for key, stats in scope.items():
                    for expert_idx, (imp, load) in enumerate(
                        zip(stats.get("importance", []),
                            stats.get("load", []))
                    ):
                        moe_rows.append({
                            "epoch": epoch, "scope": scope_name, "key": key,
                            "task_name": stats.get("task_name", ""),
                            "expert": expert_idx,
                            "importance": float(imp), "load": float(load),
                        })

        pd.DataFrame(loss_rows).to_csv(
            self.experiment_dir / "train_losses.csv", index=False)
        pd.DataFrame(summary_rows).to_csv(
            self.experiment_dir / "training_summary.csv", index=False)
        if val_rows:
            pd.DataFrame(val_rows).to_csv(
                self.experiment_dir / "val_metrics.csv", index=False)
        if moe_rows:
            pd.DataFrame(moe_rows).to_csv(
                self.experiment_dir / "moe_stats.csv", index=False)

    # -- one-shot artifacts ------------------------------------------------
    def save_config(self, config_dict: Dict) -> None:
        with open(self.experiment_dir / "config.yaml", "w",
                  encoding="utf-8") as f:
            yaml.dump(config_dict, f, default_flow_style=False,
                      allow_unicode=True)

    def save_final_summary(self, best_epoch: int, best_score: float) -> None:
        summary = {
            "experiment": self.experiment_name,
            "total_epochs": len(self.history),
            "best_epoch": int(best_epoch),
            "best_score": float(best_score),
        }
        with open(self.experiment_dir / "final_summary.json", "w") as f:
            json.dump(summary, f, indent=2)
        with open(self.experiment_dir / "final_summary.txt", "w") as f:
            for k, v in summary.items():
                f.write(f"{k}: {v}\n")

    def save_best_model_summary(self, eval_on_train: Optional[Dict]) -> None:
        path = self.experiment_dir / "best_model_summary.txt"
        with open(path, "w") as f:
            f.write("Best model evaluation on training set\n")
            f.write("=" * 50 + "\n")
            if not eval_on_train:
                f.write("(no evaluation available)\n")
                return
            for group, value in eval_on_train.items():
                if isinstance(value, dict):
                    for metric, v in value.items():
                        f.write(f"{group}/{metric}: "
                                f"{'n/a' if v is None else f'{v:.4f}'}\n")
                else:
                    f.write(f"{group}: "
                            f"{'n/a' if value is None else f'{value:.4f}'}\n")

    # reference-compat alias (train.py:772 calls the underscored name)
    _save_best_model_summary_txt = save_best_model_summary


def plot_training_curves(experiment_dir) -> None:
    """4-panel basic curves (reference logger.py:493-576)."""
    experiment_dir = Path(experiment_dir)
    summary_path = experiment_dir / "training_summary.csv"
    if not summary_path.exists():
        return
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    summary = pd.read_csv(summary_path)
    fig, axes = plt.subplots(2, 2, figsize=(12, 8))
    axes[0, 0].plot(summary["epoch"], summary["avg_train_loss"])
    axes[0, 0].set_title("Avg train loss")
    axes[0, 1].plot(summary["epoch"], summary["learning_rate"])
    axes[0, 1].set_title("Learning rate")
    axes[0, 1].set_yscale("log")
    axes[1, 0].plot(summary["epoch"], summary["epoch_time"])
    axes[1, 0].set_title("Epoch time (s)")

    val_path = experiment_dir / "val_metrics.csv"
    if val_path.exists():
        val = pd.read_csv(val_path)
        mean_by_epoch = val.groupby("epoch")["value"].mean()
        axes[1, 1].plot(mean_by_epoch.index, mean_by_epoch.values)
        axes[1, 1].set_title("Mean val metric")
    for ax in axes.flat:
        ax.set_xlabel("epoch")
        ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(experiment_dir / "training_curves.png", dpi=120)
    plt.close(fig)


def plot_comprehensive_training_curves(experiment_dir) -> None:
    """Per-task-group curves (reference logger.py:579-928)."""
    experiment_dir = Path(experiment_dir)
    val_path = experiment_dir / "val_metrics.csv"
    loss_path = experiment_dir / "train_losses.csv"
    if not val_path.exists() and not loss_path.exists():
        return
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    if loss_path.exists():
        losses = pd.read_csv(loss_path)
        fig, ax = plt.subplots(figsize=(12, 6))
        for tid, group in losses.groupby("task_id"):
            ax.plot(group["epoch"], group["mean"], label=tid, alpha=0.7)
        ax.set_xlabel("epoch")
        ax.set_ylabel("train loss")
        ax.legend(fontsize=6, ncol=3)
        ax.grid(alpha=0.3)
        fig.tight_layout()
        fig.savefig(experiment_dir / "comprehensive_curves_loss.png", dpi=120)
        plt.close(fig)

    if val_path.exists():
        val = pd.read_csv(val_path)
        metrics = sorted(val["metric"].unique())
        fig, axes = plt.subplots(1, max(1, len(metrics)),
                                 figsize=(5 * max(1, len(metrics)), 4),
                                 squeeze=False)
        for ax, metric in zip(axes[0], metrics):
            sub = val[val["metric"] == metric]
            for tid, group in sub.groupby("task_id"):
                ax.plot(group["epoch"], group["value"], label=tid, alpha=0.7)
            ax.set_title(metric)
            ax.set_xlabel("epoch")
            ax.grid(alpha=0.3)
            ax.legend(fontsize=6)
        fig.tight_layout()
        fig.savefig(experiment_dir / "comprehensive_curves_val.png", dpi=120)
        plt.close(fig)
