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
    def __init__(self, log_dir, experiment_name: str, existing_dir=None):
        """``existing_dir``: attach to a previous run's experiment dir
        instead of creating a fresh timestamped one — used by --resume so
        history/best_model/checkpoints stay in one place (the reference has
        no resume at all, SURVEY §5; continuing the dir is the natural
        extension of its per-run-dir contract)."""
        if existing_dir is not None:
            self.experiment_dir = Path(existing_dir)
        else:
            timestamp = time.strftime("%Y%m%d_%H%M%S")
            self.experiment_dir = (Path(log_dir)
                                   / f"{experiment_name}_{timestamp}")
        self.experiment_dir.mkdir(parents=True, exist_ok=True)
        self.experiment_name = experiment_name
        self.history: List[Dict] = []
        hist_file = self.experiment_dir / "training_history.json"
        if existing_dir is not None and hist_file.exists():
            with open(hist_file) as f:
                self.history = json.load(f)

    def truncate_history(self, max_epoch: int) -> None:
        """Drop entries beyond ``max_epoch`` (1-based) — resume redoes any
        interrupted epoch, so its stale entry must not survive."""
        self.history = [e for e in self.history
                        if int(e.get("epoch", 0)) <= max_epoch]

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
        """best_model_summary.txt: latest-epoch per-task metrics, group
        mean primary metrics, and the best-model train-set evaluation
        (reference logger.py:297-425 layout)."""
        lines: List[str] = []
        last = self.history[-1] if self.history else None
        if last is not None:
            lines.append(f"Validation Summary - Best Epoch {last['epoch']}")
            lines.append(
                f"Timestamp: {time.strftime('%Y-%m-%d %H:%M:%S')}")
            lines.append("")
            lines.append("Per-task validation metrics of Best Epoch:")
            lines.append("")
            group_vals: Dict[str, List[float]] = {
                "segmentation": [], "detection": [], "regression": []}
            cls_vals: Dict[str, List[float]] = {"Accuracy": [],
                                                "F1-Score": []}
            for rec in sorted(last.get("val_metrics", []),
                              key=lambda r: str(r.get("Task ID", ""))):
                tid = rec.get("Task ID", "")
                tname = str(rec.get("Task Name", ""))
                parts = []
                metrics = {k: v for k, v in rec.items()
                           if k not in ("Task ID", "Task Name")}
                for k, v in metrics.items():
                    if v is None or (isinstance(v, float) and np.isnan(v)):
                        continue
                    parts.append(f"{k}: {float(v):.4f}")
                lines.append(f"  - Task {tid} | {tname} -> "
                             + ", ".join(parts))
                tn = tname.lower()
                if "classification" in tn:
                    for m in ("Accuracy", "F1-Score"):
                        v = metrics.get(m)
                        if v is not None and not (isinstance(v, float)
                                                  and np.isnan(v)):
                            cls_vals[m].append(float(v))
                else:
                    primary = None
                    if "segmentation" in tn:
                        primary = metrics.get("Dice", metrics.get("IoU"))
                        g = "segmentation"
                    elif "detection" in tn:
                        primary = metrics.get("IoU")
                        g = "detection"
                    elif "regression" in tn:
                        primary = metrics.get(
                            "MAE", metrics.get("MAE (pixels)"))
                        g = "regression"
                    else:
                        g = None
                    if g and primary is not None and not (
                            isinstance(primary, float)
                            and np.isnan(primary)):
                        group_vals[g].append(float(primary))
            lines.append("")
            lines.append("Group mean primary metrics:")
            for m in ("Accuracy", "F1-Score"):
                vals = cls_vals[m]
                lines.append(
                    f"  - Classification {m}: "
                    + (f"{float(np.mean(vals)):.4f} (mean over "
                       f"{len(vals)} task(s))" if vals
                       else "N/A (no tasks found)"))
            for g in ("segmentation", "detection", "regression"):
                vals = group_vals[g]
                lines.append(
                    f"  - {g.title()}: "
                    + (f"{float(np.mean(vals)):.4f} (mean over "
                       f"{len(vals)} task(s))" if vals
                       else "N/A (no tasks found)"))

        if eval_on_train:
            lines.append("")
            lines.append("Best Model Evaluation on Training Set:")
            for group, value in eval_on_train.items():
                if isinstance(value, dict):
                    acc = value.get("Accuracy")
                    f1 = value.get("F1-Score")
                    acc_s = f"{acc:.4f}" if acc is not None else "N/A"
                    f1_s = f"{f1:.4f}" if f1 is not None else "N/A"
                    lines.append(f"  - {group.title()}: Accuracy={acc_s}, "
                                 f"F1-Score={f1_s}")
                elif value is not None:
                    lines.append(f"  - {group.title()}: {value:.4f}")
                else:
                    lines.append(f"  - {group.title()}: N/A")
        if not lines:
            lines = ["(no evaluation available)"]
        with open(self.experiment_dir / "best_model_summary.txt", "w",
                  encoding="utf-8") as f:
            f.write("\n".join(lines) + "\n")

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


_GROUPS = ("classification", "segmentation", "detection", "regression")
_GROUP_COLORS = {"classification": "#1f77b4", "segmentation": "#ff7f0e",
                 "detection": "#2ca02c", "regression": "#d62728"}
_AVG_COLOR = "#9467bd"
_PRIMARY_METRICS = {  # per-group primary validation metric
    "classification": ("Accuracy", "F1-Score"),
    "segmentation": ("Dice", "IoU"),
    "detection": ("IoU",),
    "regression": ("MAE (pixels)", "MAE"),
}


def _group_of(task_name: str) -> Optional[str]:
    tn = str(task_name).lower()
    for g in _GROUPS:
        if g in tn:
            return g
    return None


def plot_comprehensive_training_curves(experiment_dir) -> None:
    """Three per-group figures (reference logger.py:579-928 artifact set):

      training_loss_per_task.png        2x3: loss per group + average
      validation_metrics_per_task.png   2x3: primary metric per group + avg
      training_summary_comprehensive.png 2x2: combined train/val/lr/time
    """
    experiment_dir = Path(experiment_dir)
    val_path = experiment_dir / "val_metrics.csv"
    loss_path = experiment_dir / "train_losses.csv"
    summary_path = experiment_dir / "training_summary.csv"
    if not loss_path.exists():
        return
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    losses = pd.read_csv(loss_path)
    val = pd.read_csv(val_path) if val_path.exists() else pd.DataFrame()
    summary = (pd.read_csv(summary_path) if summary_path.exists()
               else pd.DataFrame())

    # task_id -> group via the val table's task_name column
    tid_group = {}
    if not val.empty:
        for _, row in val[["task_id", "task_name"]].drop_duplicates(
                ).iterrows():
            tid_group[row["task_id"]] = _group_of(row["task_name"])

    # per-group mean train loss by epoch
    losses = losses.assign(group=losses["task_id"].map(tid_group))
    group_loss = {
        g: losses[losses["group"] == g].groupby("epoch")["mean"].mean()
        for g in _GROUPS
    }
    avg_loss = losses.groupby("epoch")["mean"].mean()

    # ---- figure 1: training loss per group + average -------------------
    fig, axes = plt.subplots(2, 3, figsize=(18, 10))
    fig.suptitle("Training Loss - Per Group & Average", fontsize=16,
                 fontweight="bold")
    panels = list(_GROUPS) + ["average", "all"]
    for ax, panel in zip(axes.flat, panels):
        if panel == "average":
            ax.plot(avg_loss.index, avg_loss.values, color=_AVG_COLOR,
                    marker="s", markersize=3)
            ax.set_title("Average (all tasks)")
        elif panel == "all":
            for g in _GROUPS:
                s = group_loss[g]
                if len(s):
                    ax.plot(s.index, s.values, color=_GROUP_COLORS[g],
                            label=g.title(), alpha=0.8)
            ax.plot(avg_loss.index, avg_loss.values, color=_AVG_COLOR,
                    linestyle="--", label="Average")
            ax.legend(fontsize=8)
            ax.set_title("All groups")
        else:
            s = group_loss[panel]
            if len(s):
                ax.plot(s.index, s.values, color=_GROUP_COLORS[panel],
                        marker="o", markersize=3)
            ax.set_title(panel.title())
        ax.set_xlabel("epoch")
        ax.set_ylabel("train loss")
        ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(experiment_dir / "training_loss_per_task.png", dpi=150,
                bbox_inches="tight")
    plt.close(fig)

    # ---- figure 2: validation primary metric per group + average -------
    if not val.empty:
        val = val.assign(group=val["task_name"].map(_group_of))

    def primary_series(g):
        if val.empty:
            return pd.Series(dtype=float)
        keys = _PRIMARY_METRICS[g]
        sub = val[(val["group"] == g) & (val["metric"].isin(keys))]
        return sub.groupby("epoch")["value"].mean()

    if not val.empty:
        fig, axes = plt.subplots(2, 3, figsize=(18, 10))
        fig.suptitle("Validation Metrics - Per Group & Average",
                     fontsize=16, fontweight="bold")
        series = {g: primary_series(g) for g in _GROUPS}
        # overall average excludes regression MAE (different scale)
        score_like = val[val["metric"] != "MAE (pixels)"]
        avg_val = score_like.groupby("epoch")["value"].mean()
        for ax, panel in zip(axes.flat, panels):
            if panel == "average":
                ax.plot(avg_val.index, avg_val.values, color=_AVG_COLOR,
                        marker="s", markersize=3)
                ax.set_title("Average (score metrics)")
            elif panel == "all":
                for g in _GROUPS:
                    s = series[g]
                    if len(s):
                        ax.plot(s.index, s.values,
                                color=_GROUP_COLORS[g], label=g.title(),
                                alpha=0.8)
                ax.legend(fontsize=8)
                ax.set_title("All groups (primary metric)")
            else:
                s = series[panel]
                if len(s):
                    ax.plot(s.index, s.values,
                            color=_GROUP_COLORS[panel], marker="o",
                            markersize=3)
                ax.set_title(f"{panel.title()} "
                             f"({_PRIMARY_METRICS[panel][0]})")
            ax.set_xlabel("epoch")
            ax.grid(alpha=0.3)
        fig.tight_layout()
        fig.savefig(experiment_dir / "validation_metrics_per_task.png",
                    dpi=150, bbox_inches="tight")
        plt.close(fig)

    # ---- figure 3: combined summary ------------------------------------
    fig, axes = plt.subplots(2, 2, figsize=(14, 10))
    fig.suptitle("Training & Validation Summary - All Tasks", fontsize=16,
                 fontweight="bold")
    ax = axes[0, 0]
    for g in _GROUPS:
        s = group_loss[g]
        if len(s):
            ax.plot(s.index, s.values, color=_GROUP_COLORS[g],
                    label=g.title(), marker="o", markersize=3, alpha=0.7)
    ax.plot(avg_loss.index, avg_loss.values, color=_AVG_COLOR,
            linestyle="--", linewidth=2.5, label="Average")
    ax.set_title("Training loss by group")
    ax.legend(fontsize=8)

    ax = axes[0, 1]
    if not val.empty:
        for g in _GROUPS:
            s = primary_series(g)
            if len(s):
                ax.plot(s.index, s.values, color=_GROUP_COLORS[g],
                        label=g.title(), marker="o", markersize=3,
                        alpha=0.7)
        ax.legend(fontsize=8)
    ax.set_title("Validation primary metric by group")

    ax = axes[1, 0]
    for tid, grp in losses.groupby("task_id"):
        ax.plot(grp["epoch"], grp["mean"], alpha=0.6, linewidth=1,
                label=tid)
    ax.legend(fontsize=5, ncol=3)
    ax.set_title("Training loss per task")

    ax = axes[1, 1]
    if not summary.empty:
        line1 = ax.plot(summary["epoch"], summary["learning_rate"],
                        color="#17becf", marker="o", markersize=3,
                        label="Learning Rate")
        ax.set_yscale("log")
        ax.set_ylabel("Learning rate", color="#17becf")
        ax2 = ax.twinx()
        line2 = ax2.plot(summary["epoch"], summary["epoch_time"],
                         color="#bcbd22", marker="^", markersize=3,
                         label="Epoch Time")
        ax2.set_ylabel("Epoch time (s)", color="#bcbd22")
        lines = line1 + line2
        ax.legend(lines, [ln.get_label() for ln in lines], fontsize=8)
    ax.set_title("Learning Rate & Training Time")
    for ax in axes.flat:
        ax.set_xlabel("epoch")
        ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(experiment_dir / "training_summary_comprehensive.png",
                dpi=150, bbox_inches="tight")
    plt.close(fig)
