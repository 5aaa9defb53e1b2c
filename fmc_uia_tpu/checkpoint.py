"""Checkpointing with Orbax: save AND resume.

The reference is save-only — best model as a raw state_dict plus periodic
full checkpoints, with no resume path (reference train.py:692-727; SURVEY.md
§5). Here both directions exist:

  * ``save_checkpoint`` persists the full train state (params + optimizer
    moments + adaptive log-vars), epoch, best score, and the config snapshot.
  * ``restore_checkpoint`` restores into a like-structured state and the fit
    loop continues from the saved epoch.
  * ``save_best_params`` / ``load_best_params`` mirror the reference's
    best-model state_dict file.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, Optional, Tuple

import jax
import orbax.checkpoint as ocp


def _checkpointer():
    return ocp.StandardCheckpointer()


def save_checkpoint(ckpt_dir, state, epoch: int, best_score: float,
                    config_dict: Dict) -> Path:
    """Full-train-state checkpoint (reference checkpoint dict train.py:714-725
    plus optimizer/adaptive state, here actually restorable)."""
    ckpt_dir = Path(ckpt_dir).resolve()
    path = ckpt_dir / f"checkpoint_epoch_{epoch}"
    with _checkpointer() as ckptr:
        ckptr.save(path, state, force=True)
    meta = {"epoch": int(epoch), "best_score": float(best_score)}
    with open(ckpt_dir / f"checkpoint_epoch_{epoch}.meta.json", "w") as f:
        json.dump(meta, f)
    import yaml

    with open(ckpt_dir / f"checkpoint_epoch_{epoch}.config.yaml", "w") as f:
        yaml.dump(config_dict, f)
    return path


def latest_checkpoint(ckpt_dir) -> Optional[Tuple[Path, Dict]]:
    """Newest checkpoint under ``ckpt_dir`` — searched directly AND one
    level down (fit() writes into timestamped experiment subdirs, so
    resume is typically given the experiment's parent output_dir)."""
    ckpt_dir = Path(ckpt_dir)
    if not ckpt_dir.exists():
        return None
    best, best_epoch, best_mtime = None, -1, -1.0
    metas = list(ckpt_dir.glob("checkpoint_epoch_*.meta.json")) + list(
        ckpt_dir.glob("*/checkpoint_epoch_*.meta.json"))
    for meta_file in metas:
        with open(meta_file) as f:
            meta = json.load(f)
        path = meta_file.parent / f"checkpoint_epoch_{meta['epoch']}"
        if not path.exists():
            continue
        mtime = meta_file.stat().st_mtime
        if (meta["epoch"], mtime) > (best_epoch, best_mtime):
            best = (path, meta)
            best_epoch, best_mtime = meta["epoch"], mtime
    return best


def restore_checkpoint(path, abstract_state):
    """Restore into the structure of ``abstract_state`` (a live TrainState)."""
    path = Path(path).resolve()
    abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct,
                                      abstract_state)
    with _checkpointer() as ckptr:
        return ckptr.restore(path, abstract)


def save_best_params(ckpt_dir, params) -> Path:
    """Best-model params only (reference best_model.pth, train.py:695)."""
    path = Path(ckpt_dir).resolve() / "best_model"
    with _checkpointer() as ckptr:
        ckptr.save(path, params, force=True)
    return path


def load_best_params(ckpt_dir, abstract_params):
    path = Path(ckpt_dir).resolve() / "best_model"
    abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct,
                                      abstract_params)
    with _checkpointer() as ckptr:
        return ckptr.restore(path, abstract)
