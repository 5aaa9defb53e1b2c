"""Metrics and the evaluation loop.

Re-implements the reference metric surface (reference metrics/__init__.py):
accuracy + macro-F1 (classification), foreground Dice (segmentation),
pixel MAE (Regression, denormalized by the reference's fixed 224x224
default — metrics/__init__.py:40, called without image_size at :121),
corner-IoU (detection with CenterNet peak decode or grid argmax decode).

Device/host split: each compiled eval step returns small per-batch
sufficient statistics (argmax preds, dice sums, decoded boxes); the host
computes sklearn-parity accuracy/macro-F1 and aggregates per-task means over
batches exactly like the reference's defaultdict-of-lists loop
(metrics/__init__.py:86-184).
"""

from __future__ import annotations

import functools
from collections import defaultdict
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from fmc_uia_tpu.ops.centernet import decode_centernet, decode_grid_detection
from fmc_uia_tpu.ops.image import normalize_images
from fmc_uia_tpu.tasks import (
    CLASSIFICATION,
    DETECTION,
    REGRESSION,
    SEGMENTATION,
    TaskRegistry,
)

MAE_DENORM_SIZE = (224, 224)  # reference default, metrics/__init__.py:40


# --------------------------------------------------------------------------
# device-side per-batch statistics
# --------------------------------------------------------------------------
def masked_argmax(logits: jax.Array, num_valid_classes: jax.Array) -> jax.Array:
    """Argmax over the first num_valid_classes logits (padding masked)."""
    C = logits.shape[-1]
    valid = jnp.arange(C) < num_valid_classes
    return jnp.argmax(jnp.where(valid, logits, -jnp.inf), axis=-1)


def dice_coefficient(labels: jax.Array, logits: jax.Array,
                     num_valid_classes: Optional[jax.Array] = None,
                     sample_mask: Optional[jax.Array] = None) -> jax.Array:
    """Foreground Dice over the whole batch (reference metrics 28-37):
    one-hot both, drop class 0, single ratio over all foreground classes.

    ``sample_mask`` [B] zeroes padded samples' contributions to both the
    intersection and union sums."""
    C = logits.shape[-1]
    if num_valid_classes is not None:
        valid = jnp.arange(C) < num_valid_classes
        logits = jnp.where(valid, logits, -jnp.inf)
    pred = jnp.argmax(logits, axis=-1)
    t = jax.nn.one_hot(labels, C, dtype=jnp.float32)[..., 1:]
    p = jax.nn.one_hot(pred, C, dtype=jnp.float32)[..., 1:]
    if sample_mask is not None:
        m = sample_mask.astype(jnp.float32).reshape(
            (-1,) + (1,) * (t.ndim - 1))
        t = t * m
        p = p * m
    inter = jnp.sum(t * p)
    union = jnp.sum(t) + jnp.sum(p)
    return (2.0 * inter + 1e-6) / (union + 1e-6)


def mae_pixels(labels: jax.Array, preds: jax.Array,
               image_size=MAE_DENORM_SIZE,
               num_valid_cols=None,
               sample_mask: Optional[jax.Array] = None) -> jax.Array:
    """Mean absolute error in pixels (reference metrics 40-49).

    ``num_valid_cols`` masks padded point columns (banked heads pad to
    2*Pmax across regression tasks); ``sample_mask`` [B] masks padded
    samples in fixed-shape eval batches."""
    h, w = image_size
    D = labels.shape[-1]
    scale = jnp.where(jnp.arange(D) % 2 == 0, w, h)
    err = jnp.abs(labels * scale - preds * scale)
    if num_valid_cols is None and sample_mask is None:
        return jnp.mean(err)
    col_mask = jnp.ones((D,), jnp.float32)
    n_cols = jnp.asarray(D, jnp.float32)
    if num_valid_cols is not None:
        col_mask = (jnp.arange(D) < num_valid_cols).astype(jnp.float32)
        n_cols = jnp.maximum(jnp.asarray(num_valid_cols, jnp.float32), 1.0)
    row_mask = jnp.ones((err.shape[0],), jnp.float32)
    n_rows = jnp.asarray(err.shape[0], jnp.float32)
    if sample_mask is not None:
        row_mask = sample_mask.astype(jnp.float32)
        n_rows = jnp.maximum(jnp.sum(row_mask), 1.0)
    return jnp.sum(err * col_mask * row_mask[:, None]) / (n_rows * n_cols)


def batch_iou(boxes_a: jax.Array, boxes_b: jax.Array) -> jax.Array:
    """Per-sample corner IoU [B] (reference metrics 52-69)."""
    xa = jnp.maximum(boxes_a[:, 0], boxes_b[:, 0])
    ya = jnp.maximum(boxes_a[:, 1], boxes_b[:, 1])
    xb = jnp.minimum(boxes_a[:, 2], boxes_b[:, 2])
    yb = jnp.minimum(boxes_a[:, 3], boxes_b[:, 3])
    inter = jnp.maximum(0.0, xb - xa) * jnp.maximum(0.0, yb - ya)
    area_a = (boxes_a[:, 2] - boxes_a[:, 0]) * (boxes_a[:, 3] - boxes_a[:, 1])
    area_b = (boxes_b[:, 2] - boxes_b[:, 0]) * (boxes_b[:, 3] - boxes_b[:, 1])
    return inter / (area_a + area_b - inter + 1e-6)


# --------------------------------------------------------------------------
# host-side sklearn-parity metrics
# --------------------------------------------------------------------------
def accuracy_score_host(y_true: np.ndarray, y_pred: np.ndarray) -> float:
    return float(np.mean(y_true == y_pred))


def macro_f1_host(y_true: np.ndarray, y_pred: np.ndarray) -> float:
    try:
        from sklearn.metrics import f1_score

        return float(f1_score(y_true, y_pred, average="macro",
                              zero_division=0))
    except Exception:  # pragma: no cover - sklearn always present here
        classes = np.unique(np.concatenate([y_true, y_pred]))
        f1s = []
        for c in classes:
            tp = np.sum((y_pred == c) & (y_true == c))
            fp = np.sum((y_pred == c) & (y_true != c))
            fn = np.sum((y_pred != c) & (y_true == c))
            prec = tp / (tp + fp) if tp + fp else 0.0
            rec = tp / (tp + fn) if tp + fn else 0.0
            f1s.append(2 * prec * rec / (prec + rec) if prec + rec else 0.0)
        return float(np.mean(f1s))


# --------------------------------------------------------------------------
# evaluation loop
# --------------------------------------------------------------------------
def make_eval_steps(model, variables_treedef_params, registry: TaskRegistry,
                    mean, std, detection_is_centernet: bool = True,
                    prep=None):
    """Build one jitted eval step per present task type.

    Each step: normalize (or custom ``prep``) -> forward (eval mode) ->
    per-batch stats.
    """
    nc_table = jnp.asarray(registry.num_classes_table)

    if prep is not None:
        _prep = prep
    else:
        def _prep(images):
            return normalize_images(images, mean, std, dtype=jnp.float32)

    @functools.partial(jax.jit, static_argnames=())
    def seg_step(params, images, labels, task_index, valid):
        out = model.apply({"params": params}, _prep(images), SEGMENTATION,
                          task_index, train=False)
        if isinstance(out, tuple):  # deep supervision: main only
            out = out[0]
        ncls = jnp.take(nc_table, task_index)
        return {"dice": dice_coefficient(labels, out, ncls,
                                         sample_mask=valid)}

    @jax.jit
    def cls_step(params, images, labels, task_index, valid):
        out = model.apply({"params": params}, _prep(images), CLASSIFICATION,
                          task_index, train=False)
        ncls = jnp.take(nc_table, task_index)
        return {"preds": masked_argmax(out, ncls), "labels": labels}

    @jax.jit
    def det_step(params, images, labels, task_index, valid):
        out = model.apply({"params": params}, _prep(images), DETECTION,
                          task_index, train=False)
        if isinstance(out, dict):
            boxes = decode_centernet(
                out["heatmap"].astype(jnp.float32),
                out["size"].astype(jnp.float32),
                out["offset"].astype(jnp.float32))
        else:
            boxes = decode_grid_detection(out.astype(jnp.float32))
        valid_gt = jnp.all(labels >= 0, axis=1) & valid
        ious = batch_iou(labels, boxes)
        n_valid = jnp.sum(valid_gt.astype(jnp.float32))
        mean_iou = jnp.sum(jnp.where(valid_gt, ious, 0.0)) / jnp.maximum(
            n_valid, 1.0)
        return {"iou": mean_iou, "n_valid": n_valid, "boxes": boxes}

    @jax.jit
    def reg_step(params, images, labels, task_index, valid):
        out = model.apply({"params": params}, _prep(images), REGRESSION,
                          task_index, train=False)
        ncls = jnp.take(nc_table, task_index)
        return {"mae": mae_pixels(labels, out, num_valid_cols=2 * ncls,
                                  sample_mask=valid),
                "preds": out}

    return {
        SEGMENTATION: seg_step,
        CLASSIFICATION: cls_step,
        DETECTION: det_step,
        REGRESSION: reg_step,
    }


def evaluate(model, params, val_engine, registry: TaskRegistry, mean, std,
             prep=None) -> pd.DataFrame:
    """Validation loop -> per-task metric DataFrame
    (reference evaluate(), metrics/__init__.py:72-184)."""
    steps = make_eval_steps(model, None, registry, mean, std, prep=prep)
    task_metrics: Dict[str, Dict[str, list]] = defaultdict(
        lambda: defaultdict(list))

    # dispatch all batches first, materialize device stats in bulk — a
    # float()/np.asarray() per batch would sync the pipeline per batch
    # (same deferral as fit._train_epoch, PERF.md r2-26)
    pending = []  # (tid, ttype, valid_np, device stats)
    for batch in val_engine:
        images = jnp.asarray(batch["image"])
        labels = jnp.asarray(batch["label"])
        if labels.dtype == jnp.uint8:  # wire-narrowed seg masks -> int32
            labels = labels.astype(jnp.int32)
        tindex = jnp.int32(batch["task_index"])
        valid_np = np.asarray(batch.get(
            "valid", np.ones((images.shape[0],), bool)))
        stats = steps[batch["task_type"]](params, images, labels, tindex,
                                          jnp.asarray(valid_np))
        pending.append((batch["task_id"], batch["task_type"], valid_np,
                        stats))
        if len(pending) % 32 == 0:
            # backpressure: bound in-flight input buffers (~19 MB each at
            # 512^2) without serializing every batch
            jax.block_until_ready(stats[next(iter(stats))])

    fetched = jax.device_get([p[3] for p in pending])
    for (tid, ttype, valid_np, _), stats in zip(pending, fetched):
        if ttype == CLASSIFICATION:
            y_pred = np.asarray(stats["preds"])[valid_np]
            y_true = np.asarray(stats["labels"])[valid_np]
            task_metrics[tid]["Accuracy"].append(
                accuracy_score_host(y_true, y_pred))
            task_metrics[tid]["F1-Score"].append(
                macro_f1_host(y_true, y_pred))
        elif ttype == SEGMENTATION:
            task_metrics[tid]["Dice"].append(float(stats["dice"]))
        elif ttype == REGRESSION:
            task_metrics[tid]["MAE (pixels)"].append(float(stats["mae"]))
        elif ttype == DETECTION:
            if float(stats["n_valid"]) > 0:
                task_metrics[tid]["IoU"].append(float(stats["iou"]))

    rows = []
    for tid in sorted(registry.task_ids):
        if tid not in task_metrics:
            continue
        row = {"Task ID": tid, "Task Name": registry[tid].task_name}
        for name, values in task_metrics[tid].items():
            row[name] = float(np.mean(values))
        rows.append(row)
    return pd.DataFrame(rows)


def average_validation_score(val_df: pd.DataFrame,
                             mae_upper: float = 100.0,
                             mae_lower: float = 0.0) -> float:
    """Scalar model-selection score (reference train.py:607-638):
    cls (Acc+F1)/2, seg Dice, det IoU, Regression (100-MAE)/100 clipped."""
    if val_df.empty:
        return 0.0
    scores = []
    for _, row in val_df.iterrows():
        name = row["Task Name"]
        if name == CLASSIFICATION:
            vals = [row.get(k) for k in ("Accuracy", "F1-Score")]
            vals = [v for v in vals if v is not None and not pd.isna(v)]
            if vals:
                scores.append(float(np.mean(vals)))
        elif name == SEGMENTATION:
            v = row.get("Dice")
            if v is not None and not pd.isna(v):
                scores.append(float(v))
        elif name == DETECTION:
            v = row.get("IoU")
            if v is not None and not pd.isna(v):
                scores.append(float(v))
        elif name == REGRESSION:
            v = row.get("MAE (pixels)")
            if v is not None and not pd.isna(v):
                norm = (mae_upper - float(v)) / (mae_upper - mae_lower)
                scores.append(float(np.clip(norm, 0.0, 1.0)))
    return float(np.mean(scores)) if scores else 0.0
