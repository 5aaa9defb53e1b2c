"""Loss functions for multi-task training.

Functional JAX re-implementations of the reference's loss surface
(code/losses/loss_functions.py): Dice (smp multiclass semantics), cross
entropy, CenterNet focal + masked L1, grid detection BCE + smooth-L1,
MSE/L1/SmoothL1 regression, Kendall-style adaptive uncertainty weighting.

All losses are pure functions of (predictions, targets[, params]) returning
scalars — directly differentiable and jit-safe. Per-type class-count padding
is handled via ``class_mask`` arguments (the banked-head design pads logits
to the per-type max class count; masked entries must not contribute).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp


# --------------------------------------------------------------------------
# Segmentation
# --------------------------------------------------------------------------
def dice_loss_multiclass(
    logits: jax.Array,
    targets: jax.Array,
    num_valid_classes: Optional[jax.Array] = None,
    smooth: float = 0.0,
    eps: float = 1e-7,
) -> jax.Array:
    """Multiclass soft Dice loss with smp.losses.DiceLoss semantics.

    (reference loss default, loss_functions.py:167-173): softmax probs,
    one-hot targets, per-class dice aggregated over (batch, pixels), classes
    absent from the target contribute 0, mean over classes.

    Args:
      logits: [B, H, W, C] (NHWC).
      targets: [B, H, W] int class ids.
      num_valid_classes: optional scalar — classes >= this are padding and
        are excluded from probs and the mean.
    """
    C = logits.shape[-1]
    class_ids = jnp.arange(C)
    if num_valid_classes is not None:
        valid = class_ids < num_valid_classes  # [C]
        logits = jnp.where(valid[None, None, None, :], logits, -1e30)
    else:
        valid = jnp.ones((C,), bool)

    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    onehot = jax.nn.one_hot(targets, C, dtype=jnp.float32)

    dims = (0, 1, 2)  # batch + spatial, keep class axis
    intersection = jnp.sum(probs * onehot, axis=dims)
    cardinality = jnp.sum(probs + onehot, axis=dims)
    dice = (2.0 * intersection + smooth) / jnp.maximum(
        cardinality + smooth, eps
    )
    loss = 1.0 - dice  # [C]
    present = jnp.sum(onehot, axis=dims) > 0
    keep = present & valid
    loss = jnp.where(keep, loss, 0.0)
    # smp averages over all (non-masked) classes including absent ones after
    # zeroing — i.e. mean over the class axis.
    denom = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)
    return jnp.sum(loss) / denom


def cross_entropy_loss(
    logits: jax.Array,
    targets: jax.Array,
    num_valid_classes: Optional[jax.Array] = None,
) -> jax.Array:
    """Mean cross entropy over all elements (torch nn.CrossEntropyLoss).

    Works for classification ([B, C] logits, [B] int targets) and
    segmentation ([B, H, W, C] logits, [B, H, W] targets). Padded classes
    (>= num_valid_classes) are masked to -inf before the log-softmax.
    """
    C = logits.shape[-1]
    if num_valid_classes is not None:
        valid = jnp.arange(C) < num_valid_classes
        logits = jnp.where(valid, logits, -1e30)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(
        logp, targets[..., None].astype(jnp.int32), axis=-1
    )[..., 0]
    return jnp.mean(nll)


# --------------------------------------------------------------------------
# Detection
# --------------------------------------------------------------------------
def centernet_focal_loss(
    logits: jax.Array,
    targets: jax.Array,
    alpha: float = 2.0,
    beta: float = 4.0,
) -> jax.Array:
    """CenterNet modified focal loss (reference loss_functions.py:124-150).

    pred = sigmoid(logits).clamp(1e-6, 1-1e-6);
    positives (target == 1): -(1-p)^alpha log(p)
    negatives: -(1-t)^beta p^alpha log(1-p); normalized by #positives.
    """
    x = logits.astype(jnp.float32)
    t = targets.astype(jnp.float32)
    pred = jnp.clip(jax.nn.sigmoid(x), 1e-6, 1.0 - 1e-6)
    pos_mask = (t == 1.0).astype(jnp.float32)
    neg_mask = (t < 1.0).astype(jnp.float32)
    neg_weights = jnp.power(1.0 - t, beta)

    pos_loss = -jnp.log(pred) * jnp.power(1.0 - pred, alpha) * pos_mask
    neg_loss = (
        -jnp.log(1.0 - pred) * jnp.power(pred, alpha) * neg_weights * neg_mask
    )
    num_pos = jnp.sum(pos_mask)
    total = jnp.sum(pos_loss) + jnp.sum(neg_loss)
    # if num_pos == 0 return neg_loss only (reference line 148-150)
    return jnp.where(num_pos > 0, total / jnp.maximum(num_pos, 1.0),
                     jnp.sum(neg_loss))


def centernet_loss(
    predictions: Dict[str, jax.Array],
    targets: Dict[str, jax.Array],
    heatmap_alpha: float = 2.0,
    heatmap_gamma: float = 4.0,
    size_weight: float = 1.0,
    offset_weight: float = 1.0,
) -> jax.Array:
    """Heatmap focal + masked L1 size/offset (reference loss_functions.py:56-99).

    predictions/targets: dicts with heatmap [B,H,W,1], size [B,H,W,2],
    offset [B,H,W,2]; targets additionally mask [B,H,W,1].
    """
    hm_loss = centernet_focal_loss(
        predictions["heatmap"], targets["heatmap"],
        alpha=heatmap_alpha, beta=heatmap_gamma,
    )
    mask = targets["mask"].astype(jnp.float32)
    msum = jnp.sum(mask)
    denom = msum + 1e-6

    def masked_l1(pred, tgt):
        return jnp.sum(jnp.abs(pred * mask - tgt * mask)) / denom

    size_loss = jnp.where(
        msum > 0,
        masked_l1(predictions["size"].astype(jnp.float32),
                  targets["size"].astype(jnp.float32)),
        0.0,
    )
    offset_loss = jnp.where(
        msum > 0,
        masked_l1(predictions["offset"].astype(jnp.float32),
                  targets["offset"].astype(jnp.float32)),
        0.0,
    )
    return hm_loss + size_weight * size_loss + offset_weight * offset_loss


def smooth_l1(x: jax.Array, beta: float = 1.0) -> jax.Array:
    ax = jnp.abs(x)
    return jnp.where(ax < beta, 0.5 * ax * ax / beta, ax - 0.5 * beta)


def focal_loss(logits: jax.Array, targets: jax.Array, alpha: float = 0.25,
               gamma: float = 2.0, reduction: str = "mean") -> jax.Array:
    """Standard binary focal loss (reference loss_functions.py:102-121 —
    exported there but unused in the training path; kept for API parity)."""
    x = logits.astype(jnp.float32)
    t = targets.astype(jnp.float32)
    bce = jnp.maximum(x, 0.0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x)))
    pt = jnp.exp(-bce)
    loss = alpha * jnp.power(1.0 - pt, gamma) * bce
    if reduction == "mean":
        return jnp.mean(loss)
    if reduction == "sum":
        return jnp.sum(loss)
    return loss


def giou_loss(preds: jax.Array, targets: jax.Array,
              eps: float = 1e-7) -> jax.Array:
    """Generalized IoU loss over corner boxes (reference heads.py:226-268,
    the DetectionHead's optional-but-untrained path). Accepts [..., 4]."""
    p = preds.astype(jnp.float32).reshape(-1, 4)
    t = targets.astype(jnp.float32).reshape(-1, 4)
    x1 = jnp.maximum(p[:, 0], t[:, 0])
    y1 = jnp.maximum(p[:, 1], t[:, 1])
    x2 = jnp.minimum(p[:, 2], t[:, 2])
    y2 = jnp.minimum(p[:, 3], t[:, 3])
    inter = jnp.clip(x2 - x1, 0) * jnp.clip(y2 - y1, 0)
    area_p = jnp.clip(p[:, 2] - p[:, 0], 0) * jnp.clip(p[:, 3] - p[:, 1], 0)
    area_t = jnp.clip(t[:, 2] - t[:, 0], 0) * jnp.clip(t[:, 3] - t[:, 1], 0)
    union = area_p + area_t - inter + eps
    iou = inter / union
    xc1 = jnp.minimum(p[:, 0], t[:, 0])
    yc1 = jnp.minimum(p[:, 1], t[:, 1])
    xc2 = jnp.maximum(p[:, 2], t[:, 2])
    yc2 = jnp.maximum(p[:, 3], t[:, 3])
    area_c = jnp.clip(xc2 - xc1, 0) * jnp.clip(yc2 - yc1, 0) + eps
    giou = iou - (area_c - union) / area_c
    return jnp.mean(1.0 - giou)


def detection_grid_loss(
    predictions: jax.Array,
    targets: jax.Array,
    classification_weight: float = 2.0,
    box_regression_weight: float = 1.0,
) -> jax.Array:
    """Grid-head detection loss (reference loss_functions.py:10-53).

    predictions/targets: [B, 5] = [bbox(4), objectness]; BCE-with-logits on
    objectness + smooth-L1 on bbox for positive samples only.
    """
    pred_bbox = predictions[:, :4].astype(jnp.float32)
    pred_obj = predictions[:, 4].astype(jnp.float32)
    tgt_bbox = targets[:, :4].astype(jnp.float32)
    tgt_obj = targets[:, 4].astype(jnp.float32)

    # binary_cross_entropy_with_logits, mean reduction
    cls_loss = jnp.mean(
        jnp.maximum(pred_obj, 0.0)
        - pred_obj * tgt_obj
        + jnp.log1p(jnp.exp(-jnp.abs(pred_obj)))
    )

    pos = tgt_obj > 0.5
    per_elem = smooth_l1(pred_bbox - tgt_bbox)  # [B, 4]
    pos_f = pos.astype(jnp.float32)[:, None]
    n_pos_elems = jnp.sum(pos_f) * 4.0
    box_loss = jnp.where(
        n_pos_elems > 0,
        jnp.sum(per_elem * pos_f) / jnp.maximum(n_pos_elems, 1.0),
        0.0,
    )
    return classification_weight * cls_loss + box_regression_weight * box_loss


# --------------------------------------------------------------------------
# Regression
# --------------------------------------------------------------------------
def _masked_col_mean(per_elem: jax.Array, num_valid_cols) -> jax.Array:
    """Mean over the first ``num_valid_cols`` trailing columns only.

    Banked regression heads pad outputs/labels to 2*Pmax columns across
    tasks; padded columns must not contribute to the loss (they carry
    arbitrary head outputs vs zero-padded labels)."""
    if num_valid_cols is None:
        return jnp.mean(per_elem)
    D = per_elem.shape[-1]
    mask = (jnp.arange(D) < num_valid_cols).astype(jnp.float32)
    denom = per_elem.shape[0] * jnp.maximum(
        num_valid_cols.astype(jnp.float32)
        if hasattr(num_valid_cols, "astype") else float(num_valid_cols),
        1.0)
    return jnp.sum(per_elem * mask) / denom


def mse_loss(pred: jax.Array, target: jax.Array,
             num_valid_cols=None) -> jax.Array:
    d = pred.astype(jnp.float32) - target.astype(jnp.float32)
    return _masked_col_mean(d * d, num_valid_cols)


def l1_loss(pred: jax.Array, target: jax.Array,
            num_valid_cols=None) -> jax.Array:
    d = jnp.abs(pred.astype(jnp.float32) - target.astype(jnp.float32))
    return _masked_col_mean(d, num_valid_cols)


def smooth_l1_loss(pred: jax.Array, target: jax.Array,
                   num_valid_cols=None) -> jax.Array:
    d = smooth_l1(pred.astype(jnp.float32) - target.astype(jnp.float32))
    return _masked_col_mean(d, num_valid_cols)


# --------------------------------------------------------------------------
# Adaptive uncertainty weighting (Kendall et al. 2018)
# --------------------------------------------------------------------------
def init_adaptive_log_vars(task_types, init_log_vars=0.0) -> Dict[str, jax.Array]:
    """Learnable log(sigma^2) per task type (reference loss_functions.py:209-237)."""
    if isinstance(init_log_vars, (int, float)):
        init_log_vars = [float(init_log_vars)] * len(task_types)
    return {
        t: jnp.asarray(v, jnp.float32)
        for t, v in zip(task_types, init_log_vars)
    }


def stable_log_var(log_var: jax.Array) -> jax.Array:
    """Smooth bound to [-3, 3] → sigma in [0.22, 4.48]
    (reference loss_functions.py:294-298)."""
    return 3.0 * jnp.tanh(log_var / 3.0)


def adaptive_weighted_loss(
    log_vars: Dict[str, jax.Array], losses: Dict[str, jax.Array]
) -> Tuple[jax.Array, Dict[str, jax.Array], Dict[str, jax.Array]]:
    """total = sum_t 0.5 e^{-logvar_t} L_t + 0.5 logvar_t
    (reference loss_functions.py:239-274). Returns (total, weighted, weights)."""
    total = jnp.asarray(0.0, jnp.float32)
    weighted, weights = {}, {}
    for name, loss in losses.items():
        loss = jnp.mean(loss)
        if name in log_vars:
            lv = stable_log_var(log_vars[name])
            precision = jnp.exp(-lv)
            wl = 0.5 * precision * loss + 0.5 * lv
            weights[name] = 0.5 * precision
        else:
            wl = loss
            weights[name] = jnp.asarray(1.0, jnp.float32)
        weighted[name] = wl
        total = total + wl
    return total, weighted, weights


def adaptive_sigmas(log_vars: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
    return {t: jnp.exp(0.5 * stable_log_var(v)) for t, v in log_vars.items()}


def adaptive_weights(log_vars: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
    return {t: 0.5 * jnp.exp(-stable_log_var(v)) for t, v in log_vars.items()}


# --------------------------------------------------------------------------
# Dispatch (reference loss_functions.py:153-206 / 301-363)
# --------------------------------------------------------------------------
def build_loss_fn(task_name: str, loss_config: Dict):
    """Return a pure loss fn for a task type, configured like the reference."""
    loss_type = str(loss_config.get("type", ""))

    if task_name == "segmentation":
        if loss_type == "CrossEntropyLoss":
            return cross_entropy_loss
        # DiceLoss default (multiclass)
        def seg_loss(logits, targets, num_valid_classes=None):
            return dice_loss_multiclass(
                logits, targets, num_valid_classes=num_valid_classes
            )
        return seg_loss

    if task_name == "classification":
        return cross_entropy_loss

    if task_name == "detection":
        if loss_type.lower() in ("centernet", ""):
            ha = float(loss_config.get("heatmap_alpha", 2.0))
            hg = float(loss_config.get("heatmap_gamma", 4.0))
            sw = float(loss_config.get("size_weight", 1.0))
            ow = float(loss_config.get("offset_weight", 1.0))
            def det_loss(predictions, targets):
                return centernet_loss(
                    predictions, targets, heatmap_alpha=ha, heatmap_gamma=hg,
                    size_weight=sw, offset_weight=ow,
                )
            return det_loss
        cw = float(loss_config.get("classification_weight", 2.0))
        bw = float(loss_config.get("box_regression_weight", 1.0))
        def grid_loss(predictions, targets):
            return detection_grid_loss(
                predictions, targets,
                classification_weight=cw, box_regression_weight=bw,
            )
        return grid_loss

    if task_name == "Regression":
        if loss_type == "L1Loss":
            return l1_loss
        if loss_type == "SmoothL1Loss":
            return smooth_l1_loss
        return mse_loss

    raise ValueError(f"Unknown task name: {task_name}")


def build_all_losses(config, task_registry):
    """Build per-task-type losses + weights (reference loss_functions.py:301-363).

    Returns (loss_fns: dict[type], loss_weights: dict[type] | None,
    adaptive_log_vars: dict | None). When adaptive weighting is enabled the
    log-vars pytree is returned for inclusion in the trainable params.
    """
    task_names = task_registry.present_types()
    loss_fns = {t: build_loss_fn(t, config.get_loss_config(t)) for t in task_names}

    if config.get("training.adaptive_loss.enabled", False):
        per_task = config.get("training.adaptive_loss.init_log_vars_per_task")
        if per_task:
            init = [float(per_task.get(t, 0.0)) for t in task_names]
        else:
            init = float(config.get("training.adaptive_loss.init_log_vars", 0.0))
        return loss_fns, None, init_adaptive_log_vars(task_names, init)

    weights = {
        k: float(v)
        for k, v in (config.get("training.loss_weights", {}) or {}).items()
    }
    return loss_fns, weights, None
