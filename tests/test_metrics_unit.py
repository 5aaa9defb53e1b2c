"""Direct metric-function parity tests (reference metrics/__init__.py)."""

import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest

from fmc_uia_tpu.metrics import (
    average_validation_score,
    batch_iou,
    dice_coefficient,
    mae_pixels,
    macro_f1_host,
    masked_argmax,
)


def test_masked_argmax_ignores_padding():
    logits = jnp.asarray([[0.1, 0.2, 0.9, 5.0],  # class 3 is padding
                          [2.0, 0.1, 0.0, 9.0]])
    preds = np.asarray(masked_argmax(logits, jnp.int32(3)))
    np.testing.assert_array_equal(preds, [2, 0])


def test_dice_coefficient_batch_aggregate():
    """Reference aggregates intersection/union over the WHOLE batch before
    the ratio (metrics/__init__.py:28-37) — not per-sample mean."""
    # sample 0: perfect; sample 1: empty prediction of a nonempty target
    labels = np.zeros((2, 4, 4), np.int32)
    labels[0, :2] = 1
    labels[1, 2:] = 1
    logits = np.full((2, 4, 4, 2), -5.0, np.float32)
    logits[0, :2, :, 1] = 5.0   # predict fg exactly for sample 0
    logits[0, 2:, :, 0] = 5.0
    logits[1, :, :, 0] = 5.0    # predict all bg for sample 1
    got = float(dice_coefficient(jnp.asarray(labels), jnp.asarray(logits)))
    # batch-aggregate: inter=8, t_sum=16, p_sum=8 -> 2*8/24
    assert got == pytest.approx(2 * 8 / 24, rel=1e-4)


def test_mae_pixels_fixed_224_denorm():
    labels = jnp.asarray([[0.5, 0.5, 0.0, 1.0]])
    preds = jnp.asarray([[0.5, 0.5, 0.5, 0.5]])
    got = float(mae_pixels(labels, preds))
    # x-diffs scale by 224 (w), y-diffs by 224 (h): |0-0.5|*224, |1-0.5|*224
    assert got == pytest.approx((0 + 0 + 112 + 112) / 4, rel=1e-5)


def test_batch_iou_against_loop():
    rng = np.random.RandomState(0)
    a = np.sort(rng.rand(8, 2, 2), axis=1).transpose(0, 2, 1).reshape(8, 4)
    a = a[:, [0, 2, 1, 3]]  # x1,y1,x2,y2
    b = np.sort(rng.rand(8, 2, 2), axis=1).transpose(0, 2, 1).reshape(8, 4)
    b = b[:, [0, 2, 1, 3]]
    got = np.asarray(batch_iou(jnp.asarray(a), jnp.asarray(b)))
    for i in range(8):
        xa, ya = max(a[i, 0], b[i, 0]), max(a[i, 1], b[i, 1])
        xb, yb = min(a[i, 2], b[i, 2]), min(a[i, 3], b[i, 3])
        inter = max(0, xb - xa) * max(0, yb - ya)
        ua = (a[i, 2] - a[i, 0]) * (a[i, 3] - a[i, 1])
        ub = (b[i, 2] - b[i, 0]) * (b[i, 3] - b[i, 1])
        ref = inter / (ua + ub - inter + 1e-6)
        assert got[i] == pytest.approx(ref, rel=1e-4)


def test_macro_f1_matches_sklearn():
    from sklearn.metrics import f1_score

    rng = np.random.RandomState(1)
    y_true = rng.randint(0, 3, 50)
    y_pred = rng.randint(0, 3, 50)
    assert macro_f1_host(y_true, y_pred) == pytest.approx(
        f1_score(y_true, y_pred, average="macro", zero_division=0))


def test_average_validation_score_formula():
    df = pd.DataFrame([
        {"Task ID": "a", "Task Name": "classification",
          "Accuracy": 0.8, "F1-Score": 0.6},
        {"Task ID": "b", "Task Name": "segmentation", "Dice": 0.7},
        {"Task ID": "c", "Task Name": "detection", "IoU": 0.5},
        {"Task ID": "d", "Task Name": "Regression", "MAE (pixels)": 25.0},
    ])
    got = average_validation_score(df)
    expected = np.mean([(0.8 + 0.6) / 2, 0.7, 0.5, (100 - 25) / 100])
    assert got == pytest.approx(expected, rel=1e-6)
    # MAE above the bound clips to 0
    df2 = pd.DataFrame([{"Task ID": "d", "Task Name": "Regression",
                          "MAE (pixels)": 150.0}])
    assert average_validation_score(df2) == 0.0
    assert average_validation_score(pd.DataFrame()) == 0.0
