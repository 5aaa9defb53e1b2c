"""Loss parity tests.

torch (CPU) serves as the numeric oracle for the formulas the reference
builds from torch/smp primitives; our JAX implementations must match.
"""

import numpy as np
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from fmc_uia_tpu import losses


def test_cross_entropy_matches_torch():
    rng = np.random.RandomState(0)
    logits = rng.randn(8, 5).astype(np.float32)
    targets = rng.randint(0, 5, 8)
    ours = float(losses.cross_entropy_loss(jnp.asarray(logits),
                                           jnp.asarray(targets)))
    ref = float(F.cross_entropy(torch.tensor(logits), torch.tensor(targets)))
    assert ours == pytest.approx(ref, rel=1e-5)


def test_cross_entropy_segmentation_matches_torch():
    rng = np.random.RandomState(1)
    logits = rng.randn(2, 6, 6, 3).astype(np.float32)
    targets = rng.randint(0, 3, (2, 6, 6))
    ours = float(losses.cross_entropy_loss(jnp.asarray(logits),
                                           jnp.asarray(targets)))
    # torch expects NCHW
    ref = float(F.cross_entropy(
        torch.tensor(logits).permute(0, 3, 1, 2), torch.tensor(targets)
    ))
    assert ours == pytest.approx(ref, rel=1e-5)


def test_cross_entropy_class_padding_masks_logits():
    rng = np.random.RandomState(2)
    logits = rng.randn(8, 6).astype(np.float32)
    targets = rng.randint(0, 3, 8)
    ours_padded = float(losses.cross_entropy_loss(
        jnp.asarray(logits), jnp.asarray(targets),
        num_valid_classes=jnp.int32(3),
    ))
    ref = float(F.cross_entropy(torch.tensor(logits[:, :3]),
                                torch.tensor(targets)))
    assert ours_padded == pytest.approx(ref, rel=1e-5)


def test_dice_loss_hand_case():
    """Perfect one-hot prediction -> dice ~ 0 for present classes."""
    targets = np.zeros((1, 4, 4), np.int64)
    targets[0, :2, :2] = 1
    logits = np.full((1, 4, 4, 2), -20.0, np.float32)
    for i in range(4):
        for j in range(4):
            logits[0, i, j, targets[0, i, j]] = 20.0
    val = float(losses.dice_loss_multiclass(jnp.asarray(logits),
                                            jnp.asarray(targets)))
    assert val == pytest.approx(0.0, abs=1e-5)


def test_dice_loss_smp_semantics():
    """Dice aggregates over (batch, pixels) per class, then means classes."""
    rng = np.random.RandomState(3)
    logits = rng.randn(2, 8, 8, 3).astype(np.float32)
    targets = rng.randint(0, 3, (2, 8, 8))

    # independent numpy oracle of smp.DiceLoss(mode='multiclass')
    probs = torch.softmax(torch.tensor(logits), dim=-1).numpy()
    onehot = np.eye(3)[targets]
    dims = (0, 1, 2)
    inter = (probs * onehot).sum(dims)
    card = (probs + onehot).sum(dims)
    dice = (2 * inter) / np.maximum(card, 1e-7)
    loss = 1 - dice
    present = onehot.sum(dims) > 0
    ref = (loss * present).mean()

    ours = float(losses.dice_loss_multiclass(jnp.asarray(logits),
                                             jnp.asarray(targets)))
    assert ours == pytest.approx(float(ref), rel=1e-5)


def test_centernet_focal_matches_torch_formula():
    rng = np.random.RandomState(4)
    logits = rng.randn(2, 8, 8, 1).astype(np.float32) * 3
    targets = np.zeros((2, 8, 8, 1), np.float32)
    targets[0, 2, 3, 0] = 1.0
    targets[0, 2, 4, 0] = 0.8
    targets[1, 5, 5, 0] = 1.0

    t = torch.tensor(targets)
    pred = torch.sigmoid(torch.tensor(logits)).clamp(1e-6, 1 - 1e-6)
    pos = t.eq(1).float()
    neg = t.lt(1).float()
    nw = (1 - t).pow(4.0)
    pos_loss = (-torch.log(pred) * (1 - pred).pow(2.0) * pos).sum()
    neg_loss = (-torch.log(1 - pred) * pred.pow(2.0) * nw * neg).sum()
    ref = float((pos_loss + neg_loss) / pos.sum())

    ours = float(losses.centernet_focal_loss(jnp.asarray(logits),
                                             jnp.asarray(targets)))
    assert ours == pytest.approx(ref, rel=1e-4)


def test_centernet_focal_no_positives():
    logits = np.zeros((1, 4, 4, 1), np.float32)
    targets = np.zeros((1, 4, 4, 1), np.float32)
    ours = float(losses.centernet_focal_loss(jnp.asarray(logits),
                                             jnp.asarray(targets)))
    # all-negative: sum of neg losses, NOT normalized
    pred = 1 / (1 + np.exp(0.0))
    expected = -np.log(1 - pred) * pred**2 * 16
    assert ours == pytest.approx(float(expected), rel=1e-4)


def test_centernet_loss_masked_l1():
    rng = np.random.RandomState(5)
    B, H, W = 2, 8, 8
    preds = {
        "heatmap": jnp.asarray(rng.randn(B, H, W, 1).astype(np.float32)),
        "size": jnp.asarray(rng.rand(B, H, W, 2).astype(np.float32) * 10),
        "offset": jnp.asarray(rng.rand(B, H, W, 2).astype(np.float32)),
    }
    mask = np.zeros((B, H, W, 1), np.float32)
    mask[0, 3, 3, 0] = 1.0
    tgt = {
        "heatmap": jnp.asarray(np.zeros((B, H, W, 1), np.float32)),
        "size": jnp.asarray(rng.rand(B, H, W, 2).astype(np.float32) * 10),
        "offset": jnp.asarray(rng.rand(B, H, W, 2).astype(np.float32)),
        "mask": jnp.asarray(mask),
    }
    total = float(losses.centernet_loss(preds, tgt))

    hm = float(losses.centernet_focal_loss(preds["heatmap"], tgt["heatmap"]))
    m = mask
    sz = np.abs(np.asarray(preds["size"]) * m - np.asarray(tgt["size"]) * m).sum() / (m.sum() + 1e-6)
    off = np.abs(np.asarray(preds["offset"]) * m - np.asarray(tgt["offset"]) * m).sum() / (m.sum() + 1e-6)
    assert total == pytest.approx(hm + sz + off, rel=1e-4)


def test_detection_grid_loss_matches_torch():
    rng = np.random.RandomState(6)
    preds = rng.randn(6, 5).astype(np.float32)
    targets = np.concatenate(
        [rng.rand(6, 4).astype(np.float32),
         (rng.rand(6, 1) > 0.5).astype(np.float32)], axis=1
    )
    ours = float(losses.detection_grid_loss(jnp.asarray(preds),
                                            jnp.asarray(targets)))
    tp, tt = torch.tensor(preds), torch.tensor(targets)
    cls = F.binary_cross_entropy_with_logits(tp[:, 4], tt[:, 4])
    pos = tt[:, 4] > 0.5
    box = (F.smooth_l1_loss(tp[:, :4][pos], tt[:, :4][pos])
           if pos.any() else torch.tensor(0.0))
    ref = float(2.0 * cls + 1.0 * box)
    assert ours == pytest.approx(ref, rel=1e-4)


def test_regression_losses_match_torch():
    rng = np.random.RandomState(7)
    p = rng.rand(4, 8).astype(np.float32)
    t = rng.rand(4, 8).astype(np.float32)
    assert float(losses.mse_loss(jnp.asarray(p), jnp.asarray(t))) == \
        pytest.approx(float(F.mse_loss(torch.tensor(p), torch.tensor(t))), rel=1e-5)
    assert float(losses.l1_loss(jnp.asarray(p), jnp.asarray(t))) == \
        pytest.approx(float(F.l1_loss(torch.tensor(p), torch.tensor(t))), rel=1e-5)
    assert float(losses.smooth_l1_loss(jnp.asarray(p), jnp.asarray(t))) == \
        pytest.approx(float(F.smooth_l1_loss(torch.tensor(p), torch.tensor(t))), rel=1e-5)


def test_adaptive_weighting_formula():
    log_vars = losses.init_adaptive_log_vars(["segmentation", "detection"], -1.0)
    ld = {"segmentation": jnp.asarray(2.0), "detection": jnp.asarray(1.0)}
    total, weighted, weights = losses.adaptive_weighted_loss(log_vars, ld)
    lv = 3.0 * np.tanh(-1.0 / 3.0)
    w = 0.5 * np.exp(-lv)
    expected = (w * 2.0 + 0.5 * lv) + (w * 1.0 + 0.5 * lv)
    assert float(total) == pytest.approx(float(expected), rel=1e-4)
    assert float(weights["segmentation"]) == pytest.approx(float(w), rel=1e-4)
    sig = losses.adaptive_sigmas(log_vars)["segmentation"]
    assert float(sig) == pytest.approx(float(np.exp(0.5 * lv)), rel=1e-4)


def test_build_all_losses_fixed_and_adaptive():
    from fmc_uia_tpu.tasks import TaskRegistry
    from tests.helpers import make_tiny_config

    cfg = make_tiny_config()
    reg = TaskRegistry.from_config(cfg)
    fns, weights, log_vars = losses.build_all_losses(cfg, reg)
    assert set(fns) == {"segmentation", "classification", "detection",
                        "Regression"}
    assert log_vars is None
    assert weights["detection"] == 2.0

    cfg2 = make_tiny_config(training={"adaptive_loss": {"enabled": True}})
    fns2, weights2, log_vars2 = losses.build_all_losses(cfg2, reg)
    assert weights2 is None
    assert set(log_vars2) == set(fns2)
    assert float(log_vars2["segmentation"]) == pytest.approx(-1.0)
