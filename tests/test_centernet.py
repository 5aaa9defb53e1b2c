"""CenterNet target synthesis / decode parity tests.

Oracle: a straightforward numpy per-sample loop implementing the reference
semantics (train.py:366-398, utils/common.py:45-96) — center cell by
truncation, radius = int(max(1, gaussian_radius)), sigma = (2r+1)/6, clipped
window splat — compared against the vectorized device implementation.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from fmc_uia_tpu.ops.centernet import (
    gaussian_radius,
    make_centernet_targets,
    decode_centernet,
    decode_grid_detection,
)


def np_gaussian_radius(height, width, min_overlap=0.7):
    a1 = 1.0
    b1 = height + width
    c1 = width * height * (1 - min_overlap) / (1 + min_overlap)
    r1 = (b1 + np.sqrt(max(0.0, b1 * b1 - 4 * a1 * c1))) / 2
    a2 = 4.0
    b2 = 2 * (height + width)
    c2 = (1 - min_overlap) * width * height
    r2 = (b2 + np.sqrt(max(0.0, b2 * b2 - 4 * a2 * c2))) / 2
    a3 = 4 * min_overlap
    b3 = -2 * min_overlap * (height + width)
    c3 = (min_overlap - 1) * width * height
    r3 = (b3 + np.sqrt(max(0.0, b3 * b3 - 4 * a3 * c3))) / 2
    return min(r1, r2, r3)


def np_make_targets(boxes, H, W):
    B = boxes.shape[0]
    heatmap = np.zeros((B, H, W), np.float32)
    size = np.zeros((B, H, W, 2), np.float32)
    offset = np.zeros((B, H, W, 2), np.float32)
    mask = np.zeros((B, H, W), np.float32)
    for i in range(B):
        if not np.all(boxes[i] >= 0):
            continue
        x1, y1, x2, y2 = boxes[i].astype(np.float64)
        cx, cy = (x1 + x2) / 2, (y1 + y2) / 2
        gw = int(np.clip(int(cx * W), 0, W - 1))
        gh = int(np.clip(int(cy * H), 0, H - 1))
        size[i, gh, gw, 0] = (x2 - x1) * W
        size[i, gh, gw, 1] = (y2 - y1) * H
        offset[i, gh, gw, 0] = cx * W - gw
        offset[i, gh, gw, 1] = cy * H - gh
        mask[i, gh, gw] = 1.0
        box_h, box_w = (y2 - y1) * H, (x2 - x1) * W
        radius = int(max(1, np_gaussian_radius(box_h, box_w)))
        # clipped gaussian splat
        diameter = 2 * radius + 1
        sigma = diameter / 6.0
        yy, xx = np.meshgrid(
            np.arange(diameter), np.arange(diameter), indexing="ij"
        )
        gauss = np.exp(
            -((xx - radius) ** 2 + (yy - radius) ** 2) / (2 * sigma**2)
        )
        left, right = min(gw, radius), min(W - gw - 1, radius)
        top, bottom = min(gh, radius), min(H - gh - 1, radius)
        hm = heatmap[i, gh - top : gh + bottom + 1, gw - left : gw + right + 1]
        g = gauss[
            radius - top : radius + bottom + 1,
            radius - left : radius + right + 1,
        ]
        np.maximum(hm, g, out=hm)
    return heatmap, size, offset, mask


def test_gaussian_radius_matches_numpy():
    rng = np.random.RandomState(1)
    hs = rng.uniform(1.0, 50.0, 64)
    ws = rng.uniform(1.0, 50.0, 64)
    ours = np.asarray(gaussian_radius(hs, ws))
    ref = np.array([np_gaussian_radius(h, w) for h, w in zip(hs, ws)])
    np.testing.assert_allclose(ours, ref, rtol=1e-4)


@pytest.mark.parametrize("H,W", [(56, 56), (32, 48)])
def test_targets_match_loop_oracle(H, W):
    rng = np.random.RandomState(2)
    B = 16
    x1 = rng.uniform(0.05, 0.6, B)
    y1 = rng.uniform(0.05, 0.6, B)
    x2 = x1 + rng.uniform(0.05, 0.35, B)
    y2 = y1 + rng.uniform(0.05, 0.35, B)
    boxes = np.stack([x1, y1, x2, y2], 1).astype(np.float32)
    boxes[3] = [-1, -1, -1, -1]  # invalid sentinel
    boxes[7] = [-1, -1, -1, -1]

    tgt = make_centernet_targets(jnp.asarray(boxes), H, W)
    hm_ref, size_ref, off_ref, mask_ref = np_make_targets(boxes, H, W)

    np.testing.assert_allclose(
        np.asarray(tgt["heatmap"])[..., 0], hm_ref, atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(tgt["size"]), size_ref, atol=1e-4)
    np.testing.assert_allclose(np.asarray(tgt["offset"]), off_ref, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(tgt["mask"])[..., 0], mask_ref, atol=0
    )


def test_targets_center_values():
    """Heatmap peaks at exactly 1.0 at the center cell for valid boxes."""
    boxes = np.array([[0.2, 0.2, 0.6, 0.6]], np.float32)
    tgt = make_centernet_targets(jnp.asarray(boxes), 56, 56)
    hm = np.asarray(tgt["heatmap"])[0, :, :, 0]
    gh, gw = np.unravel_index(hm.argmax(), hm.shape)
    assert hm[gh, gw] == pytest.approx(1.0)
    assert np.asarray(tgt["mask"])[0, gh, gw, 0] == 1.0


def test_decode_roundtrip():
    """Encoding then decoding a box recovers it to within a cell."""
    boxes = np.array(
        [[0.2, 0.3, 0.5, 0.7], [0.1, 0.1, 0.4, 0.35]], np.float32
    )
    H = W = 56
    tgt = make_centernet_targets(jnp.asarray(boxes), H, W)
    # Use targets as if they were perfect predictions (heatmap as logits:
    # argmax location is the same for monotone sigmoid).
    dec = decode_centernet(tgt["heatmap"], tgt["size"], tgt["offset"])
    np.testing.assert_allclose(np.asarray(dec), boxes, atol=2.0 / W)


def test_decode_grid():
    B, H, W = 2, 8, 8
    out = np.zeros((B, H, W, 5), np.float32)
    out[0, 3, 4, :4] = [0.1, 0.2, 0.3, 0.4]
    out[0, 3, 4, 4] = 5.0
    out[1, 6, 1, :4] = [0.5, 0.6, 0.7, 0.8]
    out[1, 6, 1, 4] = 3.0
    dec = np.asarray(decode_grid_detection(jnp.asarray(out)))
    np.testing.assert_allclose(dec[0], [0.1, 0.2, 0.3, 0.4], atol=1e-6)
    np.testing.assert_allclose(dec[1], [0.5, 0.6, 0.7, 0.8], atol=1e-6)
