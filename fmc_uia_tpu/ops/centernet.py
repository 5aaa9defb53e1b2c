"""CenterNet target synthesis and decoding — vectorized for TPU.

The reference synthesizes CenterNet targets with a Python loop over the batch
on device tensors (reference train.py:366-398, using gaussian_radius and
draw_gaussian from utils/common.py:45-96), and decodes boxes with another
per-sample loop (metrics/__init__.py:124-171). Both are data-dependent host
control flow — poison for XLA. Here both are closed-form array programs:

  * Each sample carries exactly one box, so the clipped gaussian splat
    reduces to evaluating the gaussian on the full H×W grid masked to the
    radius window (the reference's window-crop + max-merge against a zero
    heatmap is exactly that).
  * The radius is the 3-case min-overlap quadratic solution evaluated in
    float32 on device.

Everything runs under jit/vmap with static shapes; no per-sample loops.
Layout is NHWC (heatmap [B,H,W,1], size/offset [B,H,W,2]).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


def gaussian_radius(height, width, min_overlap: float = 0.7):
    """Minimum gaussian radius keeping IoU >= min_overlap.

    Same 3-case quadratic formulation as reference utils/common.py:45-67,
    evaluated elementwise on arrays (float32).
    """
    height = jnp.asarray(height, jnp.float32)
    width = jnp.asarray(width, jnp.float32)

    a1 = 1.0
    b1 = height + width
    c1 = width * height * (1 - min_overlap) / (1 + min_overlap)
    sq1 = jnp.sqrt(jnp.maximum(0.0, b1 * b1 - 4 * a1 * c1))
    r1 = (b1 + sq1) / 2.0

    a2 = 4.0
    b2 = 2.0 * (height + width)
    c2 = (1 - min_overlap) * width * height
    sq2 = jnp.sqrt(jnp.maximum(0.0, b2 * b2 - 4 * a2 * c2))
    r2 = (b2 + sq2) / 2.0

    a3 = 4.0 * min_overlap
    b3 = -2.0 * min_overlap * (height + width)
    c3 = (min_overlap - 1) * width * height
    sq3 = jnp.sqrt(jnp.maximum(0.0, b3 * b3 - 4 * a3 * c3))
    # (b3 + sq3) / 2 — the canonical CornerNet/CenterNet formulation that the
    # reference preserves (utils/common.py:65); intentionally NOT / (2*a3).
    r3 = (b3 + sq3) / 2.0

    return jnp.minimum(jnp.minimum(r1, r2), r3)


def make_centernet_targets(
    boxes: jax.Array, feat_h: int, feat_w: int
) -> Dict[str, jax.Array]:
    """Build CenterNet training targets for one-box-per-image batches.

    Args:
      boxes: [B, 4] normalized corner boxes (x1, y1, x2, y2) in [0, 1];
        any negative coordinate marks the sample invalid (sentinel
        [-1,-1,-1,-1], reference dataset.py:105).
      feat_h, feat_w: static heatmap spatial dims (stride-4 FPN output).

    Returns dict with:
      heatmap [B, H, W, 1], size [B, H, W, 2] (box size in feature cells),
      offset [B, H, W, 2] (sub-cell center fraction), mask [B, H, W, 1].

    Numeric contract matches reference train.py:366-398: center cell by
    truncation+clamp, radius = int(max(1, gaussian_radius(box_hw))), gaussian
    sigma = (2r+1)/6, splat clipped to the radius window.
    """
    boxes = boxes.astype(jnp.float32)
    B = boxes.shape[0]
    valid = jnp.all(boxes >= 0.0, axis=1)  # [B]

    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    cx = (x1 + x2) * 0.5
    cy = (y1 + y2) * 0.5
    # torch `.long()` truncates toward zero; coords are >= 0 here.
    gw = jnp.clip(jnp.floor(cx * feat_w).astype(jnp.int32), 0, feat_w - 1)
    gh = jnp.clip(jnp.floor(cy * feat_h).astype(jnp.int32), 0, feat_h - 1)

    box_w = (x2 - x1) * feat_w  # in feature cells
    box_h = (y2 - y1) * feat_h
    radius_f = gaussian_radius(box_h, box_w)
    radius = jnp.floor(jnp.maximum(1.0, radius_f)).astype(jnp.int32)  # [B]

    ys = jax.lax.broadcasted_iota(jnp.int32, (feat_h, feat_w), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (feat_h, feat_w), 1)
    ys = ys[None]  # [1, H, W]
    xs = xs[None]

    ghb = gh[:, None, None]
    gwb = gw[:, None, None]
    rb = radius[:, None, None]

    diameter = 2.0 * radius.astype(jnp.float32) + 1.0
    sigma = diameter / 6.0
    sig2 = (2.0 * sigma * sigma)[:, None, None]

    d2 = ((xs - gwb).astype(jnp.float32) ** 2
          + (ys - ghb).astype(jnp.float32) ** 2)
    gauss = jnp.exp(-d2 / sig2)
    in_window = (jnp.abs(xs - gwb) <= rb) & (jnp.abs(ys - ghb) <= rb)
    heatmap = jnp.where(in_window & valid[:, None, None], gauss, 0.0)

    at_center = (xs == gwb) & (ys == ghb) & valid[:, None, None]
    centerf = at_center.astype(jnp.float32)

    size_x = centerf * box_w[:, None, None]
    size_y = centerf * box_h[:, None, None]
    off_x = centerf * (cx * feat_w - gw.astype(jnp.float32))[:, None, None]
    off_y = centerf * (cy * feat_h - gh.astype(jnp.float32))[:, None, None]

    return {
        "heatmap": heatmap[..., None],
        "size": jnp.stack([size_x, size_y], axis=-1),
        "offset": jnp.stack([off_x, off_y], axis=-1),
        "mask": centerf[..., None],
    }


def decode_centernet(
    heatmap: jax.Array, size: jax.Array, offset: jax.Array
) -> jax.Array:
    """Decode the single best box per image from CenterNet outputs.

    Mirrors reference metrics/__init__.py:124-153 (peak argmax, read
    offset/size at the peak, reconstruct normalized corners, clamp [0,1])
    without the per-sample loop.

    Args:
      heatmap: [B, H, W, 1] raw logits. size/offset: [B, H, W, 2].
    Returns:
      boxes [B, 4] normalized (x1, y1, x2, y2).
    """
    B, H, W, _ = heatmap.shape
    flat = heatmap[..., 0].reshape(B, H * W)
    best = jnp.argmax(flat, axis=1)
    best_h = best // W
    best_w = best % W

    bidx = jnp.arange(B)
    off = offset[bidx, best_h, best_w]  # [B, 2]
    sz = size[bidx, best_h, best_w]  # [B, 2]

    cx = (best_w.astype(jnp.float32) + off[:, 0]) / W
    cy = (best_h.astype(jnp.float32) + off[:, 1]) / H
    bw = sz[:, 0] / W
    bh = sz[:, 1] / H

    boxes = jnp.stack(
        [cx - bw * 0.5, cy - bh * 0.5, cx + bw * 0.5, cy + bh * 0.5], axis=1
    )
    return jnp.clip(boxes, 0.0, 1.0)


def decode_grid_detection(outputs: jax.Array) -> jax.Array:
    """Decode best box from a grid detection head output.

    Mirrors reference metrics/__init__.py:154-171: objectness-argmax cell,
    read the 4 (already sigmoid-ed) bbox channels there.

    Args:
      outputs: [B, H, W, 5] with channels [bbox(4), objectness(1)].
    Returns:
      boxes [B, 4] normalized corners.
    """
    B, H, W, _ = outputs.shape
    scores = outputs[..., 4].reshape(B, H * W)
    best = jnp.argmax(scores, axis=1)
    best_h = best // W
    best_w = best % W
    bidx = jnp.arange(B)
    return outputs[bidx, best_h, best_w, :4]
