"""Bilinear grid sampling (gather-based).

XLA has no native grid_sample; the reference leans on torch's
``F.grid_sample`` inside its deformable cross-attention (reference
encoders.py:446-447). This is the TPU equivalent: a vectorized gather +
bilinear blend with torch ``align_corners=False`` / ``padding_mode='zeros'``
semantics, jit/vmap/grad-safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def grid_sample_bilinear(img: jax.Array, coords: jax.Array) -> jax.Array:
    """Sample ``img`` at normalized coordinates.

    Args:
      img: [B, H, W, C].
      coords: [B, ..., 2] with (x, y) in [-1, 1]; align_corners=False
        convention: pixel = ((coord + 1) * size - 1) / 2.

    Returns:
      [B, ..., C] bilinearly sampled values, zero outside the image.
    """
    B, H, W, C = img.shape
    out_shape = coords.shape[:-1]
    coords = coords.reshape(B, -1, 2).astype(jnp.float32)  # [B, N, 2]
    x = ((coords[..., 0] + 1.0) * W - 1.0) / 2.0
    y = ((coords[..., 1] + 1.0) * H - 1.0) / 2.0

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x1 = x0 + 1.0
    y1 = y0 + 1.0
    wx1 = x - x0
    wy1 = y - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    def gather(ix, iy):
        inside = (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)
        ixc = jnp.clip(ix, 0, W - 1).astype(jnp.int32)
        iyc = jnp.clip(iy, 0, H - 1).astype(jnp.int32)
        flat = img.reshape(B, H * W, C)
        idx = iyc * W + ixc  # [B, N]
        vals = jnp.take_along_axis(flat, idx[..., None], axis=1)
        return jnp.where(inside[..., None], vals, 0.0)

    out = (
        gather(x0, y0) * (wx0 * wy0)[..., None]
        + gather(x1, y0) * (wx1 * wy0)[..., None]
        + gather(x0, y1) * (wx0 * wy1)[..., None]
        + gather(x1, y1) * (wx1 * wy1)[..., None]
    )
    return out.reshape(*out_shape, C)
