"""Multi-scale adapters for plain-ViT backbones.

TPU re-designs of the reference's adapter stack (reference encoders.py):
  * FourScaleAdapter (:295-335): per-scale 1x1 projection + resize to
    strides 4/8/16/32 (integer average-pool down, bilinear up).
  * SpatialPyramidModule (:354-391): true CNN pyramid from the raw image.
  * DeformableCrossAttention2D (:394-459): CNN-grid queries sample the ViT
    map at learned offsets. The reference loops over sampling points in
    Python with grid_sample per point; here all heads x points are sampled
    in ONE vectorized gather (ops/sampling.py) and combined with a softmax
    over points — one fused XLA program.
  * InteractionBlock (:462-484): pre-norm cross-attn residual + conv FFN.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from fmc_uia_tpu.models.layers import ConvGNAct, gn_groups
from fmc_uia_tpu.ops.sampling import grid_sample_bilinear


def _resize_feature(feat: jax.Array, th: int, tw: int) -> jax.Array:
    """Down: average pool (adaptive_avg_pool2d semantics for integer
    ratios); up: bilinear."""
    B, H, W, C = feat.shape
    if (H, W) == (th, tw):
        return feat
    if H >= th and W >= tw:
        if H % th == 0 and W % tw == 0:
            kh, kw = H // th, W // tw
            return feat.reshape(B, th, kh, tw, kw, C).mean(axis=(2, 4))
        return jax.image.resize(feat, (B, th, tw, C), method="linear")
    return jax.image.resize(feat, (B, th, tw, C), method="bilinear")


class FourScaleAdapter(nn.Module):
    """Project + resize backbone features to strides (4, 8, 16, 32)."""

    out_channels_per_scale: Sequence[int]  # after projection
    in_channels_per_scale: Sequence[int]
    target_strides: Sequence[int] = (4, 8, 16, 32)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features: List[jax.Array], input_hw) -> List[jax.Array]:
        feats = list(features)[: len(self.target_strides)]
        while len(feats) < len(self.target_strides):
            feats.append(feats[-1])
        out = []
        for i, (feat, stride) in enumerate(zip(feats, self.target_strides)):
            in_ch = self.in_channels_per_scale[i]
            out_ch = self.out_channels_per_scale[i]
            if out_ch != in_ch:
                feat = nn.Conv(out_ch, (1, 1), use_bias=False,
                               dtype=self.dtype, name=f"proj{i}")(
                    feat.astype(self.dtype))
            th = max(1, input_hw[0] // stride)
            tw = max(1, input_hw[1] // stride)
            out.append(_resize_feature(feat, th, tw))
        return out


class SpatialPyramidModule(nn.Module):
    """CNN pyramid from the raw image: stem s2 then stages s4/8/16/32."""

    out_channels_per_scale: Sequence[int]
    stem_channels: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> List[jax.Array]:
        c2, c3, c4, c5 = self.out_channels_per_scale
        d = self.dtype
        x = ConvGNAct(self.stem_channels, strides=(2, 2), dtype=d,
                      name="stem0")(x)
        x = ConvGNAct(self.stem_channels, dtype=d, name="stem1")(x)
        f2 = ConvGNAct(c2, strides=(2, 2), dtype=d, name="s4_0")(x)
        f2 = ConvGNAct(c2, dtype=d, name="s4_1")(f2)
        f3 = ConvGNAct(c3, strides=(2, 2), dtype=d, name="s8_0")(f2)
        f3 = ConvGNAct(c3, dtype=d, name="s8_1")(f3)
        f4 = ConvGNAct(c4, strides=(2, 2), dtype=d, name="s16_0")(f3)
        f4 = ConvGNAct(c4, dtype=d, name="s16_1")(f4)
        f5 = ConvGNAct(c5, strides=(2, 2), dtype=d, name="s32_0")(f4)
        f5 = ConvGNAct(c5, dtype=d, name="s32_1")(f5)
        return [f2, f3, f4, f5]


class DeformableCrossAttention2D(nn.Module):
    """CNN-grid query -> ViT-map key/value with learned sampling offsets.

    All heads x points sampled in one gather; softmax over points.
    """

    channels: int
    num_heads: int = 8
    num_points: int = 4
    offset_range: float = 0.25
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, query_map: jax.Array, kv_map: jax.Array) -> jax.Array:
        B, H, W, C = query_map.shape
        Hk, Wk = kv_map.shape[1], kv_map.shape[2]
        nH, nP = self.num_heads, self.num_points
        dh = C // nH
        if C % nH:
            raise ValueError(f"channels {C} not divisible by heads {nH}")

        q = nn.Conv(C, (1, 1), use_bias=False, dtype=self.dtype,
                    name="q_proj")(query_map)
        k = nn.Conv(C, (1, 1), use_bias=False, dtype=self.dtype,
                    name="k_proj")(kv_map)
        v = nn.Conv(C, (1, 1), use_bias=False, dtype=self.dtype,
                    name="v_proj")(kv_map)

        offsets = nn.Conv(nH * nP * 2, (3, 3), dtype=self.dtype,
                          name="offset_proj")(query_map)
        offsets = jnp.tanh(offsets.astype(jnp.float32)) * self.offset_range
        offsets = offsets.reshape(B, H, W, nH, nP, 2)

        # base grid in [-1, 1] (same linspace endpoints as the reference)
        gy = np.linspace(-1.0, 1.0, H, dtype=np.float32)
        gx = np.linspace(-1.0, 1.0, W, dtype=np.float32)
        base = np.stack(np.meshgrid(gx, gy, indexing="xy"), axis=-1)
        base = jnp.asarray(base)[None, :, :, None, None, :]  # [1,H,W,1,1,2]
        coords = base + offsets  # [B, H, W, nH, nP, 2]

        # fold heads into batch for sampling: k/v as [B*nH, Hk, Wk, dh]
        k_h = k.reshape(B, Hk, Wk, nH, dh).transpose(0, 3, 1, 2, 4)
        k_h = k_h.reshape(B * nH, Hk, Wk, dh)
        v_h = v.reshape(B, Hk, Wk, nH, dh).transpose(0, 3, 1, 2, 4)
        v_h = v_h.reshape(B * nH, Hk, Wk, dh)
        coords_h = coords.transpose(0, 3, 1, 2, 4, 5).reshape(
            B * nH, H, W, nP, 2)

        k_samp = grid_sample_bilinear(k_h, coords_h)  # [B*nH, H, W, nP, dh]
        v_samp = grid_sample_bilinear(v_h, coords_h)

        q_h = q.reshape(B, H, W, nH, dh).transpose(0, 3, 1, 2, 4)
        q_h = q_h.reshape(B * nH, H, W, 1, dh)
        scale = float(np.sqrt(dh))
        logits = jnp.sum(q_h.astype(jnp.float32)
                         * k_samp.astype(jnp.float32), axis=-1) / scale
        attn = jax.nn.softmax(logits, axis=-1)  # [B*nH, H, W, nP]
        out = jnp.sum(attn[..., None] * v_samp.astype(jnp.float32), axis=3)

        out = out.reshape(B, nH, H, W, dh).transpose(0, 2, 3, 1, 4)
        out = out.reshape(B, H, W, C).astype(self.dtype)
        return nn.Conv(C, (1, 1), use_bias=False, dtype=self.dtype,
                       name="out_proj")(out)


class InteractionBlock(nn.Module):
    """Pre-norm deformable cross-attn residual + conv FFN residual."""

    channels: int
    num_heads: int = 8
    num_points: int = 4
    offset_range: float = 0.25
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, cnn_feat: jax.Array, vit_feat: jax.Array) -> jax.Array:
        C = self.channels
        norm1 = nn.GroupNorm(gn_groups(C), dtype=jnp.float32, name="norm1")
        norm2 = nn.GroupNorm(gn_groups(C), dtype=jnp.float32, name="norm2")
        attn = DeformableCrossAttention2D(
            channels=C, num_heads=self.num_heads, num_points=self.num_points,
            offset_range=self.offset_range, dtype=self.dtype, name="cross_attn")
        x = cnn_feat + attn(norm1(cnn_feat).astype(self.dtype), vit_feat)
        y = norm2(x).astype(self.dtype)
        y = nn.Conv(C, (3, 3), use_bias=False, dtype=self.dtype,
                    name="ffn0")(y)
        y = nn.silu(y)
        y = nn.Conv(C, (3, 3), use_bias=False, dtype=self.dtype,
                    name="ffn1")(y)
        return x + y
