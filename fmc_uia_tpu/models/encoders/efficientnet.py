"""EfficientNet encoder (flax linen, NHWC, MBConv + squeeze-excite).

Fills the reference's SMP-fallback surface for efficientnet names
(reference encoders.py:748-796 ``smp.encoders.get_encoder``; README.md:131-132
names efficientnet-b4, 19M params, as a supported option).

From-scratch TPU design, not a port of the torch blocks:
  * GroupNorm replaces BatchNorm (same rationale as resnet.py: single-task
    round-robin batches corrupt BN running stats; GN is batch-independent).
  * SiLU activations; squeeze-excite as GAP -> 1x1 reduce -> SiLU -> 1x1
    expand -> sigmoid gate (ratio 0.25 of the block's INPUT channels, the
    EfficientNet convention).
  * Depthwise convs use feature_group_count (XLA lowers these to efficient
    TPU convolutions); compound width/depth scaling reproduces the b0-b7
    family (round_filters divisor-8 rule + ceil repeats).

Pyramid contract: features at strides 4/8/16/32 = outputs of block groups
2, 3, 5, 7 (the standard encoder tap points SMP uses).
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from fmc_uia_tpu.models.layers import gn_groups

# (expand_ratio, kernel, stride, base_channels, base_repeats) per group — B0
_B0_GROUPS = (
    (1, 3, 1, 16, 1),
    (6, 3, 2, 24, 2),
    (6, 5, 2, 40, 2),
    (6, 3, 2, 80, 3),
    (6, 5, 1, 112, 3),
    (6, 5, 2, 192, 4),
    (6, 3, 1, 320, 1),
)
_B0_STEM = 32

# (width_coefficient, depth_coefficient) per variant
_COEFFS = {
    "b0": (1.0, 1.0), "b1": (1.0, 1.1), "b2": (1.1, 1.2),
    "b3": (1.2, 1.4), "b4": (1.4, 1.8), "b5": (1.6, 2.2),
    "b6": (1.8, 2.6), "b7": (2.0, 3.1),
}


def round_filters(channels: float, width: float, divisor: int = 8) -> int:
    """EfficientNet width scaling with the divisor-8 snap rule."""
    channels *= width
    new_c = max(divisor, int(channels + divisor / 2) // divisor * divisor)
    if new_c < 0.9 * channels:
        new_c += divisor
    return int(new_c)


def round_repeats(repeats: int, depth: float) -> int:
    return int(math.ceil(depth * repeats))


class SqueezeExcite(nn.Module):
    reduced: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(self.reduced, (1, 1), dtype=self.dtype,
                    name="reduce")(s)
        s = nn.silu(s)
        s = nn.Conv(x.shape[-1], (1, 1), dtype=self.dtype,
                    name="expand")(s)
        return x * nn.sigmoid(s.astype(jnp.float32)).astype(x.dtype)


class MBConv(nn.Module):
    out_ch: int
    expand_ratio: int
    kernel: int
    stride: int
    se_reduced: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        mid = in_ch * self.expand_ratio
        y = x
        if self.expand_ratio != 1:
            y = nn.Conv(mid, (1, 1), use_bias=False, dtype=self.dtype,
                        name="expand_conv")(y)
            y = nn.GroupNorm(gn_groups(mid), dtype=jnp.float32,
                             name="expand_gn")(y)
            y = nn.silu(y)
        k = self.kernel
        y = nn.Conv(mid, (k, k), strides=(self.stride, self.stride),
                    feature_group_count=mid, use_bias=False,
                    dtype=self.dtype, name="dw_conv")(y)
        y = nn.GroupNorm(gn_groups(mid), dtype=jnp.float32,
                         name="dw_gn")(y)
        y = nn.silu(y)
        y = SqueezeExcite(self.se_reduced, dtype=self.dtype, name="se")(y)
        y = nn.Conv(self.out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name="project_conv")(y)
        y = nn.GroupNorm(gn_groups(self.out_ch), dtype=jnp.float32,
                         name="project_gn")(y)
        if self.stride == 1 and in_ch == self.out_ch:
            y = y + x
        return y


class EfficientNetEncoder(nn.Module):
    """Compound-scaled MBConv pyramid encoder (strides 4/8/16/32)."""

    width: float = 1.0
    depth: float = 1.0
    dtype: jnp.dtype = jnp.float32

    def _group_channels(self) -> Tuple[int, ...]:
        return tuple(round_filters(c, self.width)
                     for (_, _, _, c, _) in _B0_GROUPS)

    @property
    def out_channels(self) -> Tuple[int, int, int, int]:
        ch = self._group_channels()
        return (ch[1], ch[2], ch[4], ch[6])  # groups 2, 3, 5, 7

    @nn.compact
    def __call__(self, x, train: bool = False):
        del train  # GN: no train/eval distinction
        x = x.astype(self.dtype)
        stem = round_filters(_B0_STEM, self.width)
        x = nn.Conv(stem, (3, 3), strides=(2, 2), use_bias=False,
                    dtype=self.dtype, name="stem_conv")(x)
        x = nn.GroupNorm(gn_groups(stem), dtype=jnp.float32,
                         name="stem_gn")(x)
        x = nn.silu(x)

        features = []
        for gi, (expand, kernel, stride, base_c, base_r) in enumerate(
                _B0_GROUPS):
            out_ch = round_filters(base_c, self.width)
            repeats = round_repeats(base_r, self.depth)
            for b in range(repeats):
                in_ch = x.shape[-1]
                x = MBConv(
                    out_ch=out_ch, expand_ratio=expand, kernel=kernel,
                    stride=stride if b == 0 else 1,
                    se_reduced=max(1, int(in_ch * 0.25)),
                    dtype=self.dtype, name=f"group{gi}_block{b}",
                )(x)
            if gi in (1, 2, 4, 6):
                features.append(x)
        return features


def build_efficientnet(name: str, dtype=jnp.float32) -> EfficientNetEncoder:
    """'efficientnet-b4' / 'efficientnet_b4' / 'timm:efficientnet_b4'."""
    key = name.split(":")[-1].replace("-", "_")
    variant = key.rsplit("_", 1)[-1]
    if variant not in _COEFFS:
        raise ValueError(
            f"Unknown efficientnet variant {name!r}; have b0..b7")
    w, d = _COEFFS[variant]
    return EfficientNetEncoder(width=w, depth=d, dtype=dtype)
