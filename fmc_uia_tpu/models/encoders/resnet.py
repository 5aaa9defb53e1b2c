"""ResNet encoder (flax linen, NHWC).

Fills the role of the reference's SMP encoder fallback
(reference encoders.py:748-796, `smp.encoders.get_encoder('resnet50', ...)`)
as a from-scratch TPU implementation: bottleneck-v1 with a 7x7 stem,
returning 4 pyramid features at strides 4/8/16/32.

GroupNorm replaces BatchNorm: per-task-type round-robin batches make BN
running statistics a cross-task liability, GN is batch-independent and maps
to the same fused VPU work on TPU.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from fmc_uia_tpu.models.layers import gn_groups


class BottleneckBlock(nn.Module):
    features: int  # bottleneck width; output is 4x
    strides: Tuple[int, int] = (1, 1)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        out_ch = self.features * 4
        residual = x
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype)(x)
        y = nn.GroupNorm(gn_groups(self.features), dtype=jnp.float32)(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), strides=self.strides,
                    use_bias=False, dtype=self.dtype)(y)
        y = nn.GroupNorm(gn_groups(self.features), dtype=jnp.float32)(y)
        y = nn.relu(y)
        y = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype)(y)
        y = nn.GroupNorm(gn_groups(out_ch), dtype=jnp.float32)(y)
        if residual.shape[-1] != out_ch or self.strides != (1, 1):
            residual = nn.Conv(out_ch, (1, 1), strides=self.strides,
                               use_bias=False, dtype=self.dtype,
                               name="proj")(x)
            residual = nn.GroupNorm(gn_groups(out_ch), dtype=jnp.float32)(
                residual)
        return nn.relu(y + residual)


class ResNetEncoder(nn.Module):
    """4-stage pyramid encoder. stage_sizes=(3,4,6,3) == ResNet-50."""

    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    width: int = 64
    dtype: jnp.dtype = jnp.float32

    @property
    def out_channels(self) -> Tuple[int, int, int, int]:
        return tuple(self.width * 4 * (2**i) for i in range(4))

    @nn.compact
    def __call__(self, x, train: bool = False):
        del train  # GN has no train/eval distinction
        x = x.astype(self.dtype)
        # stem: 7x7/2 + GN + relu + maxpool/2  -> stride 4
        x = nn.Conv(self.width, (7, 7), strides=(2, 2), use_bias=False,
                    dtype=self.dtype, name="stem_conv")(x)
        x = nn.GroupNorm(gn_groups(self.width), dtype=jnp.float32)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        features = []
        for i, num_blocks in enumerate(self.stage_sizes):
            stage_width = self.width * (2**i)
            for j in range(num_blocks):
                strides = (2, 2) if (j == 0 and i > 0) else (1, 1)
                x = BottleneckBlock(
                    stage_width, strides=strides, dtype=self.dtype,
                    name=f"stage{i}_block{j}",
                )(x)
            features.append(x)
        return features


def resnet50(dtype=jnp.float32) -> ResNetEncoder:
    return ResNetEncoder(stage_sizes=(3, 4, 6, 3), width=64, dtype=dtype)


def resnet18_like(dtype=jnp.float32) -> ResNetEncoder:
    """Small bottleneck variant for tests (channels 64*4 scaled down)."""
    return ResNetEncoder(stage_sizes=(1, 1, 1, 1), width=16, dtype=dtype)
