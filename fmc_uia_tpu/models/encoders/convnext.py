"""ConvNeXt encoder (flax linen, NHWC).

Covers the reference's ``timm:convnext_*`` encoder path (dispatched through
TimmEncoder, reference encoders.py:748-763; convnext_base appears in the
BASELINE.json config list). From-scratch implementation: patchify stem (4x4
/4), 4 stages of ConvNeXt blocks (7x7 depthwise + LN + pointwise 4x MLP with
GELU + layer-scale + stochastic depth), 2x downsample between stages —
a naturally TPU-friendly architecture (big dense 1x1 matmuls on the MXU,
depthwise convs on the VPU).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from fmc_uia_tpu.models.encoders.swin import DropPath


class ConvNeXtBlock(nn.Module):
    dim: int
    drop_path: float = 0.0
    layer_scale_init: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        shortcut = x
        y = nn.Conv(self.dim, (7, 7), feature_group_count=self.dim,
                    dtype=self.dtype, name="dwconv")(x)
        y = nn.LayerNorm(dtype=jnp.float32, name="norm")(y)
        y = nn.Dense(4 * self.dim, dtype=self.dtype, name="pwconv1")(
            y.astype(self.dtype))
        y = nn.gelu(y)
        y = nn.Dense(self.dim, dtype=self.dtype, name="pwconv2")(y)
        gamma = self.param("gamma",
                           nn.initializers.constant(self.layer_scale_init),
                           (self.dim,), jnp.float32)
        y = y * gamma.astype(y.dtype)
        return shortcut + DropPath(self.drop_path, name="drop_path")(
            y, deterministic=not train)


class ConvNeXtEncoder(nn.Module):
    depths: Sequence[int] = (3, 3, 27, 3)
    dims: Sequence[int] = (128, 256, 512, 1024)
    drop_path_rate: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @property
    def out_channels(self) -> Tuple[int, int, int, int]:
        return tuple(self.dims)

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        x = x.astype(self.dtype)
        x = nn.Conv(self.dims[0], (4, 4), strides=(4, 4), dtype=self.dtype,
                    name="stem")(x)
        x = nn.LayerNorm(dtype=jnp.float32, name="stem_norm")(x)

        dpr = np.linspace(0, self.drop_path_rate, sum(self.depths))
        bid = 0
        features = []
        for stage, depth in enumerate(self.depths):
            if stage > 0:
                x = nn.LayerNorm(dtype=jnp.float32,
                                 name=f"down{stage}_norm")(x)
                x = nn.Conv(self.dims[stage], (2, 2), strides=(2, 2),
                            dtype=self.dtype, name=f"down{stage}")(x)
            for b in range(depth):
                x = ConvNeXtBlock(
                    dim=self.dims[stage], drop_path=float(dpr[bid]),
                    dtype=self.dtype, name=f"stage{stage}_block{b}",
                )(x, train=train)
                bid += 1
            features.append(x)
        return features


_CONVNEXT_VARIANTS = {
    "convnext_tiny": dict(depths=(3, 3, 9, 3), dims=(96, 192, 384, 768)),
    "convnext_small": dict(depths=(3, 3, 27, 3), dims=(96, 192, 384, 768)),
    "convnext_base": dict(depths=(3, 3, 27, 3), dims=(128, 256, 512, 1024)),
    "convnext_large": dict(depths=(3, 3, 27, 3), dims=(192, 384, 768, 1536)),
    "convnext_nano_test": dict(depths=(1, 1, 1, 1), dims=(16, 32, 64, 128)),
}


def build_convnext(name: str, config=None, dtype=jnp.float32
                   ) -> ConvNeXtEncoder:
    key = name[5:] if name.startswith("timm:") else name
    key = key.split(".")[0]
    if key not in _CONVNEXT_VARIANTS:
        raise ValueError(
            f"Unknown convnext variant {key!r}; have "
            f"{sorted(_CONVNEXT_VARIANTS)}")
    drop_path = 0.1
    if config is not None:
        drop_path = float(config.get("model.encoder.drop_path_rate", 0.1))
    return ConvNeXtEncoder(dtype=dtype, drop_path_rate=drop_path,
                           **_CONVNEXT_VARIANTS[key])
