"""Task-head banks.

Every head family from the reference (code/models/heads.py) re-designed as a
*bank*: one module instance per task TYPE whose parameters carry a leading
``num_banks`` axis (one slice per subtask), selected by a device-side local
index. See models/layers.py for the rationale.

Families (reference locations):
  * SegHeadBank            — "default" SegmentationHead, heads.py:16-42
  * UNetLikeSegHeadBank    — heads.py:45-74
  * DeepSupervisionSegHeadBank — heads.py:77-114
  * ClsHeadBank            — ClassificationHead (+optional MLP), heads.py:117-155
  * BaselineClsHeadBank    — heads.py:361-380
  * CenterNetHeadBank      — heads.py:271-310 (incl. -2.19 heatmap bias init)
  * GridDetectionHeadBank  — DetectionHead with SE attention, heads.py:158-224
  * BaselineGridDetectionHeadBank — heads.py:404-428 (GN in place of BN)
  * RegHeadBank            — heads.py:313-354 (tanh -> [0,1])
  * BaselineRegHeadBank    — heads.py:383-401

Outputs are NHWC; class counts padded to the per-type max (mask in losses).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from fmc_uia_tpu.models.layers import (
    BankedConv,
    BankedDense,
    BankedGroupNorm,
    BankedMLP,
    gn_groups,
    upsample_2x,
)
from fmc_uia_tpu.tasks import (
    CLASSIFICATION,
    DETECTION,
    REGRESSION,
    SEGMENTATION,
    TaskRegistry,
)


def _gap(x: jax.Array) -> jax.Array:
    """Global average pool NHWC -> [B, C]."""
    return jnp.mean(x, axis=(1, 2))


class SegHeadBank(nn.Module):
    """Pre-head conv stack + 1x1 classifier + 4x upsample."""

    num_banks: int
    num_classes: int  # padded max
    mid_channels: Optional[int] = None
    num_layers: int = 2
    upsampling: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, idx, train: bool = False):
        mid = self.mid_channels or x.shape[-1]
        for i in range(self.num_layers):
            x = BankedConv(self.num_banks, mid, (3, 3), use_bias=False,
                           dtype=self.dtype, name=f"pre_{i}")(x, idx)
            x = BankedGroupNorm(self.num_banks, gn_groups(mid),
                                name=f"pre_gn_{i}")(x, idx)
            x = nn.silu(x)
        x = BankedConv(self.num_banks, self.num_classes, (1, 1),
                       dtype=self.dtype, name="classifier")(x, idx)
        if self.upsampling > 1:
            B, H, W, C = x.shape
            x = jax.image.resize(
                x, (B, H * self.upsampling, W * self.upsampling, C),
                method="bilinear",
            )
        return x


class UNetLikeSegHeadBank(nn.Module):
    num_banks: int
    num_classes: int
    mid_channels: Optional[int] = None
    upsampling: int = 4
    num_blocks: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, idx, train: bool = False):
        mid = self.mid_channels or x.shape[-1]
        scale = self.upsampling
        i = 0
        while scale > 1:
            x = BankedConv(self.num_banks, mid, (3, 3), use_bias=False,
                           dtype=self.dtype, name=f"up_{i}")(x, idx)
            x = BankedGroupNorm(self.num_banks, gn_groups(mid),
                                name=f"up_gn_{i}")(x, idx)
            x = nn.silu(x)
            x = upsample_2x(x, method="bilinear")
            scale //= 2
            i += 1
        for j in range(max(0, self.num_blocks - 1)):
            x = BankedConv(self.num_banks, mid, (3, 3), use_bias=False,
                           dtype=self.dtype, name=f"extra_{j}")(x, idx)
            x = BankedGroupNorm(self.num_banks, gn_groups(mid),
                                name=f"extra_gn_{j}")(x, idx)
            x = nn.silu(x)
        return BankedConv(self.num_banks, self.num_classes, (1, 1),
                          dtype=self.dtype, name="out")(x, idx)


class DeepSupervisionSegHeadBank(nn.Module):
    """Main upsampled head + N auxiliary low-res heads; returns (main, auxs)."""

    num_banks: int
    num_classes: int
    num_aux_outputs: int = 3
    upsampling: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, idx, train: bool = False):
        main = BankedConv(self.num_banks, self.num_classes, (1, 1),
                          dtype=self.dtype, name="main")(x, idx)
        B, H, W, C = main.shape
        main = jax.image.resize(
            main, (B, H * self.upsampling, W * self.upsampling, C),
            method="bilinear",
        )
        auxs = [
            BankedConv(self.num_banks, self.num_classes, (1, 1),
                       dtype=self.dtype, name=f"aux_{i}")(x, idx)
            for i in range(self.num_aux_outputs)
        ]
        return main, auxs


class ClsHeadBank(nn.Module):
    """GAP (+optional banked MLP) + dropout + banked linear."""

    num_banks: int
    num_classes: int
    dropout: float = 0.2
    mlp_hidden_dim: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, idx, train: bool = False):
        h = _gap(x)
        if self.mlp_hidden_dim:
            h = BankedDense(self.num_banks, self.mlp_hidden_dim,
                            dtype=self.dtype, name="pre_fc")(h, idx)
            h = nn.silu(h)
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        return BankedDense(self.num_banks, self.num_classes,
                           dtype=self.dtype, name="fc")(h, idx)


class BaselineClsHeadBank(nn.Module):
    num_banks: int
    num_classes: int
    dropout: float = 0.2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, idx, train: bool = False):
        h = _gap(x)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        return BankedDense(self.num_banks, self.num_classes,
                           dtype=self.dtype, name="fc")(h, idx)


class CenterNetHeadBank(nn.Module):
    """Shared stem + heatmap/size/offset branches (dict output)."""

    num_banks: int
    mid_channels: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, idx, train: bool = False):
        mid = self.mid_channels

        def conv_gn_relu(h, name):
            h = BankedConv(self.num_banks, mid, (3, 3), use_bias=False,
                           dtype=self.dtype, name=f"{name}_conv")(h, idx)
            h = BankedGroupNorm(self.num_banks, gn_groups(mid),
                                name=f"{name}_gn")(h, idx)
            return nn.relu(h)

        stem = conv_gn_relu(x, "stem")
        hm = conv_gn_relu(stem, "hm")
        # heatmap bias -2.19 => initial sigmoid ~0.1 (reference heads.py:299)
        heatmap = BankedConv(self.num_banks, 1, (1, 1), bias_init_value=-2.19,
                             dtype=self.dtype, name="hm_out")(hm, idx)
        sz = conv_gn_relu(stem, "size")
        size = nn.relu(
            BankedConv(self.num_banks, 2, (1, 1), dtype=self.dtype,
                       name="size_out")(sz, idx)
        )
        off = conv_gn_relu(stem, "offset")
        offset = nn.sigmoid(
            BankedConv(self.num_banks, 2, (1, 1), dtype=self.dtype,
                       name="offset_out")(off, idx)
        )
        return {"heatmap": heatmap, "size": size, "offset": offset}


class GridDetectionHeadBank(nn.Module):
    """Projection + residual refine + SE channel attention + [bbox,obj] map."""

    num_banks: int
    num_classes: int = 1
    mid_channels: int = 128
    num_anchors: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, idx, train: bool = False):
        mid = self.mid_channels
        num_out = self.num_anchors * (4 + self.num_classes)

        h = BankedConv(self.num_banks, mid, (3, 3), use_bias=False,
                       dtype=self.dtype, name="in_conv")(x, idx)
        h = BankedGroupNorm(self.num_banks, gn_groups(mid), name="in_gn")(h, idx)
        h = nn.relu(h)
        residual = h
        r = BankedConv(self.num_banks, mid, (3, 3), use_bias=False,
                       dtype=self.dtype, name="refine1")(h, idx)
        r = BankedGroupNorm(self.num_banks, gn_groups(mid), name="refine1_gn")(r, idx)
        r = nn.relu(r)
        r = BankedConv(self.num_banks, mid, (3, 3), use_bias=False,
                       dtype=self.dtype, name="refine2")(r, idx)
        r = BankedGroupNorm(self.num_banks, gn_groups(mid), name="refine2_gn")(r, idx)
        # SE-like channel attention
        a = _gap(r)
        a = nn.relu(BankedDense(self.num_banks, mid // 4, dtype=self.dtype,
                                name="attn1")(a, idx))
        a = nn.sigmoid(BankedDense(self.num_banks, mid, dtype=self.dtype,
                                   name="attn2")(a, idx))
        r = r * a[:, None, None, :]
        h = r + residual
        out = BankedConv(self.num_banks, num_out, (1, 1), dtype=self.dtype,
                         name="out")(nn.relu(h), idx)
        bbox = nn.sigmoid(out[..., :4])
        return jnp.concatenate([bbox, out[..., 4:]], axis=-1)


class BaselineGridDetectionHeadBank(nn.Module):
    num_banks: int
    num_classes: int = 1
    mid_channels: int = 128
    num_anchors: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, idx, train: bool = False):
        mid = self.mid_channels
        num_out = self.num_anchors * (4 + self.num_classes)
        for i in range(2):
            x = BankedConv(self.num_banks, mid, (3, 3), use_bias=False,
                           dtype=self.dtype, name=f"conv{i}")(x, idx)
            x = BankedGroupNorm(self.num_banks, gn_groups(mid),
                                name=f"gn{i}")(x, idx)
            x = nn.relu(x)
        out = BankedConv(self.num_banks, num_out, (1, 1), dtype=self.dtype,
                         name="out")(x, idx)
        bbox = nn.sigmoid(out[..., :4])
        return jnp.concatenate([bbox, out[..., 4:]], axis=-1)


class RegHeadBank(nn.Module):
    """GAP + banked MLP (+tanh -> [0,1])."""

    num_banks: int
    num_points: int  # padded max
    hidden_dims: Sequence[int] = (256, 128)
    dropout: float = 0.1
    use_tanh: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, idx, train: bool = False):
        h = _gap(x)
        h = BankedMLP(self.num_banks, tuple(self.hidden_dims),
                      self.num_points * 2, dropout=self.dropout,
                      dtype=self.dtype, name="mlp")(h, idx, train=train)
        if self.use_tanh:
            h = (jnp.tanh(h) + 1.0) * 0.5
        return h


class BaselineRegHeadBank(nn.Module):
    num_banks: int
    num_points: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, idx, train: bool = False):
        return BankedDense(self.num_banks, self.num_points * 2,
                           dtype=self.dtype, name="fc")(_gap(x), idx)


# --------------------------------------------------------------------------
# Factory (reference heads.py:439-594)
# --------------------------------------------------------------------------
def build_head_banks(config, registry: TaskRegistry,
                     dtype=jnp.float32) -> Dict[str, nn.Module]:
    """One head bank per present task type, configured like the reference."""
    heads_cfg = config.get("model.heads", {}) or {}
    use_baseline = bool(heads_cfg.get("use_baseline", False))
    banks: Dict[str, nn.Module] = {}

    if registry.num_of_type(SEGMENTATION) > 0:
        cfg = heads_cfg.get("segmentation", {}) or {}
        T = registry.num_of_type(SEGMENTATION)
        C = registry.max_classes(SEGMENTATION)
        if cfg.get("use_deep_supervision", False):
            banks[SEGMENTATION] = DeepSupervisionSegHeadBank(
                num_banks=T, num_classes=C,
                num_aux_outputs=int(cfg.get("num_aux_outputs", 3)),
                upsampling=int(cfg.get("upsampling", 4)), dtype=dtype,
            )
        elif cfg.get("type", "standard") == "unet_like":
            mid = cfg.get("mid_channels")
            banks[SEGMENTATION] = UNetLikeSegHeadBank(
                num_banks=T, num_classes=C,
                mid_channels=int(mid) if mid else None,
                upsampling=int(cfg.get("upsampling", 4)),
                num_blocks=int(cfg.get("num_blocks", 2)), dtype=dtype,
            )
        else:
            mid = cfg.get("mid_channels")
            banks[SEGMENTATION] = SegHeadBank(
                num_banks=T, num_classes=C,
                mid_channels=int(mid) if mid else None,
                num_layers=int(cfg.get("num_layers", 2)),
                upsampling=int(cfg.get("upsampling", 4)), dtype=dtype,
            )

    if registry.num_of_type(CLASSIFICATION) > 0:
        cfg = heads_cfg.get("classification", {}) or {}
        T = registry.num_of_type(CLASSIFICATION)
        C = registry.max_classes(CLASSIFICATION)
        if use_baseline or cfg.get("type") == "baseline":
            banks[CLASSIFICATION] = BaselineClsHeadBank(
                num_banks=T, num_classes=C,
                dropout=float(cfg.get("dropout", 0.2)), dtype=dtype,
            )
        else:
            mlp = cfg.get("mlp_hidden_dim")
            banks[CLASSIFICATION] = ClsHeadBank(
                num_banks=T, num_classes=C,
                dropout=float(cfg.get("dropout", 0.2)),
                mlp_hidden_dim=int(mlp) if mlp else None, dtype=dtype,
            )

    if registry.num_of_type(DETECTION) > 0:
        cfg = heads_cfg.get("detection", {}) or {}
        T = registry.num_of_type(DETECTION)
        C = registry.max_classes(DETECTION)
        det_type = cfg.get("type", "centernet")
        if use_baseline or det_type == "baseline":
            banks[DETECTION] = BaselineGridDetectionHeadBank(
                num_banks=T, num_classes=C,
                mid_channels=int(cfg.get("mid_channels", 128)),
                num_anchors=int(cfg.get("num_anchors", 1)), dtype=dtype,
            )
        elif det_type == "centernet":
            banks[DETECTION] = CenterNetHeadBank(
                num_banks=T,
                mid_channels=int(cfg.get("mid_channels", 128)), dtype=dtype,
            )
        else:
            banks[DETECTION] = GridDetectionHeadBank(
                num_banks=T, num_classes=C,
                mid_channels=int(cfg.get("mid_channels", 128)),
                num_anchors=int(cfg.get("num_anchors", 1)), dtype=dtype,
            )

    if registry.num_of_type(REGRESSION) > 0:
        cfg = heads_cfg.get("regression", {}) or {}
        T = registry.num_of_type(REGRESSION)
        P = registry.max_classes(REGRESSION)  # num_classes == num_points
        if use_baseline or cfg.get("type") == "baseline":
            banks[REGRESSION] = BaselineRegHeadBank(
                num_banks=T, num_points=P, dtype=dtype)
        else:
            hidden = cfg.get("hidden_dims") or [256, 128]
            banks[REGRESSION] = RegHeadBank(
                num_banks=T, num_points=P,
                hidden_dims=tuple(int(d) for d in hidden),
                dropout=float(cfg.get("dropout", 0.1)),
                use_tanh=bool(cfg.get("use_tanh", True)), dtype=dtype,
            )
    return banks
