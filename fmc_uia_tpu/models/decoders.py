"""FPN decoder (flax linen, NHWC).

Capability match for the reference's SMP FPNDecoder use
(reference decoders.py:9-60): lateral 1x1 projections, top-down 2x
nearest-upsample + add, per-level segmentation blocks brought to stride 4,
merged by concat or sum, spatial dropout. ``build_decoders`` reproduces the
1-4 decoder aliasing scheme (separate seg/det/cls/reg FPNs or shared,
reference decoders.py:63-103).

GroupNorm instead of BatchNorm (batch-independent under round-robin
single-task batches; same reasoning as the encoders).
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from fmc_uia_tpu.models.layers import gn_groups, upsample_2x


class FPNDecoder(nn.Module):
    """Feature Pyramid Network over 4 encoder stages (strides 4/8/16/32)."""

    pyramid_channels: int = 256
    segmentation_channels: int = 128
    merge_policy: str = "cat"  # 'cat' | 'add'
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @property
    def out_channels(self) -> int:
        if self.merge_policy == "cat":
            return self.segmentation_channels * 4
        return self.segmentation_channels

    @nn.compact
    def __call__(self, features: Sequence[jax.Array],
                 train: bool = False) -> jax.Array:
        c2, c3, c4, c5 = features  # strides 4, 8, 16, 32

        def lateral(x, name):
            return nn.Conv(self.pyramid_channels, (1, 1), dtype=self.dtype,
                           name=name)(x.astype(self.dtype))

        p5 = lateral(c5, "lateral5")
        p4 = upsample_2x(p5) + lateral(c4, "lateral4")
        p3 = upsample_2x(p4) + lateral(c3, "lateral3")
        p2 = upsample_2x(p3) + lateral(c2, "lateral2")

        def seg_block(x, n_upsamples, name):
            # at least one conv; one conv per upsample step after the first
            n_convs = max(1, n_upsamples)
            for i in range(n_convs):
                x = nn.Conv(self.segmentation_channels, (3, 3),
                            use_bias=False, dtype=self.dtype,
                            name=f"{name}_conv{i}")(x)
                # stats are f32 inside flax regardless; emitting the output
                # in the compute dtype halves the materialized GN tensors
                # feeding the next conv (same trade as the encoder's ln_bf16,
                # PERF.md r2-6) and matches BankedGroupNorm in the heads.
                x = nn.GroupNorm(gn_groups(self.segmentation_channels),
                                 dtype=self.dtype)(x)
                x = nn.relu(x)
                if i < n_upsamples:
                    x = upsample_2x(x, method="bilinear")
            return x

        s5 = seg_block(p5, 3, "seg5")
        s4 = seg_block(p4, 2, "seg4")
        s3 = seg_block(p3, 1, "seg3")
        s2 = seg_block(p2, 0, "seg2")

        if self.merge_policy == "cat":
            x = jnp.concatenate([s5, s4, s3, s2], axis=-1)
        else:
            x = s5 + s4 + s3 + s2

        if self.dropout > 0:
            # spatial (2D) dropout: drop whole channels
            x = nn.Dropout(self.dropout, broadcast_dims=(1, 2),
                           deterministic=not train)(x)
        return x


def build_decoders(config, dtype=jnp.float32) -> Tuple[Dict[str, str],
                                                       Dict[str, FPNDecoder]]:
    """Build the seg/det/cls/reg FPN aliasing map.

    Returns (alias map task_type -> decoder name, dict of decoder modules).
    Mirrors reference decoders.py:63-103: ``fpn_seg`` always exists; the
    other three are separate modules or aliases of ``fpn_seg`` depending on
    the ``separate_*_fpn`` flags.
    """
    dec_cfg = config.get("model.decoder", {}) or {}
    kwargs = dict(
        pyramid_channels=int(dec_cfg.get("pyramid_channels", 256)),
        segmentation_channels=int(dec_cfg.get("segmentation_channels", 128)),
        merge_policy=str(dec_cfg.get("merge_policy", "cat")),
        dropout=float(dec_cfg.get("dropout", 0.0)),
        dtype=dtype,
    )
    modules: Dict[str, FPNDecoder] = {"fpn_seg": FPNDecoder(**kwargs)}
    alias = {"segmentation": "fpn_seg"}

    for task_type, flag in [
        ("detection", "separate_detection_fpn"),
        ("classification", "separate_classification_fpn"),
        ("Regression", "separate_regression_fpn"),
    ]:
        name = {
            "detection": "fpn_det",
            "classification": "fpn_cls",
            "Regression": "fpn_reg",
        }[task_type]
        if dec_cfg.get(flag, False):
            modules[name] = FPNDecoder(**kwargs)
            alias[task_type] = name
        else:
            alias[task_type] = "fpn_seg"
    return alias, modules
