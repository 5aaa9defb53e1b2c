"""Encoder registry and dispatch.

Mirrors the reference's name-prefix dispatch (reference encoders.py:665-798):
``swin_*`` -> Swin, ``vit_*`` -> ViT (+ four-scale adapter), ``dinov3`` /
``timm:*dinov3*`` -> frozen-backbone DINOv3-style encoder with resize or
SPM-interaction adapter, anything else -> ResNet/conv families.

All encoders share one contract: ``__call__(x_nhwc, train) -> [c2, c3, c4,
c5]`` at strides 4/8/16/32, plus ``out_channels`` (4-tuple).
"""

from __future__ import annotations

import jax.numpy as jnp

from fmc_uia_tpu.models.encoders.resnet import ResNetEncoder, resnet50


def build_encoder(config, dtype=jnp.float32):
    """Build the encoder module named by ``model.encoder.name``."""
    name = str(config.get("model.encoder.name", "resnet50"))

    if name.startswith("swin_"):
        from fmc_uia_tpu.models.encoders.swin import build_swin

        return build_swin(name, config, dtype=dtype)

    if "convnext" in name:
        from fmc_uia_tpu.models.encoders.convnext import build_convnext

        return build_convnext(name, config, dtype=dtype)

    if name.startswith("vit_") or name.startswith("dinov3") or name.startswith("timm:"):
        from fmc_uia_tpu.models.encoders.vit import build_vit_encoder

        return build_vit_encoder(name, config, dtype=dtype)

    if name in ("resnet50", "resnet-50"):
        return resnet50(dtype=dtype)
    if name in ("resnet101", "resnet-101"):
        return ResNetEncoder(stage_sizes=(3, 4, 23, 3), width=64, dtype=dtype)
    if name in ("resnet_tiny",):  # test-size encoder
        return ResNetEncoder(stage_sizes=(1, 1, 1, 1), width=16, dtype=dtype)

    raise ValueError(f"Unknown encoder name: {name!r}")


__all__ = ["build_encoder", "ResNetEncoder", "resnet50"]
