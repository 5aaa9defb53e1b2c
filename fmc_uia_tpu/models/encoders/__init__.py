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


_SUPPORTED_FAMILIES = (
    "swin_{t,s,b,l,nano}", "vit_{t,s,b,l,nano}", "dinov3*",
    "convnext_{t,s,b,l}", "resnet50/101/resnet_tiny",
    "efficientnet-b0..b7",
    "timm:<vit|deit|dino|swin|convnext|efficientnet name>",
)


def _timm_swin_variant(body: str) -> str:
    for key, variant in (("tiny", "swin_t"), ("small", "swin_s"),
                         ("large", "swin_l"), ("base", "swin_b")):
        if key in body:
            return variant
    return "swin_b"


def build_encoder(config, dtype=jnp.float32):
    """Build the encoder module named by ``model.encoder.name``.

    ``timm:`` names are mapped onto the matching from-scratch family;
    architectures with no from-scratch equivalent raise loudly instead of
    silently substituting a different model (reference TimmEncoder accepts
    any timm name, encoders.py:162-292 — here honesty beats generality).
    """
    name = str(config.get("model.encoder.name", "resnet50"))

    if name.startswith("timm:"):
        body = name[len("timm:"):].lower()
        if "swin" in body:
            from fmc_uia_tpu.models.encoders.swin import build_swin

            return build_swin(_timm_swin_variant(body), config, dtype=dtype)
        if "efficientnet" in body:
            from fmc_uia_tpu.models.encoders.efficientnet import (
                build_efficientnet,
            )

            return build_efficientnet(body, dtype=dtype)
        if "convnext" in body:
            from fmc_uia_tpu.models.encoders.convnext import build_convnext

            return build_convnext(body, config, dtype=dtype)
        if not any(k in body for k in ("vit", "deit", "dino", "eva")):
            raise ValueError(
                f"Unsupported timm architecture {name!r}: no from-scratch "
                f"equivalent in this framework (supported: "
                f"{', '.join(_SUPPORTED_FAMILIES)}). Refusing to silently "
                "substitute a different model.")

    if name.startswith("swin_"):
        from fmc_uia_tpu.models.encoders.swin import build_swin

        return build_swin(name, config, dtype=dtype)

    if "convnext" in name:
        from fmc_uia_tpu.models.encoders.convnext import build_convnext

        return build_convnext(name, config, dtype=dtype)

    if name.startswith("vit_") or name.startswith("dinov3") or name.startswith("timm:"):
        from fmc_uia_tpu.models.encoders.vit import build_vit_encoder

        return build_vit_encoder(name, config, dtype=dtype)

    if "efficientnet" in name:
        from fmc_uia_tpu.models.encoders.efficientnet import (
            build_efficientnet,
        )

        return build_efficientnet(name, dtype=dtype)

    if name in ("resnet50", "resnet-50"):
        return resnet50(dtype=dtype)
    if name in ("resnet101", "resnet-101"):
        return ResNetEncoder(stage_sizes=(3, 4, 23, 3), width=64, dtype=dtype)
    if name in ("resnet_tiny",):  # test-size encoder
        return ResNetEncoder(stage_sizes=(1, 1, 1, 1), width=16, dtype=dtype)

    raise ValueError(
        f"Unknown encoder name: {name!r} (supported: "
        f"{', '.join(_SUPPORTED_FAMILIES)})")


__all__ = ["build_encoder", "ResNetEncoder", "resnet50"]
