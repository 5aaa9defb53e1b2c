"""ConvNeXt encoder + focal/GIoU loss tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from fmc_uia_tpu import losses
from fmc_uia_tpu.models.encoders import build_encoder
from fmc_uia_tpu.models.encoders.convnext import ConvNeXtEncoder
from tests.helpers import make_tiny_config


def test_convnext_pyramid_shapes():
    enc = ConvNeXtEncoder(depths=(1, 1, 1, 1), dims=(16, 32, 64, 128),
                          drop_path_rate=0.0)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 3))
    variables = enc.init(jax.random.PRNGKey(0), x)
    feats = enc.apply(variables, x)
    assert len(feats) == 4
    for i, f in enumerate(feats):
        stride = 4 * 2**i
        assert f.shape == (2, 64 // stride, 64 // stride, enc.dims[i])
    assert np.isfinite(np.asarray(feats[-1])).all()


def test_convnext_dispatch():
    cfg = make_tiny_config(
        model={"encoder": {"name": "timm:convnext_base"}})
    enc = build_encoder(cfg)
    assert isinstance(enc, ConvNeXtEncoder)
    assert enc.out_channels == (128, 256, 512, 1024)
    enc2 = build_encoder(make_tiny_config(
        model={"encoder": {"name": "convnext_tiny"}}))
    assert enc2.dims == (96, 192, 384, 768)


def test_focal_loss_matches_torch_formula():
    rng = np.random.RandomState(0)
    logits = rng.randn(4, 6).astype(np.float32)
    targets = (rng.rand(4, 6) > 0.5).astype(np.float32)
    ours = float(losses.focal_loss(jnp.asarray(logits), jnp.asarray(targets)))
    bce = F.binary_cross_entropy_with_logits(
        torch.tensor(logits), torch.tensor(targets), reduction="none")
    pt = torch.exp(-bce)
    ref = float((0.25 * (1 - pt) ** 2 * bce).mean())
    assert ours == pytest.approx(ref, rel=1e-5)


def test_giou_loss_perfect_and_disjoint():
    box = jnp.asarray([[0.1, 0.1, 0.5, 0.5]])
    assert float(losses.giou_loss(box, box)) == pytest.approx(0.0, abs=1e-5)
    far = jnp.asarray([[0.6, 0.6, 0.9, 0.9]])
    val = float(losses.giou_loss(box, far))
    assert val > 1.0  # disjoint boxes: IoU 0, enclosing-box penalty > 0
