"""EfficientNet encoder: pyramid contract, b4 scaling, full-model smoke.

Covers the reference SMP-fallback surface named in its README
(reference encoders.py:748-796; README.md:131-132 efficientnet-b4 19M).
"""

import copy

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fmc_uia_tpu.config import Config
from fmc_uia_tpu.models.encoders.efficientnet import (
    EfficientNetEncoder,
    build_efficientnet,
    round_filters,
    round_repeats,
)
from tests.helpers import TINY_CONFIG


def test_b4_scaling_rules():
    # canonical EfficientNet-B4 widths/depths
    w, d = 1.4, 1.8
    assert round_filters(32, w) == 48
    assert round_filters(16, w) == 24
    assert round_filters(24, w) == 32
    assert round_filters(40, w) == 56
    assert round_filters(80, w) == 112
    assert round_filters(112, w) == 160
    assert round_filters(192, w) == 272
    assert round_filters(320, w) == 448
    assert round_repeats(1, d) == 2
    assert round_repeats(2, d) == 4
    assert round_repeats(3, d) == 6
    assert round_repeats(4, d) == 8


def test_b4_pyramid_contract():
    enc = build_efficientnet("efficientnet-b4")
    assert enc.out_channels == (32, 56, 160, 448)
    x = jnp.zeros((1, 128, 128, 3), jnp.float32)
    variables = enc.init(jax.random.PRNGKey(0), x)
    feats = enc.apply(variables, x)
    assert [f.shape for f in feats] == [
        (1, 32, 32, 32), (1, 16, 16, 56), (1, 8, 8, 160), (1, 4, 4, 448)]
    n_params = sum(np.prod(p.shape) for p in
                   jax.tree_util.tree_leaves(variables["params"]))
    # README quotes 19M for the torch b4 backbone (BN, classifier head
    # excluded); the GN variant lands in the same ballpark
    assert 15e6 < n_params < 23e6, n_params


def test_b0_runs_and_residuals():
    enc = EfficientNetEncoder(width=1.0, depth=1.0)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3),
                    jnp.float32)
    variables = enc.init(jax.random.PRNGKey(0), x)
    feats = enc.apply(variables, x)
    assert all(np.isfinite(np.asarray(f)).all() for f in feats)
    assert enc.out_channels == (24, 40, 112, 320)


def test_full_model_with_efficientnet():
    from fmc_uia_tpu.models import build_model
    from fmc_uia_tpu.models.multitask import init_variables
    from fmc_uia_tpu.tasks import TaskRegistry
    from fmc_uia_tpu.train import Trainer

    cfg_dict = copy.deepcopy(TINY_CONFIG)
    cfg_dict["model"]["encoder"] = {"name": "efficientnet-b0",
                                    "pretrained": None}
    cfg = Config(config_dict=cfg_dict)
    reg = TaskRegistry.from_config(cfg)
    model = build_model(cfg, reg)
    variables = init_variables(model, jax.random.PRNGKey(0), 64, 2)
    trainer = Trainer(cfg, model, reg, variables["params"],
                      jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    batch = {
        "image": rng.randint(0, 255, (2, 64, 64, 3)).astype(np.uint8),
        "label": rng.randint(0, 2, (2, 64, 64)).astype(np.int32),
        "task_id": "T2A_organ_a", "task_index": 0,
        "task_type": "segmentation",
    }
    logs = trainer.train_batch(batch, epoch=0)
    assert np.isfinite(float(logs["total_loss"]))


def test_unsupported_timm_name_errors_loudly():
    from fmc_uia_tpu.models.encoders import build_encoder

    cfg_dict = copy.deepcopy(TINY_CONFIG)
    cfg_dict["model"]["encoder"] = {"name": "timm:mobilenetv3_large_100"}
    cfg = Config(config_dict=cfg_dict)
    with pytest.raises(ValueError, match="Unsupported timm architecture"):
        build_encoder(cfg)


def test_timm_efficientnet_and_swin_names_map():
    from fmc_uia_tpu.models.encoders import build_encoder
    from fmc_uia_tpu.models.encoders.swin import SwinEncoder

    cfg_dict = copy.deepcopy(TINY_CONFIG)
    cfg_dict["model"]["encoder"] = {"name": "timm:efficientnet_b0"}
    enc = build_encoder(Config(config_dict=cfg_dict))
    assert isinstance(enc, EfficientNetEncoder)

    cfg_dict["model"]["encoder"] = {"name":
                                    "timm:swin_tiny_patch4_window7_224"}
    enc = build_encoder(Config(config_dict=cfg_dict))
    assert isinstance(enc, SwinEncoder)
    assert enc.embed_dim == 96 and enc.depths == (2, 2, 6, 2)
