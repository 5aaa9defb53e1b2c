"""DINOv3 backbone fidelity tests (VERDICT r3 Missing #1 / item 6).

Covers the from-scratch DINOv3 architecture (axial RoPE, cls + storage
tokens, LayerScale, no absolute pos-embed) that the reference obtains via
timm (reference encoders.py:487-662, configs/config.yaml:17-21):

* RoPE math properties (fast): norm preservation, relative-position
  dependence, identity rotation on prefix rows, period formula.
* Torch-oracle forward parity with official dinov3 checkpoint naming via
  convert_dinov3 (slow, in test_convert_numeric.py).
* Encoder-builder wiring: dinov3 presets build the rope architecture by
  default; `dinov3_arch: plain` falls back to the r3 stand-in.
* rope_periods is a buffer: label_params pins it to the zero-update group.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fmc_uia_tpu.models.encoders.vit import (
    ViTBackbone,
    apply_rope,
    build_vit_encoder,
    rope_default_periods,
    rope_sincos,
)


def test_rope_default_periods_formula():
    p = rope_default_periods(64, base=100.0)
    assert p.shape == (16,)
    np.testing.assert_allclose(p[0], 1.0)
    # base ** (2k / (d/2)): k=8 of head_dim 64 -> 100 ** (16/32) = 10
    np.testing.assert_allclose(p[8], 10.0, rtol=1e-6)
    g = rope_default_periods(64, min_period=0.5, max_period=8.0)
    np.testing.assert_allclose(g[0], 0.5, rtol=1e-6)
    np.testing.assert_allclose(g[-1], 8.0, rtol=1e-6)
    # geometric progression
    np.testing.assert_allclose(g[1:] / g[:-1], g[1] / g[0], rtol=1e-5)


def test_rope_preserves_norm():
    """Rotations are orthogonal: per-head vector norms are unchanged."""
    periods = jnp.asarray(rope_default_periods(32))
    sin, cos = rope_sincos(4, 4, periods, num_prefix=2)
    q = jnp.asarray(np.random.RandomState(0).randn(2, 18, 3, 32),
                    jnp.float32)
    q_rot = apply_rope(q, sin, cos)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(q_rot), axis=-1),
        np.linalg.norm(np.asarray(q), axis=-1), rtol=1e-5)


def test_rope_prefix_rows_identity():
    periods = jnp.asarray(rope_default_periods(32))
    sin, cos = rope_sincos(4, 4, periods, num_prefix=3)
    q = jnp.asarray(np.random.RandomState(1).randn(1, 19, 2, 32),
                    jnp.float32)
    q_rot = apply_rope(q, sin, cos)
    np.testing.assert_allclose(np.asarray(q_rot)[:, :3],
                               np.asarray(q)[:, :3], atol=1e-6)
    assert not np.allclose(np.asarray(q_rot)[:, 3:], np.asarray(q)[:, 3:])


def test_rope_scores_depend_on_relative_offset():
    """<R(p1)q, R(p2)k> must equal <R(p1+d)q, R(p2+d)k> for any grid
    translation d — the defining property of rotary embeddings."""
    periods = jnp.asarray(rope_default_periods(16))
    gh = gw = 6
    sin, cos = rope_sincos(gh, gw, periods, num_prefix=0)
    rng = np.random.RandomState(2)
    q = jnp.asarray(rng.randn(1, gh * gw, 1, 16), jnp.float32)
    k = jnp.asarray(rng.randn(1, gh * gw, 1, 16), jnp.float32)
    # broadcast the SAME q/k content to every position, rotate, score
    qc = jnp.broadcast_to(q[:, :1], q.shape)
    kc = jnp.broadcast_to(k[:, :1], k.shape)
    qr = np.asarray(apply_rope(qc, sin, cos))[0, :, 0]
    kr = np.asarray(apply_rope(kc, sin, cos))[0, :, 0]

    def idx(y, x):
        return y * gw + x

    s_a = qr[idx(1, 1)] @ kr[idx(2, 3)]  # offset (+1, +2)
    s_b = qr[idx(3, 2)] @ kr[idx(4, 4)]  # same offset, translated by (2,1)
    np.testing.assert_allclose(s_a, s_b, rtol=1e-4)
    s_c = qr[idx(1, 1)] @ kr[idx(3, 2)]  # different offset
    assert abs(s_a - s_c) > 1e-3


def test_dinov3_backbone_param_layout():
    bb = ViTBackbone(embed_dim=64, depth=2, num_heads=2, patch_size=16,
                     out_indices=(0, 1), rope=True, num_storage_tokens=4,
                     layerscale=True)
    params = jax.eval_shape(
        lambda k, x: bb.init(k, x),
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))["params"]
    assert set(params) == {"cls_token", "storage_tokens", "rope_periods",
                           "patch_embed", "block0", "block1"}
    assert "pos_embed" not in params
    assert params["cls_token"].shape == (1, 1, 64)
    assert params["storage_tokens"].shape == (1, 4, 64)
    assert params["rope_periods"].shape == (8,)  # head_dim 32 // 4
    assert set(params["block0"]) == {"norm1", "qkv", "proj", "ls1",
                                     "norm2", "mlp_fc1", "mlp_fc2", "ls2"}


def _dino_cfg(extra=None):
    from fmc_uia_tpu.config import Config

    enc = {"name": "dinov3", "timm_name": "vit_large_patch16_dinov3",
           "pretrained": None,
           "adapter": {"type": "resize", "channels": 32}}
    enc.update(extra or {})
    return Config(config_dict={
        "experiment": {"name": "t", "seed": 0, "output_dir": "/tmp/t"},
        "data": {"root_path": "unused", "val_split": 0.2, "batch_size": 2,
                 "image_size": 64},
        "model": {"encoder": enc},
        "training": {"num_epochs": 1,
                     "optimizer": {"learning_rate": 1e-3,
                                   "weight_decay": 1e-4}},
    })


def test_builder_dinov3_defaults_to_rope_arch():
    enc = build_vit_encoder("dinov3", _dino_cfg())
    assert enc.rope and enc.layerscale
    assert enc.num_storage_tokens == 4
    assert enc.embed_dim == 1024  # vit_l from the timm_name


def test_builder_dinov3_plain_fallback():
    enc = build_vit_encoder("dinov3", _dino_cfg({"dinov3_arch": "plain"}))
    assert not enc.rope and not enc.layerscale


def test_rope_periods_labeled_frozen():
    from fmc_uia_tpu.train import label_params

    params = {"model": {"encoder": {"backbone": {
        "rope_periods": np.zeros(8), "cls_token": np.zeros((1, 1, 8))}},
        "heads": {"w": np.zeros(3)}}}
    labels = label_params(params)
    enc = labels["model"]["encoder"]["backbone"]
    assert enc["rope_periods"] == "frozen"
    assert enc["cls_token"] == "encoder"
    assert labels["model"]["heads"]["w"] == "head"


@pytest.mark.slow
def test_dinov3_encoder_forward_and_grad():
    """Small end-to-end: rope encoder forward + grads are finite, and the
    flagship spm_interaction adapter composes with the rope backbone."""
    from fmc_uia_tpu.models.encoders.vit import ViTMultiScaleEncoder

    enc = ViTMultiScaleEncoder(
        embed_dim=64, depth=2, num_heads=2, patch_size=16,
        out_indices=(0, 1), adapter_type="spm_interaction",
        adapter_channels=32, rope=True, num_storage_tokens=4,
        layerscale=True)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 64, 64, 3),
                    jnp.float32)
    params = enc.init(jax.random.PRNGKey(0), x, False)["params"]

    def loss(p):
        feats = enc.apply({"params": p}, x, False)
        return sum(jnp.mean(f ** 2) for f in feats)

    val, grads = jax.value_and_grad(loss)(params)
    assert np.isfinite(float(val))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
