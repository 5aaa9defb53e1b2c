"""Pretrained-weight conversion tests.

timm is not installed here, so the tests synthesize state_dicts with the
exact timm/torchvision naming + shapes and verify the converted tree merges
into our initialized params (full coverage, shape-checked) and the model
still runs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fmc_uia_tpu.models.encoders.resnet import ResNetEncoder
from fmc_uia_tpu.models.encoders.swin import SwinEncoder
from fmc_uia_tpu.models.encoders.vit import ViTBackbone
from fmc_uia_tpu.utils.convert import (
    convert_resnet50,
    convert_swin,
    convert_vit,
    merge_params,
)


def _fake_swin_sd(embed_dim, depths, num_heads, window=7):
    rng = np.random.RandomState(0)
    sd = {}
    sd["patch_embed.proj.weight"] = rng.randn(embed_dim, 3, 4, 4)
    sd["patch_embed.proj.bias"] = rng.randn(embed_dim)
    sd["patch_embed.norm.weight"] = rng.randn(embed_dim)
    sd["patch_embed.norm.bias"] = rng.randn(embed_dim)
    for s, depth in enumerate(depths):
        dim = embed_dim * 2**s
        for b in range(depth):
            p = f"layers.{s}.blocks.{b}"
            sd[f"{p}.norm1.weight"] = rng.randn(dim)
            sd[f"{p}.norm1.bias"] = rng.randn(dim)
            sd[f"{p}.attn.qkv.weight"] = rng.randn(3 * dim, dim)
            sd[f"{p}.attn.qkv.bias"] = rng.randn(3 * dim)
            sd[f"{p}.attn.proj.weight"] = rng.randn(dim, dim)
            sd[f"{p}.attn.proj.bias"] = rng.randn(dim)
            sd[f"{p}.attn.relative_position_bias_table"] = rng.randn(
                (2 * window - 1) ** 2, num_heads[s])
            sd[f"{p}.norm2.weight"] = rng.randn(dim)
            sd[f"{p}.norm2.bias"] = rng.randn(dim)
            sd[f"{p}.mlp.fc1.weight"] = rng.randn(4 * dim, dim)
            sd[f"{p}.mlp.fc1.bias"] = rng.randn(4 * dim)
            sd[f"{p}.mlp.fc2.weight"] = rng.randn(dim, 4 * dim)
            sd[f"{p}.mlp.fc2.bias"] = rng.randn(dim)
        if s < len(depths) - 1:
            sd[f"layers.{s}.downsample.norm.weight"] = rng.randn(4 * dim)
            sd[f"layers.{s}.downsample.norm.bias"] = rng.randn(4 * dim)
            sd[f"layers.{s}.downsample.reduction.weight"] = rng.randn(
                2 * dim, 4 * dim)
    return {k: v.astype(np.float32) for k, v in sd.items()}


def test_swin_conversion_full_coverage():
    depths, heads, dim = (1, 1, 2, 1), (2, 2, 4, 4), 32
    enc = SwinEncoder(embed_dim=dim, depths=depths, num_heads=heads,
                      window_size=7, drop_path_rate=0.0, scan_blocks=False)
    x = jnp.zeros((1, 64, 64, 3))
    variables = enc.init(jax.random.PRNGKey(0), x)
    params = variables["params"]

    sd = _fake_swin_sd(dim, depths, heads)
    converted = convert_swin(sd, depths, scan_blocks=False)
    merged = merge_params(params, converted)

    # converted qkv made it through with the right orientation
    np.testing.assert_allclose(
        np.asarray(merged["stage0_block0"]["attn"]["qkv"]["kernel"]),
        sd["layers.0.blocks.0.attn.qkv.weight"].T)
    # model runs with converted weights
    feats = enc.apply({"params": merged}, x)
    assert feats[0].shape == (1, 16, 16, dim)
    assert np.isfinite(np.asarray(feats[-1])).all()


def _fake_vit_sd(dim, depth, n_tokens, with_cls=True):
    rng = np.random.RandomState(1)
    sd = {
        "patch_embed.proj.weight": rng.randn(dim, 3, 16, 16),
        "patch_embed.proj.bias": rng.randn(dim),
        "pos_embed": rng.randn(1, n_tokens + (1 if with_cls else 0), dim),
    }
    for i in range(depth):
        p = f"blocks.{i}"
        sd[f"{p}.norm1.weight"] = rng.randn(dim)
        sd[f"{p}.norm1.bias"] = rng.randn(dim)
        sd[f"{p}.attn.qkv.weight"] = rng.randn(3 * dim, dim)
        sd[f"{p}.attn.qkv.bias"] = rng.randn(3 * dim)
        sd[f"{p}.attn.proj.weight"] = rng.randn(dim, dim)
        sd[f"{p}.attn.proj.bias"] = rng.randn(dim)
        sd[f"{p}.norm2.weight"] = rng.randn(dim)
        sd[f"{p}.norm2.bias"] = rng.randn(dim)
        sd[f"{p}.mlp.fc1.weight"] = rng.randn(4 * dim, dim)
        sd[f"{p}.mlp.fc1.bias"] = rng.randn(4 * dim)
        sd[f"{p}.mlp.fc2.weight"] = rng.randn(dim, 4 * dim)
        sd[f"{p}.mlp.fc2.bias"] = rng.randn(dim)
    return {k: v.astype(np.float32) for k, v in sd.items()}


def test_vit_conversion_drops_cls_token():
    dim, depth = 64, 4
    enc = ViTBackbone(embed_dim=dim, depth=depth, num_heads=2,
                      patch_size=16, out_indices=(1, 3))
    x = jnp.zeros((1, 64, 64, 3))  # 4x4 = 16 patch tokens
    variables = enc.init(jax.random.PRNGKey(0), x)
    params = variables["params"]

    sd = _fake_vit_sd(dim, depth, n_tokens=16, with_cls=True)
    converted = convert_vit(sd, depth=depth)
    assert converted["pos_embed"].shape == (1, 16, dim)
    merged = merge_params(params, converted)
    feats = enc.apply({"params": merged}, x)
    assert len(feats) == 2 and feats[0].shape == (1, 4, 4, dim)


def _fake_resnet_sd(stage_sizes=(1, 1, 1, 1), width=16):
    rng = np.random.RandomState(2)
    sd = {"conv1.weight": rng.randn(width, 3, 7, 7),
          "bn1.weight": rng.randn(width), "bn1.bias": rng.randn(width)}
    in_ch = width
    for s, blocks in enumerate(stage_sizes):
        w = width * 2**s
        out = w * 4
        for b in range(blocks):
            p = f"layer{s + 1}.{b}"
            sd[f"{p}.conv1.weight"] = rng.randn(w, in_ch, 1, 1)
            sd[f"{p}.bn1.weight"] = rng.randn(w)
            sd[f"{p}.bn1.bias"] = rng.randn(w)
            sd[f"{p}.conv2.weight"] = rng.randn(w, w, 3, 3)
            sd[f"{p}.bn2.weight"] = rng.randn(w)
            sd[f"{p}.bn2.bias"] = rng.randn(w)
            sd[f"{p}.conv3.weight"] = rng.randn(out, w, 1, 1)
            sd[f"{p}.bn3.weight"] = rng.randn(out)
            sd[f"{p}.bn3.bias"] = rng.randn(out)
            if b == 0:
                sd[f"{p}.downsample.0.weight"] = rng.randn(out, in_ch, 1, 1)
                sd[f"{p}.downsample.1.weight"] = rng.randn(out)
                sd[f"{p}.downsample.1.bias"] = rng.randn(out)
            in_ch = out
    return {k: v.astype(np.float32) for k, v in sd.items()}


def test_resnet_conversion():
    enc = ResNetEncoder(stage_sizes=(1, 1, 1, 1), width=16)
    x = jnp.zeros((1, 64, 64, 3))
    variables = enc.init(jax.random.PRNGKey(0), x)
    params = variables["params"]
    sd = _fake_resnet_sd()
    converted = convert_resnet50(sd, stage_sizes=(1, 1, 1, 1))
    merged = merge_params(params, converted)
    feats = enc.apply({"params": merged}, x)
    assert feats[-1].shape[-1] == 16 * 4 * 8


def test_merge_rejects_shape_mismatch():
    cur = {"a": np.zeros((2, 3))}
    with pytest.raises(ValueError):
        merge_params(cur, {"a": np.zeros((3, 2))})
    with pytest.raises(KeyError):
        merge_params(cur, {"b": np.zeros((2, 3))})


def test_swin_conversion_scanned_layout():
    depths, heads, dim = (2, 2, 4, 2), (2, 2, 4, 4), 32
    enc = SwinEncoder(embed_dim=dim, depths=depths, num_heads=heads,
                      window_size=7, drop_path_rate=0.0, scan_blocks=True)
    x = jnp.zeros((1, 64, 64, 3))
    variables = enc.init(jax.random.PRNGKey(0), x)
    params = variables["params"]
    assert "stage2_scan" in params

    sd = _fake_swin_sd(dim, depths, heads)
    from fmc_uia_tpu.utils.convert import convert_swin as _cs
    converted = _cs(sd, depths, scan_blocks=True)
    merged = merge_params(params, converted)
    # pair 1 of stage 2 block0 == timm layers.2.blocks.2
    np.testing.assert_allclose(
        np.asarray(merged["stage2_scan"]["block0"]["attn"]["qkv"]["kernel"][1]),
        sd["layers.2.blocks.2.attn.qkv.weight"].T)
    feats = enc.apply({"params": merged}, x)
    assert np.isfinite(np.asarray(feats[-1])).all()
