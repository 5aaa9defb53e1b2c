"""Encoder family tests: Swin, ViT (+adapters), grid sampling parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from fmc_uia_tpu.models.encoders.swin import SwinEncoder, build_swin
from fmc_uia_tpu.models.encoders.vit import ViTMultiScaleEncoder
from fmc_uia_tpu.ops.sampling import grid_sample_bilinear
from tests.helpers import make_tiny_config


def _check_pyramid(features, B, S, channels):
    assert len(features) == 4
    for i, (f, c) in enumerate(zip(features, channels)):
        stride = 4 * (2**i)
        assert f.shape == (B, S // stride, S // stride, c), (i, f.shape)


def test_swin_nano_divisible():
    """Window 4 on a 64^2 input: every stage grid divides the window —
    pure no-padding path (input must be stride-32 divisible, same contract
    as the reference's timm-Swin + SMP-FPN stack)."""
    enc = SwinEncoder(embed_dim=32, depths=(1, 1, 1, 1),
                      num_heads=(2, 2, 4, 4), window_size=4,
                      drop_path_rate=0.0)
    x = jnp.zeros((2, 64, 64, 3))
    variables = enc.init(jax.random.PRNGKey(0), x)
    feats = enc.apply(variables, x)
    _check_pyramid(feats, 2, 64, enc.out_channels)


def test_swin_nano_padded_windows():
    """64/4 = 16, 16 % 7 != 0: exercises pad + shift-mask path."""
    enc = build_swin("swin_nano", None)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 3))
    variables = enc.init(jax.random.PRNGKey(0), x)
    feats = enc.apply(variables, x)
    _check_pyramid(feats, 1, 64, enc.out_channels)
    for f in feats:
        assert np.isfinite(np.asarray(f)).all()


def test_swin_b_config():
    enc = build_swin("swin_b", make_tiny_config())
    assert enc.embed_dim == 128
    assert enc.depths == (2, 2, 18, 2)
    assert enc.out_channels == (128, 256, 512, 1024)


def test_swin_shift_changes_output():
    """Shifted vs non-shifted window masks produce different programs —
    check gradient flows and output is deterministic."""
    enc = SwinEncoder(embed_dim=32, depths=(2,), num_heads=(2,),
                      window_size=4, drop_path_rate=0.0)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 32, 32, 3))
    variables = enc.init(jax.random.PRNGKey(0), x)
    f1 = enc.apply(variables, x)
    f2 = enc.apply(variables, x)
    np.testing.assert_array_equal(np.asarray(f1[0]), np.asarray(f2[0]))


def test_vit_resize_adapter():
    enc = ViTMultiScaleEncoder(
        embed_dim=64, depth=4, num_heads=2, patch_size=16,
        out_indices=(0, 1, 2, 3), adapter_type="resize",
        adapter_channels=48)
    x = jnp.zeros((2, 64, 64, 3))
    variables = enc.init(jax.random.PRNGKey(0), x)
    feats = enc.apply(variables, x)
    _check_pyramid(feats, 2, 64, (48, 48, 48, 48))


def test_vit_spm_interaction_adapter():
    enc = ViTMultiScaleEncoder(
        embed_dim=64, depth=4, num_heads=2, patch_size=16,
        out_indices=(0, 1, 2, 3), adapter_type="spm_interaction",
        adapter_channels=32, spm_stem_channels=16,
        interaction_heads=4, interaction_points=2)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 64, 64, 3))
    variables = enc.init(jax.random.PRNGKey(0), x)
    feats = enc.apply(variables, x)
    _check_pyramid(feats, 1, 64, (32, 32, 32, 32))
    for f in feats:
        assert np.isfinite(np.asarray(f)).all()


def test_grid_sample_matches_torch():
    rng = np.random.RandomState(0)
    img = rng.randn(2, 7, 9, 3).astype(np.float32)
    coords = rng.uniform(-1.3, 1.3, (2, 5, 6, 2)).astype(np.float32)

    ours = np.asarray(grid_sample_bilinear(jnp.asarray(img),
                                           jnp.asarray(coords)))
    ref = F.grid_sample(
        torch.tensor(img).permute(0, 3, 1, 2),
        torch.tensor(coords),
        mode="bilinear", padding_mode="zeros", align_corners=False,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_encoder_dispatch():
    from fmc_uia_tpu.models.encoders import build_encoder
    cfg = make_tiny_config(model={"encoder": {"name": "swin_nano"}})
    assert isinstance(build_encoder(cfg), SwinEncoder)
    cfg = make_tiny_config(model={"encoder": {"name": "vit_nano"}})
    assert isinstance(build_encoder(cfg), ViTMultiScaleEncoder)
    cfg = make_tiny_config(model={"encoder": {
        "name": "dinov3", "timm_name": "vit_large_patch16_dinov3",
        "out_indices": [0, 1, 2, 3],
        "adapter": {"type": "spm_interaction", "channels": 64},
    }})
    enc = build_encoder(cfg)
    assert enc.adapter_type == "spm_interaction"
    assert enc.embed_dim == 1024
    with pytest.raises(ValueError):
        build_encoder(make_tiny_config(model={"encoder": {"name": "nope"}}))


def test_freeze_dino_labels():
    from fmc_uia_tpu.train import label_params
    params = {"model": {
        "encoder": {"backbone": {"w": np.zeros(1)},
                     "adapter": {"w": np.zeros(1)}},
        "fpn_seg": {"w": np.zeros(1)},
    }}
    labels = label_params(params, freeze_backbone=True)
    assert labels["model"]["encoder"]["backbone"]["w"] == "frozen"
    assert labels["model"]["encoder"]["adapter"]["w"] == "encoder"
    assert labels["model"]["fpn_seg"]["w"] == "head"


def test_softmax_bf16_close_to_f32_scores():
    """bf16 score/softmax path: same module, small numeric drift only."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fmc_uia_tpu.models.encoders.swin import SwinEncoder

    x = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3),
                    jnp.float32)
    outs = {}
    for flag in (False, True):
        enc = SwinEncoder(embed_dim=32, depths=(1, 1, 1, 1),
                          num_heads=(2, 2, 4, 4), window_size=8,
                          drop_path_rate=0.0, scan_blocks=False,
                          softmax_bf16=flag, dtype=jnp.bfloat16)
        variables = enc.init(jax.random.PRNGKey(0), x)
        outs[flag] = enc.apply(variables, x)
    for f_out, b_out in zip(outs[False], outs[True]):
        a = np.asarray(f_out, np.float32)
        b = np.asarray(b_out, np.float32)
        denom = np.maximum(np.abs(a), 1e-3)
        assert np.median(np.abs(a - b) / denom) < 0.05


def test_ln_bf16_close_to_f32_layernorm():
    """bf16 LayerNorm outputs (stats stay f32 in flax): bounded drift vs
    the f32-LN path on identical params."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fmc_uia_tpu.models.encoders.swin import SwinEncoder

    x = jnp.asarray(np.random.RandomState(1).rand(2, 64, 64, 3),
                    jnp.float32)
    outs = {}
    variables = None
    for flag in (False, True):
        enc = SwinEncoder(embed_dim=32, depths=(1, 1, 1, 1),
                          num_heads=(2, 2, 4, 4), window_size=8,
                          drop_path_rate=0.0, scan_blocks=False,
                          ln_bf16=flag, dtype=jnp.bfloat16)
        if variables is None:
            variables = enc.init(jax.random.PRNGKey(0), x)
        outs[flag] = enc.apply(variables, x)
    for f_out, b_out in zip(outs[False], outs[True]):
        a = np.asarray(f_out, np.float32)
        b = np.asarray(b_out, np.float32)
        denom = np.maximum(np.abs(a), 1e-3)
        assert np.median(np.abs(a - b) / denom) < 0.05


def test_fused_block_matches_xla_path():
    """Fused Pallas attention branch (interpret mode on CPU): identical
    param tree and near-identical numerics vs the XLA path, fwd + grad.
    64^2 input exercises shift masks (stage-0 grid 16 > ws) and pad masks
    (stage-2 grid 4 < ws=8)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fmc_uia_tpu.models.encoders.swin import SwinEncoder

    kw = dict(embed_dim=32, depths=(2, 1, 1, 1), num_heads=(2, 2, 4, 4),
              window_size=8, drop_path_rate=0.0, scan_blocks=False,
              dtype=jnp.float32)
    enc_x = SwinEncoder(fused_block=False, **kw)
    enc_f = SwinEncoder(fused_block=True, fused_mlp=True, **kw)

    x = jnp.asarray(np.random.RandomState(7).rand(1, 64, 64, 3),
                    jnp.float32)
    vx = enc_x.init(jax.random.PRNGKey(0), x)
    vf = enc_f.init(jax.random.PRNGKey(0), x)
    assert (jax.tree_util.tree_structure(vx)
            == jax.tree_util.tree_structure(vf)), "param tree diverged"

    outs_x = enc_x.apply(vx, x)
    outs_f = enc_f.apply(vx, x)  # same params on both paths
    for a, b in zip(outs_x, outs_f):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-3, atol=2e-3)

    def loss(params, mod):
        return sum(jnp.sum(o.astype(jnp.float32) ** 2)
                   for o in mod.apply({"params": params}, x))

    gx = jax.grad(lambda p: loss(p, enc_x))(vx["params"])
    gf = jax.grad(lambda p: loss(p, enc_f))(vx["params"])
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_flatten_with_path(gx)[0],
            jax.tree_util.tree_flatten_with_path(gf)[0]):
        a = np.asarray(a)
        b = np.asarray(b)
        scale = max(np.abs(a).max(), 1e-3)
        assert np.max(np.abs(a - b)) / scale < 5e-3, (
            jax.tree_util.keystr(pa), np.max(np.abs(a - b)), scale)


def test_fused_bwd_analytic_matches_vjp():
    """The hand-written analytic pullback of the fused attention branch
    (FMC_FUSED_BWD=analytic, the default) matches the recompute-jax.vjp
    kernel on every gradient, with and without a shift mask (f32,
    interpret mode)."""
    import os

    import jax
    import jax.numpy as jnp
    import numpy as np

    from fmc_uia_tpu.ops.swin_block_pallas import fused_attention_branch

    rng = np.random.RandomState(3)
    B, Hp, Wp, C, H, ws = 2, 16, 16, 16, 2, 4
    N = ws * ws
    nW = (Hp // ws) * (Wp // ws)
    x = jnp.asarray(rng.randn(B, Hp, Wp, C), jnp.float32)
    lns = jnp.asarray(rng.randn(C), jnp.float32)
    lnb = jnp.asarray(rng.randn(C), jnp.float32)
    wqkv = jnp.asarray(rng.randn(C, 3 * C) * 0.1, jnp.float32)
    bqkv = jnp.asarray(rng.randn(3 * C) * 0.1, jnp.float32)
    wproj = jnp.asarray(rng.randn(C, C) * 0.1, jnp.float32)
    bproj = jnp.asarray(rng.randn(C) * 0.1, jnp.float32)
    bias = jnp.asarray(rng.randn(H, N, N) * 0.1, jnp.float32)
    mask = jnp.asarray(
        np.where(rng.rand(nW, N, N) > 0.8, -100.0, 0.0), jnp.float32)

    for m in (None, mask):
        def loss(*a):
            y = fused_attention_branch(*a, m, num_heads=H)
            return jnp.sum(y.astype(jnp.float32) ** 2)

        args = (x, lns, lnb, wqkv, bqkv, wproj, bproj, bias)
        prev = os.environ.get("FMC_FUSED_BWD")
        try:
            os.environ["FMC_FUSED_BWD"] = "vjp"
            g_vjp = jax.grad(loss, argnums=tuple(range(8)))(*args)
            os.environ["FMC_FUSED_BWD"] = "analytic"
            g_an = jax.grad(loss, argnums=tuple(range(8)))(*args)
        finally:
            if prev is None:
                os.environ.pop("FMC_FUSED_BWD", None)
            else:
                os.environ["FMC_FUSED_BWD"] = prev
        for i, (a, b) in enumerate(zip(g_vjp, g_an)):
            a = np.asarray(a, np.float32)
            b = np.asarray(b, np.float32)
            scale = max(np.abs(a).max(), 1e-6)
            assert np.max(np.abs(a - b)) / scale < 1e-4, (i, m is not None)


def test_fused_mlp_bwd_analytic_matches_vjp():
    """The analytic MLP pullback (FMC_FUSED_BWD=analytic, default) matches
    the recompute-jax.vjp kernel on every gradient (f32, interpret mode)."""
    import os

    import jax
    import jax.numpy as jnp
    import numpy as np

    from fmc_uia_tpu.ops.swin_block_pallas import _fused_mlp

    rng = np.random.RandomState(0)
    T, C = 512, 16
    Ch = 4 * C
    x = jnp.asarray(rng.randn(T, C), jnp.float32)
    lns = jnp.asarray(rng.randn(C), jnp.float32)
    lnb = jnp.asarray(rng.randn(C), jnp.float32)
    w1 = jnp.asarray(rng.randn(C, Ch) * 0.2, jnp.float32)
    b1 = jnp.asarray(rng.randn(Ch) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.randn(Ch, C) * 0.2, jnp.float32)
    b2 = jnp.asarray(rng.randn(C) * 0.1, jnp.float32)

    dp = jnp.ones((1, 1), jnp.float32)  # hw=T: one sample

    def loss(*a):
        return jnp.sum(_fused_mlp(*a, dp, T).astype(jnp.float32) ** 2)

    args = (x, lns, lnb, w1, b1, w2, b2)
    prev = os.environ.get("FMC_FUSED_BWD")
    try:
        os.environ["FMC_FUSED_BWD"] = "vjp"
        g_vjp = jax.grad(loss, argnums=tuple(range(7)))(*args)
        os.environ["FMC_FUSED_BWD"] = "analytic"
        g_an = jax.grad(loss, argnums=tuple(range(7)))(*args)
    finally:
        if prev is None:
            os.environ.pop("FMC_FUSED_BWD", None)
        else:
            os.environ["FMC_FUSED_BWD"] = prev
    for i, (a, b) in enumerate(zip(g_vjp, g_an)):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        assert np.max(np.abs(a - b)) / max(np.abs(a).max(), 1e-6) < 1e-5, i


def test_patch_merging_sliced_matches_transpose_formulation():
    """The sliced PatchMerging (4 strided slices + 4 partial matmuls) is
    numerically equivalent to concat->LN->Dense on the SAME param tree,
    in f32 exactly-ish and in bf16 within drift tolerance."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fmc_uia_tpu.models.encoders.swin import PatchMerging

    rs = np.random.RandomState(0)
    x32 = jnp.asarray(rs.randn(2, 16, 16, 32), jnp.float32)
    for dtype, tol in ((jnp.float32, 2e-5), (jnp.bfloat16, 0.05)):
        x = x32.astype(dtype)
        ref = PatchMerging(sliced=False, ln_bf16=dtype == jnp.bfloat16,
                           dtype=dtype)
        new = PatchMerging(sliced=True, ln_bf16=dtype == jnp.bfloat16,
                           dtype=dtype)
        variables = ref.init(jax.random.PRNGKey(0), x)
        # identical param tree: the same variables apply to both
        a = np.asarray(ref.apply(variables, x), np.float32)
        b = np.asarray(new.apply(variables, x), np.float32)
        denom = np.maximum(np.abs(a), 1e-3)
        err = np.abs(a - b) / denom
        assert np.median(err) < tol, (dtype, np.median(err))
        assert a.shape == b.shape == (2, 8, 8, 64)


def test_fused_droppath_fold_matches_xla_path():
    """Residual + per-sample drop-path folded INTO the fused kernels (r3):
    with stochastic depth ACTIVE (train=True, rate>0), the fused path must
    match the XLA path — DropPath rng keys are module-path-derived, so
    both paths draw identical masks."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fmc_uia_tpu.models.encoders.swin import SwinEncoder

    x = jnp.asarray(np.random.RandomState(7).rand(3, 64, 64, 3),
                    jnp.float32)
    outs = {}
    variables = None
    for fused in (False, True):
        enc = SwinEncoder(embed_dim=32, depths=(2, 1, 1, 1),
                          num_heads=(2, 2, 4, 4), window_size=8,
                          drop_path_rate=0.5, scan_blocks=False,
                          ln_bf16=True, softmax_bf16=True,
                          fused_block=fused, fused_mlp=fused,
                          dtype=jnp.bfloat16)
        if variables is None:
            variables = enc.init(jax.random.PRNGKey(0), x)
        outs[fused] = enc.apply(
            variables, x, train=True,
            rngs={"dropout": jax.random.PRNGKey(3)})
    for f_out, p_out in zip(outs[False], outs[True]):
        a = np.asarray(f_out, np.float32)
        b = np.asarray(p_out, np.float32)
        denom = np.maximum(np.abs(a), 1e-2)
        assert np.median(np.abs(a - b) / denom) < 0.05
    # the mask actually dropped someone at rate 0.5 over 3 samples x 5
    # blocks with overwhelming probability; sanity-check non-triviality:
    # fused and unfused agree on WHICH samples were zero-scaled, which
    # only happens if both consumed the same bernoulli draws.
