"""Numeric validation of the pretrained-weight converters.

Builds faithful torch re-implementations of the timm module semantics
(Swin v1 block math, modern-timm state-dict layout with downsample at the
START of each stage; plain ViT with cls token), exports their state_dicts,
converts with utils/convert.py, and asserts forward parity against our flax
encoders. This validates exactly what conversion can get wrong — tensor
layouts, qkv packing, head ordering, rel-pos indexing, the patch-merge
2x2-chunk order — without requiring timm itself (absent in this env).

timm semantics mirrored here: WindowAttention (qkv reshape
[B,N,3,H,dh].permute(2,0,3,1,4), scale=dh**-0.5, additive rel-pos bias via
the (2w-1)^2 table), SwinTransformerBlock (shift=0 when grid <= window),
PatchMerging chunk order [(h0,w0),(h1,w0),(h0,w1),(h1,w1)], PatchEmbed
conv+LN. Reference for the capability: /root/reference/code/models/
encoders.py:53-59 (pretrained timm backbones).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn

from fmc_uia_tpu.utils.convert import (
    convert_swin,
    convert_vit,
    load_pretrained_encoder,
    merge_params,
)

torch.manual_seed(0)


# --------------------------------------------------------------------------
# torch oracle: timm-semantics Swin
# --------------------------------------------------------------------------
def _rel_pos_index(ws: int) -> torch.Tensor:
    coords = torch.stack(torch.meshgrid(
        torch.arange(ws), torch.arange(ws), indexing="ij"))
    flat = coords.flatten(1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.permute(1, 2, 0).contiguous()
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)


class TorchWindowAttention(nn.Module):
    def __init__(self, dim, num_heads, ws):
        super().__init__()
        self.num_heads = num_heads
        self.ws = ws
        self.scale = (dim // num_heads) ** -0.5
        self.qkv = nn.Linear(dim, dim * 3)
        self.proj = nn.Linear(dim, dim)
        self.relative_position_bias_table = nn.Parameter(
            torch.randn((2 * ws - 1) ** 2, num_heads) * 0.02)
        self.register_buffer("relative_position_index", _rel_pos_index(ws),
                             persistent=False)

    def forward(self, x, mask=None):
        B_, N, C = x.shape
        qkv = self.qkv(x).reshape(
            B_, N, 3, self.num_heads, C // self.num_heads
        ).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q * self.scale) @ k.transpose(-2, -1)
        bias = self.relative_position_bias_table[
            self.relative_position_index.view(-1)
        ].view(N, N, -1).permute(2, 0, 1)
        attn = attn + bias.unsqueeze(0)
        if mask is not None:
            nW = mask.shape[0]
            attn = attn.view(B_ // nW, nW, self.num_heads, N, N)
            attn = attn + mask.unsqueeze(1).unsqueeze(0)
            attn = attn.view(-1, self.num_heads, N, N)
        attn = attn.softmax(dim=-1)
        x = (attn @ v).transpose(1, 2).reshape(B_, N, C)
        return self.proj(x)


def _t_window_partition(x, ws):
    B, H, W, C = x.shape
    x = x.view(B, H // ws, ws, W // ws, ws, C)
    return x.permute(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, C)


def _t_window_reverse(w, ws, H, W):
    C = w.shape[-1]
    B = w.shape[0] // ((H // ws) * (W // ws))
    x = w.view(B, H // ws, W // ws, ws, ws, C)
    return x.permute(0, 1, 3, 2, 4, 5).reshape(B, H, W, C)


class TorchSwinBlock(nn.Module):
    def __init__(self, dim, num_heads, ws, shift):
        super().__init__()
        self.ws, self.shift = ws, shift
        self.norm1 = nn.LayerNorm(dim)
        self.attn = TorchWindowAttention(dim, num_heads, ws)
        self.norm2 = nn.LayerNorm(dim)
        self.mlp = nn.Sequential()
        self.mlp.fc1 = nn.Linear(dim, dim * 4)
        self.mlp.fc2 = nn.Linear(dim * 4, dim)

    def forward(self, x):  # x: [B, H, W, C]
        B, H, W, C = x.shape
        ws = self.ws
        shift = self.shift if min(H, W) > ws else 0  # timm init rule
        y = self.norm1(x)
        if shift:
            y = torch.roll(y, (-shift, -shift), dims=(1, 2))
        mask = None
        if shift:
            img_mask = torch.zeros(H, W)
            cnt = 0
            for hs in (slice(0, -ws), slice(-ws, -shift),
                       slice(-shift, None)):
                for wss in (slice(0, -ws), slice(-ws, -shift),
                            slice(-shift, None)):
                    img_mask[hs, wss] = cnt
                    cnt += 1
            mw = _t_window_partition(
                img_mask.unsqueeze(0).unsqueeze(-1), ws).squeeze(-1)
            mask = (mw.unsqueeze(1) - mw.unsqueeze(2))
            mask = mask.masked_fill(mask != 0, -100.0)
        w = _t_window_partition(y, ws)
        w = self.attn(w, mask)
        y = _t_window_reverse(w, ws, H, W)
        if shift:
            y = torch.roll(y, (shift, shift), dims=(1, 2))
        x = x + y
        y = self.mlp.fc2(torch.nn.functional.gelu(
            self.mlp.fc1(self.norm2(x))))
        return x + y


class TorchPatchMerging(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.norm = nn.LayerNorm(4 * dim)
        self.reduction = nn.Linear(4 * dim, 2 * dim, bias=False)

    def forward(self, x):  # [B, H, W, C] -> [B, H/2, W/2, 2C]
        x0 = x[:, 0::2, 0::2]
        x1 = x[:, 1::2, 0::2]
        x2 = x[:, 0::2, 1::2]
        x3 = x[:, 1::2, 1::2]
        x = torch.cat([x0, x1, x2, x3], -1)  # timm chunk order
        return self.reduction(self.norm(x))


class TorchSwinStage(nn.Module):
    def __init__(self, dim, depth, num_heads, ws, downsample):
        super().__init__()
        self.downsample = (TorchPatchMerging(dim // 2) if downsample
                           else nn.Identity())
        self.blocks = nn.ModuleList([
            TorchSwinBlock(dim, num_heads, ws,
                           0 if b % 2 == 0 else ws // 2)
            for b in range(depth)
        ])

    def forward(self, x):
        x = self.downsample(x)
        for blk in self.blocks:
            x = blk(x)
        return x


class TorchTinySwin(nn.Module):
    """Modern-timm layout: layers.{i}.downsample at the START of stage i."""

    def __init__(self, embed_dim=16, depths=(2, 2, 2, 2),
                 num_heads=(2, 2, 2, 2), ws=7):
        super().__init__()
        self.patch_embed = nn.Sequential()
        self.patch_embed.proj = nn.Conv2d(3, embed_dim, 4, stride=4)
        self.patch_embed.norm = nn.LayerNorm(embed_dim)
        self.layers = nn.ModuleList([
            TorchSwinStage(embed_dim * 2 ** i, depths[i], num_heads[i],
                           ws, downsample=i > 0)
            for i in range(len(depths))
        ])

    def forward(self, x):  # NCHW in, NHWC features out
        x = self.patch_embed.proj(x).permute(0, 2, 3, 1)
        x = self.patch_embed.norm(x)
        feats = []
        for layer in self.layers:
            x = layer(x)
            feats.append(x)
        return feats


@pytest.mark.parametrize("scan_blocks", [True, False])
def test_swin_conversion_forward_parity(scan_blocks):
    from fmc_uia_tpu.models.encoders.swin import SwinEncoder

    torch.manual_seed(1)
    tm = TorchTinySwin().eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

    enc = SwinEncoder(embed_dim=16, depths=(2, 2, 2, 2),
                      num_heads=(2, 2, 2, 2), window_size=7,
                      drop_path_rate=0.0, scan_blocks=scan_blocks,
                      dtype=jnp.float32)
    # 224^2: stride-4..32 grids 56/28/14/7 — no padding, stage-3 grid ==
    # window (exercises the shift->0 rule on both sides)
    x = np.random.RandomState(0).rand(2, 224, 224, 3).astype(np.float32)
    variables = enc.init(jax.random.PRNGKey(0), jnp.asarray(x))
    converted = convert_swin(sd, depths=(2, 2, 2, 2),
                             scan_blocks=scan_blocks)
    params = merge_params(variables["params"], converted)

    got = enc.apply({"params": params}, jnp.asarray(x))
    with torch.no_grad():
        want = tm(torch.from_numpy(x).permute(0, 3, 1, 2))
    assert len(got) == 4
    for stage, (g, w) in enumerate(zip(got, want)):
        np.testing.assert_allclose(
            np.asarray(g), w.numpy(), atol=1e-3, rtol=5e-3,
            err_msg=f"stage {stage} diverged")


# --------------------------------------------------------------------------
# torch oracle: timm-semantics plain ViT (cls token)
# --------------------------------------------------------------------------
class TorchViTBlock(nn.Module):
    def __init__(self, dim, num_heads):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.attn = nn.Module()
        self.attn.qkv = nn.Linear(dim, 3 * dim)
        self.attn.proj = nn.Linear(dim, dim)
        self.num_heads = num_heads
        self.norm2 = nn.LayerNorm(dim)
        self.mlp = nn.Module()
        self.mlp.fc1 = nn.Linear(dim, dim * 4)
        self.mlp.fc2 = nn.Linear(dim * 4, dim)

    def forward(self, x):
        B, N, C = x.shape
        H = self.num_heads
        qkv = self.attn.qkv(self.norm1(x)).reshape(
            B, N, 3, H, C // H).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        a = ((q * (C // H) ** -0.5) @ k.transpose(-2, -1)).softmax(-1)
        o = (a @ v).transpose(1, 2).reshape(B, N, C)
        x = x + self.attn.proj(o)
        return x + self.mlp.fc2(torch.nn.functional.gelu(
            self.mlp.fc1(self.norm2(x))))


class TorchTinyViT(nn.Module):
    def __init__(self, dim=32, depth=4, num_heads=2, patch=16, img=64):
        super().__init__()
        n = (img // patch) ** 2
        self.cls_token = nn.Parameter(torch.randn(1, 1, dim) * 0.02)
        self.pos_embed = nn.Parameter(torch.randn(1, n + 1, dim) * 0.02)
        self.patch_embed = nn.Module()
        self.patch_embed.proj = nn.Conv2d(3, dim, patch, stride=patch)
        self.blocks = nn.ModuleList(
            [TorchViTBlock(dim, num_heads) for _ in range(depth)])

    def forward(self, x):
        B = x.shape[0]
        x = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        x = torch.cat([self.cls_token.expand(B, -1, -1), x], dim=1)
        x = x + self.pos_embed
        outs = []
        for blk in self.blocks:
            x = blk(x)
            outs.append(x[:, 1:, :])
        return outs


def test_vit_conversion_forward_parity():
    from fmc_uia_tpu.models.encoders.vit import ViTBackbone

    torch.manual_seed(2)
    tm = TorchTinyViT().eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

    bb = ViTBackbone(embed_dim=32, depth=4, num_heads=2, patch_size=16,
                     out_indices=(0, 1, 2, 3), num_prefix_tokens=1,
                     dtype=jnp.float32)
    x = np.random.RandomState(1).rand(2, 64, 64, 3).astype(np.float32)
    variables = bb.init(jax.random.PRNGKey(0), jnp.asarray(x))
    converted = convert_vit(sd, depth=4, keep_prefix_tokens=True)
    params = merge_params(variables["params"], converted)

    got = bb.apply({"params": params}, jnp.asarray(x))
    with torch.no_grad():
        want = tm(torch.from_numpy(x).permute(0, 3, 1, 2))
    gh = 64 // 16
    for i, (g, w) in enumerate(zip(got, want)):
        np.testing.assert_allclose(
            np.asarray(g).reshape(2, gh * gh, 32), w.numpy(),
            atol=1e-3, rtol=5e-3, err_msg=f"block {i} diverged")


def test_vit_pos_embed_interpolation_roundtrip():
    """Loading a 64^2-trained ViT at 128^2 resamples the pos grid."""
    from fmc_uia_tpu.models.encoders.vit import ViTBackbone

    torch.manual_seed(3)
    tm = TorchTinyViT().eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    bb = ViTBackbone(embed_dim=32, depth=4, num_heads=2, patch_size=16,
                     out_indices=(3,), num_prefix_tokens=1,
                     dtype=jnp.float32)
    x = jnp.zeros((1, 128, 128, 3), jnp.float32)
    variables = bb.init(jax.random.PRNGKey(0), x)
    converted = convert_vit(sd, depth=4, keep_prefix_tokens=True,
                            target_grid=8)
    params = merge_params(variables["params"], converted)
    out = bb.apply({"params": params}, x)
    assert np.asarray(out[0]).shape == (1, 8, 8, 32)


def test_load_pretrained_encoder_end_to_end(tmp_path):
    """config-path surface: save a torch checkpoint, load via the fit()
    helper, assert the params actually changed to the checkpoint values."""
    from fmc_uia_tpu.models.encoders.swin import SwinEncoder

    torch.manual_seed(4)
    tm = TorchTinySwin(embed_dim=16, depths=(2, 2, 2, 2)).eval()
    path = str(tmp_path / "tiny_swin.pth")
    torch.save(tm.state_dict(), path)

    enc = SwinEncoder(embed_dim=16, depths=(2, 2, 2, 2),
                      num_heads=(2, 2, 2, 2), window_size=7,
                      drop_path_rate=0.0, scan_blocks=True,
                      dtype=jnp.float32)
    variables = enc.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 112, 112, 3), jnp.float32))
    loaded = load_pretrained_encoder("swin_custom", path,
                                     variables["params"])
    # patch-embed kernel now equals the checkpoint's (HWIO-transposed)
    want = tm.patch_embed.proj.weight.detach().numpy().transpose(2, 3, 1, 0)
    np.testing.assert_allclose(
        np.asarray(loaded["patch_embed"]["kernel"]), want, rtol=1e-6)
    # and a scanned block kernel too (stacked leading pair axis)
    got_qkv = np.asarray(
        loaded["stage0_scan"]["block0"]["attn"]["qkv"]["kernel"])
    want_qkv = tm.layers[0].blocks[0].attn.qkv.weight.detach().numpy().T
    np.testing.assert_allclose(got_qkv[0], want_qkv, rtol=1e-6)


# --------------------------------------------------------------------------
# torch oracle: DINOv3 (axial RoPE + LayerScale + cls/storage tokens),
# official facebookresearch/dinov3 checkpoint naming
# --------------------------------------------------------------------------
class TorchDinoBlock(nn.Module):
    def __init__(self, dim, num_heads):
        super().__init__()
        self.num_heads = num_heads
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = nn.Module()
        self.attn.qkv = nn.Linear(dim, 3 * dim)
        self.attn.proj = nn.Linear(dim, dim)
        self.ls1 = nn.Module()
        self.ls1.gamma = nn.Parameter(torch.randn(dim) * 0.1)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = nn.Module()
        self.mlp.fc1 = nn.Linear(dim, dim * 4)
        self.mlp.fc2 = nn.Linear(dim * 4, dim)
        self.ls2 = nn.Module()
        self.ls2.gamma = nn.Parameter(torch.randn(dim) * 0.1)

    @staticmethod
    def _rot_half(t):
        h = t.shape[-1] // 2
        return torch.cat([-t[..., h:], t[..., :h]], dim=-1)

    def forward(self, x, sin, cos):
        B, N, C = x.shape
        H = self.num_heads
        qkv = self.attn.qkv(self.norm1(x)).reshape(
            B, N, 3, H, C // H).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]  # [B, H, N, dh]
        s, c = sin[None, None], cos[None, None]
        q = q * c + self._rot_half(q) * s
        k = k * c + self._rot_half(k) * s
        a = ((q * (C // H) ** -0.5) @ k.transpose(-2, -1)).softmax(-1)
        o = (a @ v).transpose(1, 2).reshape(B, N, C)
        x = x + self.ls1.gamma * self.attn.proj(o)
        y = self.mlp.fc2(torch.nn.functional.gelu(self.mlp.fc1(
            self.norm2(x))))
        return x + self.ls2.gamma * y


class TorchTinyDino(nn.Module):
    """Official dinov3 naming: cls_token, storage_tokens, mask_token,
    rope_embed.periods, blocks.N.{ls1,ls2}.gamma, final norm."""

    def __init__(self, dim=64, depth=3, num_heads=2, patch=16, img=64,
                 n_storage=4, base=100.0):
        super().__init__()
        self.dim, self.num_heads, self.patch = dim, num_heads, patch
        self.cls_token = nn.Parameter(torch.randn(1, 1, dim) * 0.02)
        self.storage_tokens = nn.Parameter(
            torch.randn(1, n_storage, dim) * 0.02)
        self.mask_token = nn.Parameter(torch.zeros(1, dim))
        self.patch_embed = nn.Module()
        self.patch_embed.proj = nn.Conv2d(3, dim, patch, stride=patch)
        dh = dim // num_heads
        self.rope_embed = nn.Module()
        k = torch.arange(dh // 4, dtype=torch.float32)
        self.rope_embed.register_buffer(
            "periods", base ** (2 * k / (dh // 2)))
        self.blocks = nn.ModuleList(
            [TorchDinoBlock(dim, num_heads) for _ in range(depth)])
        self.norm = nn.LayerNorm(dim, eps=1e-6)  # dropped by the converter

    def _sincos(self, gh, gw, P):
        ys = (torch.arange(gh, dtype=torch.float32) + 0.5) / gh * 2 - 1
        xs = (torch.arange(gw, dtype=torch.float32) + 0.5) / gw * 2 - 1
        yy = ys.repeat_interleave(gw)
        xx = xs.repeat(gh)
        coords = torch.stack([yy, xx], dim=-1)  # [N, 2]
        ang = 2 * math.pi * coords[:, :, None] / self.rope_embed.periods
        ang = ang.reshape(gh * gw, -1)
        ang = torch.cat([ang, ang], dim=-1)
        sin, cos = ang.sin(), ang.cos()
        sin = torch.cat([torch.zeros(P, sin.shape[-1]), sin], 0)
        cos = torch.cat([torch.ones(P, cos.shape[-1]), cos], 0)
        return sin, cos

    def forward(self, x):
        B = x.shape[0]
        gh, gw = x.shape[-2] // self.patch, x.shape[-1] // self.patch
        x = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        P = 1 + self.storage_tokens.shape[1]
        x = torch.cat([self.cls_token.expand(B, -1, -1),
                       self.storage_tokens.expand(B, -1, -1), x], dim=1)
        sin, cos = self._sincos(gh, gw, P)
        outs = []
        for blk in self.blocks:
            x = blk(x, sin, cos)
            outs.append(x[:, P:, :])
        return outs


def test_dinov3_conversion_forward_parity():
    from fmc_uia_tpu.models.encoders.vit import ViTBackbone
    from fmc_uia_tpu.utils.convert import convert_dinov3

    torch.manual_seed(5)
    tm = TorchTinyDino().eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

    bb = ViTBackbone(embed_dim=64, depth=3, num_heads=2, patch_size=16,
                     out_indices=(0, 1, 2), rope=True, num_storage_tokens=4,
                     layerscale=True, dtype=jnp.float32)
    x = np.random.RandomState(7).rand(2, 64, 64, 3).astype(np.float32)
    variables = bb.init(jax.random.PRNGKey(0), jnp.asarray(x))
    converted = convert_dinov3(sd)
    params = merge_params(variables["params"], converted)
    # the checkpoint's periods buffer was loaded verbatim
    np.testing.assert_allclose(np.asarray(params["rope_periods"]),
                               tm.rope_embed.periods.numpy(), rtol=1e-6)

    got = bb.apply({"params": params}, jnp.asarray(x))
    with torch.no_grad():
        want = tm(torch.from_numpy(x).permute(0, 3, 1, 2))
    for i, (g, w) in enumerate(zip(got, want)):
        np.testing.assert_allclose(
            np.asarray(g).reshape(2, 16, 64), w.numpy(),
            atol=2e-3, rtol=5e-3, err_msg=f"dino block {i} diverged")


def test_dinov3_load_pretrained_encoder_end_to_end(tmp_path):
    """Full config-path surface for the dinov3 route of
    load_pretrained_encoder (backbone subtree + storage-token check)."""
    from fmc_uia_tpu.models.encoders.vit import ViTMultiScaleEncoder

    torch.manual_seed(6)
    tm = TorchTinyDino().eval()
    path = str(tmp_path / "tiny_dino.pth")
    torch.save(tm.state_dict(), path)

    enc = ViTMultiScaleEncoder(
        embed_dim=64, depth=3, num_heads=2, patch_size=16,
        out_indices=(0, 1, 2), adapter_type="resize", adapter_channels=32,
        rope=True, num_storage_tokens=4, layerscale=True)
    variables = enc.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 64, 64, 3), jnp.float32), False)
    loaded = load_pretrained_encoder("dinov3", path, variables["params"])
    want = tm.patch_embed.proj.weight.detach().numpy().transpose(2, 3, 1, 0)
    np.testing.assert_allclose(
        np.asarray(loaded["backbone"]["patch_embed"]["kernel"]), want,
        rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(loaded["backbone"]["block1"]["ls1"]),
        tm.blocks[1].ls1.gamma.detach().numpy(), rtol=1e-6)


def test_resnet_bn_to_gn_preserved_quantities():
    """BN->GN conversion preserves EXACTLY the conv kernels (layout-
    transposed) and the affine scale/bias; what changes is only the
    normalization statistics (running stats dropped, per-sample GN stats
    instead) — pin the preserved part numerically (VERDICT r3 item 10)."""
    from fmc_uia_tpu.models.encoders.resnet import ResNetEncoder
    from fmc_uia_tpu.utils.convert import convert_resnet50
    from fmc_uia_tpu.utils.timm_manifests import resnet50_manifest

    rng = np.random.RandomState(0)
    sd = {}
    for k, shape in resnet50_manifest().items():
        if k.endswith("running_var"):
            sd[k] = np.abs(rng.randn(*shape)).astype(np.float32) + 0.5
        else:
            sd[k] = rng.randn(*shape).astype(np.float32)
    converted = convert_resnet50(sd)

    # stem: conv kernel transposed OIHW->HWIO, bn affine -> gn affine
    np.testing.assert_array_equal(
        converted["stem_conv"]["kernel"],
        sd["conv1.weight"].transpose(2, 3, 1, 0))
    np.testing.assert_array_equal(converted["GroupNorm_0"]["scale"],
                                  sd["bn1.weight"])
    np.testing.assert_array_equal(converted["GroupNorm_0"]["bias"],
                                  sd["bn1.bias"])
    # a deep block incl. the downsample projection
    b = converted["stage2_block0"]
    np.testing.assert_array_equal(
        b["Conv_1"]["kernel"], sd["layer3.0.conv2.weight"]
        .transpose(2, 3, 1, 0))
    np.testing.assert_array_equal(b["GroupNorm_2"]["scale"],
                                  sd["layer3.0.bn3.weight"])
    np.testing.assert_array_equal(
        b["proj"]["kernel"], sd["layer3.0.downsample.0.weight"]
        .transpose(2, 3, 1, 0))
    # nothing BN-statistical leaked into the GN tree
    flat = []

    def walk(t, p=""):
        for k, v in t.items():
            (walk(v, f"{p}/{k}") if isinstance(v, dict)
             else flat.append(f"{p}/{k}"))

    walk(converted)
    assert not [p for p in flat if "running" in p]
    # and the model accepts the tree end-to-end (shape-validated merge)
    enc = ResNetEncoder()
    variables = jax.eval_shape(
        lambda k, x: enc.init(k, x), jax.random.PRNGKey(0),
        jnp.zeros((1, 64, 64, 3), jnp.float32))
    tree = jax.tree_util.tree_map(
        lambda s: np.zeros(s.shape, np.float32), variables["params"])
    merge_params(tree, converted)


@pytest.mark.parametrize("family", ["swin", "vit", "dinov3"])
def test_verify_checkpoint_cli(tmp_path, family):
    """`python -m fmc_uia_tpu.utils.convert --verify FILE` passes on a
    manifest-shaped file and fails on a corrupted one."""
    from fmc_uia_tpu.utils import timm_manifests as M
    from fmc_uia_tpu.utils.convert import verify_checkpoint

    rng = np.random.RandomState(1)
    if family == "swin":
        man = M.swin_manifest(embed_dim=16, depths=(2, 2), num_heads=(2, 2),
                              window=7, num_classes=4)
        size = 112
    elif family == "vit":
        man = M.vit_manifest(embed_dim=32, depth=2, patch=16, img_size=64,
                             num_classes=4)
        size = 64
    else:
        man = M.dinov3_manifest(embed_dim=32, depth=2, num_heads=2)
        size = 64
    sd = {}
    for k, shape in man.items():
        if k.endswith("relative_position_index"):
            sd[k] = torch.zeros(shape, dtype=torch.int64)
        else:
            sd[k] = torch.from_numpy(
                rng.randn(*shape).astype(np.float32) * 0.05)
    good = str(tmp_path / f"{family}.pth")
    torch.save(sd, good)
    assert verify_checkpoint(good, image_size=size)

    key = {"swin": "layers.0.blocks.0.attn.qkv.weight",
           "vit": "blocks.0.attn.qkv.weight",
           "dinov3": "blocks.0.attn.qkv.weight"}[family]
    sd[key] = sd[key][:, :-1]  # corrupt a shape
    bad = str(tmp_path / f"{family}_bad.pth")
    torch.save(sd, bad)
    assert not verify_checkpoint(bad, image_size=size)
