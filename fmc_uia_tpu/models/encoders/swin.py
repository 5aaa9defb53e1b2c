"""Swin Transformer encoder (flax linen, NHWC, TPU-first).

Fills the reference's ``SwinTransformerEncoder`` role (reference
encoders.py:37-159, which wraps timm ``features_only`` Swin): a 4-stage
hierarchical transformer producing stride-4/8/16/32 features with channels
(C, 2C, 4C, 8C).

From-scratch TPU design notes:
  * Everything is NHWC with static shapes. Window partition is a reshape;
    cyclic shift is jnp.roll; non-multiple resolutions are padded up to the
    window size with attention masking (so 512^2 inputs -> 128x128 stride-4
    grids work, 128 % 7 != 0).
  * Window attention runs as batched MXU matmuls over [B*nW, heads, 49, dh]
    with a precomputed relative-position-bias table and a static shift mask.
  * bf16 compute / f32 params; LayerNorm in f32 for stability.

Variants (reference encoders.py:14-20 name map):
  swin_t (2,2,6,2)x96, swin_s (2,2,18,2)x96, swin_b (2,2,18,2)x128,
  swin_l (2,2,18,2)x192; window 7, mlp ratio 4.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def _relative_position_index(ws: int) -> np.ndarray:
    """Static [ws*ws, ws*ws] index into the (2ws-1)^2 bias table."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws),
                                  indexing="ij"))  # [2, ws, ws]
    flat = coords.reshape(2, -1)  # [2, ws*ws]
    rel = flat[:, :, None] - flat[:, None, :]  # [2, N, N]
    rel = rel.transpose(1, 2, 0)  # [N, N, 2]
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)  # [N, N]


def _shift_attn_mask(hp: int, wp: int, ws: int, shift: int) -> np.ndarray:
    """Static additive attention mask [nW, N, N] for shifted windows
    (standard Swin region-id construction), padded cells get their own id."""
    img_mask = np.zeros((hp, wp), np.int32)
    h_slices = (slice(0, -ws), slice(-ws, -shift), slice(-shift, None))
    w_slices = (slice(0, -ws), slice(-ws, -shift), slice(-shift, None))
    cnt = 0
    for hs in h_slices:
        for wss in w_slices:
            img_mask[hs, wss] = cnt
            cnt += 1
    windows = img_mask.reshape(hp // ws, ws, wp // ws, ws)
    windows = windows.transpose(0, 2, 1, 3).reshape(-1, ws * ws)
    diff = windows[:, None, :] != windows[:, :, None]
    return np.where(diff, -100.0, 0.0).astype(np.float32)


def _pad_attn_mask(hp: int, wp: int, h: int, w: int, ws: int) -> np.ndarray:
    """Additive mask hiding right/bottom padding: [nW, N, N]."""
    valid = np.zeros((hp, wp), np.bool_)
    valid[:h, :w] = True
    windows = valid.reshape(hp // ws, ws, wp // ws, ws)
    windows = windows.transpose(0, 2, 1, 3).reshape(-1, ws * ws)
    # key positions that are padding are masked out for every query
    mask = np.where(windows[:, None, :], 0.0, -100.0).astype(np.float32)
    return np.broadcast_to(mask, (windows.shape[0], ws * ws, ws * ws)).copy()


def window_partition(x: jax.Array, ws: int) -> jax.Array:
    """[B, Hp, Wp, C] -> [B*nW, ws*ws, C]."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // ws, ws, W // ws, ws, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws * ws, C)


def window_unpartition(windows: jax.Array, ws: int, hp: int, wp: int
                       ) -> jax.Array:
    """[B*nW, ws*ws, C] -> [B, Hp, Wp, C]."""
    C = windows.shape[-1]
    B = windows.shape[0] // ((hp // ws) * (wp // ws))
    x = windows.reshape(B, hp // ws, wp // ws, ws, ws, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, hp, wp, C)


class _DenseParams(nn.Module):
    """Declare an nn.Dense-compatible {kernel, bias} pair WITHOUT applying
    it — used by the fused-kernel path so its raw weights live at the same
    param paths (attn/qkv/kernel, ...) as the XLA path's nn.Dense modules,
    keeping checkpoints and the timm converter mode-agnostic."""

    features: int

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (in_features, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,), jnp.float32)
        return kernel, bias


class _AttnParams(nn.Module):
    """Parameter container matching WindowAttention's tree exactly."""

    dim: int
    num_heads: int
    window_size: int

    @nn.compact
    def __call__(self):
        wqkv, bqkv = _DenseParams(3 * self.dim, name="qkv")(self.dim)
        wproj, bproj = _DenseParams(self.dim, name="proj")(self.dim)
        table = self.param(
            "rel_pos_bias",
            nn.initializers.truncated_normal(0.02),
            ((2 * self.window_size - 1) ** 2, self.num_heads), jnp.float32,
        )
        return wqkv, bqkv, wproj, bproj, table


class _LNParams(nn.Module):
    """nn.LayerNorm-compatible {scale, bias} declaration (no application)."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones_init(),
                           (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,), jnp.float32)
        return scale, bias


class WindowAttention(nn.Module):
    """Multi-head self-attention inside ws x ws windows with relative bias.

    Runs as batched XLA einsums. A fused Pallas score/softmax kernel was
    built and measured in rounds 1-2 and RETIRED: XLA's batched attention
    matmuls were already faster at every group size tried (best fused
    8.75 ms vs 6.67 ms XLA at stage-0 scale; full history in PERF.md
    'Fused Pallas window attention'). The module-level cost is dominated by
    qkv/proj projections and window-layout data movement, which a score
    kernel cannot recover.
    """

    dim: int
    num_heads: int
    window_size: int
    # keep the materialized score/softmax tensors in bf16 (accumulation
    # inside the MXU stays f32). Halves the largest HBM tensors in the
    # step (f32[B*nW, H, N, N]); max-subtracted softmax over N=49..64
    # window keys is well-conditioned in bf16. Off by default.
    softmax_bf16: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, attn_mask: Optional[jax.Array]) -> jax.Array:
        # x: [B*nW, N, C]; attn_mask: [nW, N, N] additive or None
        Bn, N, C = x.shape
        H = self.num_heads
        dh = C // H
        ws = self.window_size

        qkv = nn.Dense(3 * C, use_bias=True, dtype=self.dtype,
                       name="qkv")(x)

        bias_table = self.param(
            "rel_pos_bias",
            nn.initializers.truncated_normal(0.02),
            ((2 * ws - 1) ** 2, H), jnp.float32,
        )
        rel_idx = jnp.asarray(_relative_position_index(ws).reshape(-1))
        bias = jnp.take(bias_table, rel_idx, axis=0)
        bias = bias.reshape(N, N, H).transpose(2, 0, 1)  # [H, N, N]

        # XLA path: split along the feature axis and reshape head-last — no
        # transposed 5D copy (a [Bn,N,3,H,dh] transpose materializes with
        # ~2.6x tile padding on TPU).
        q = qkv[..., :C].reshape(Bn, N, H, dh)
        k = qkv[..., C : 2 * C].reshape(Bn, N, H, dh)
        v = qkv[..., 2 * C :].reshape(Bn, N, H, dh)

        scale = dh ** -0.5
        score_dtype = (jnp.bfloat16 if (self.softmax_bf16
                                        and self.dtype == jnp.bfloat16)
                       else jnp.float32)
        attn = jnp.einsum("bnhd,bmhd->bhnm", q * scale, k,
                          preferred_element_type=score_dtype)
        attn = attn + bias[None].astype(score_dtype)

        if attn_mask is not None:
            nW = attn_mask.shape[0]
            attn = attn.reshape(Bn // nW, nW, H, N, N)
            attn = attn + attn_mask[None, :, None, :, :].astype(score_dtype)
            attn = attn.reshape(Bn, H, N, N)

        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v,
                         preferred_element_type=jnp.float32)
        out = out.astype(self.dtype).reshape(Bn, N, C)
        return nn.Dense(C, dtype=self.dtype, name="proj")(out)


class DropPath(nn.Module):
    """Per-sample stochastic depth.

    The rate is a CALL argument (may be a traced scalar) so identical blocks
    with different depth-dependent rates can share one scanned program.
    """

    rate: float = 0.0  # legacy attr; call-arg rate takes precedence

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool,
                 rate=None, return_mask: bool = False):
        """Apply stochastic depth to ``x`` — or, with ``return_mask``,
        return the per-sample scale factor [B,1,...,1] (1/keep kept, 0
        dropped) instead of applying it, for callers that fold the
        multiply into a fused kernel. Returns None when deterministic /
        rate 0 (no mask needed). The RNG consumption and bernoulli draw
        are identical in both modes."""
        if rate is None:
            rate = self.rate
        if deterministic or (isinstance(rate, float) and rate == 0.0):
            return None if return_mask else x
        key = self.make_rng("dropout")
        keep = 1.0 - jnp.asarray(rate, jnp.float32)
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(key, keep, shape)
        if return_mask:
            return jnp.where(mask, 1.0 / keep, 0.0).astype(x.dtype)
        return jnp.where(mask, x / keep.astype(x.dtype), 0.0).astype(x.dtype)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    shift: int  # 0 or window_size // 2
    mlp_ratio: float = 4.0
    drop_path: float = 0.0  # used when no call-arg rate is given
    softmax_bf16: bool = False
    # LayerNorm outputs in the compute dtype instead of f32. flax computes
    # the mean/var statistics in f32 either way (_compute_stats upcasts), so
    # this only halves the materialized LN output tensors — pure HBM-traffic
    # savings on the [B,H,W,C] activations feeding qkv / mlp_fc1.
    ln_bf16: bool = False
    # fused Pallas attention branch: LN1 + window partition + qkv +
    # attention + proj + unpartition in ONE kernel (VMEM-resident
    # intermediates, f32 softmax). ~2x over the XLA chain at swin_b
    # stage-0/1 scale, fwd AND fwd+bwd (scripts/probe_fused_block.py;
    # PERF.md). Param tree is identical to the XLA path.
    fused_block: bool = False
    # fused Pallas MLP branch: LN2 + fc1 + gelu + fc2 in one kernel (saves
    # the 4C-wide fc1/gelu HBM round-trips).
    fused_mlp: bool = False
    dtype: jnp.dtype = jnp.float32

    @property
    def ln_dtype(self):
        return self.dtype if self.ln_bf16 else jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False,
                 drop_path_rate=None) -> jax.Array:
        dp_rate = (drop_path_rate if drop_path_rate is not None
                   else self.drop_path)
        B, H, W, C = x.shape
        ws = self.window_size
        # timm parity: when one window already covers the grid, shifting is
        # meaningless — timm sets shift_size=0 (SwinTransformerBlock init);
        # shifting+region-masking here would instead RESTRICT attention.
        # H/W are static at trace time, so this is a compile-time branch.
        shift = self.shift if min(H, W) > ws else 0
        hp = -(-H // ws) * ws
        wp = -(-W // ws) * ws
        pad = (hp != H) or (wp != W)

        shortcut = x

        # static additive attention mask (shift regions + padding)
        mask_np = None
        if shift > 0:
            mask_np = _shift_attn_mask(hp, wp, ws, shift)
        if pad:
            # padded cells as keys must be hidden; under cyclic shift the
            # shift mask's region ids already separate wrapped content, but
            # the pad area needs masking in both cases. Roll the validity
            # map the same way the features are rolled.
            valid = np.zeros((hp, wp), np.bool_)
            valid[:H, :W] = True
            if shift > 0:
                valid = np.roll(valid, (-shift, -shift),
                                axis=(0, 1))
            vw = valid.reshape(hp // ws, ws, wp // ws, ws)
            vw = vw.transpose(0, 2, 1, 3).reshape(-1, ws * ws)
            pad_mask = np.where(vw[:, None, :], 0.0, -100.0).astype(np.float32)
            mask_np = pad_mask if mask_np is None else mask_np + pad_mask
        attn_mask = None if mask_np is None else jnp.asarray(mask_np)

        if self.fused_block:
            # fused Pallas branch: LN applied INSIDE the kernel, so pad/roll
            # the raw input. LN over all-zero pad rows yields `bias` there,
            # but pad keys are masked and pad-query outputs are cropped —
            # semantics match the XLA path on the kept region. The residual
            # add and the per-sample drop-path scale are folded into the
            # kernel too (the add commutes with the roll, so rolling back
            # the returned sum is exact); the mask comes from the SAME
            # DropPath module/rng stream the unfused path consumes.
            from fmc_uia_tpu.ops.swin_block_pallas import (
                fused_attention_branch,
            )

            dp1 = DropPath(name="drop_path1")(
                x, deterministic=not train, rate=dp_rate, return_mask=True)
            y = x.astype(self.dtype)
            if pad:
                y = jnp.pad(y, ((0, 0), (0, hp - H), (0, wp - W), (0, 0)))
            if shift > 0:
                y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
            ln_scale, ln_bias = _LNParams(C, name="norm1")()
            wqkv, bqkv, wproj, bproj, table = _AttnParams(
                dim=C, num_heads=self.num_heads, window_size=ws,
                name="attn")()
            rel_idx = jnp.asarray(_relative_position_index(ws).reshape(-1))
            bias = jnp.take(table, rel_idx, axis=0)
            bias = bias.reshape(ws * ws, ws * ws,
                                self.num_heads).transpose(2, 0, 1)
            y = fused_attention_branch(y, ln_scale, ln_bias, wqkv, bqkv,
                                       wproj, bproj, bias, attn_mask,
                                       self.num_heads, dp_scale=dp1)
            if shift > 0:
                y = jnp.roll(y, (shift, shift), axis=(1, 2))
            if pad:
                y = y[:, :H, :W, :]
            x = y  # residual already inside the kernel
        else:
            y = nn.LayerNorm(dtype=self.ln_dtype, name="norm1")(x)
            if pad:
                y = jnp.pad(y, ((0, 0), (0, hp - H), (0, wp - W), (0, 0)))
            if shift > 0:
                y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
            windows = window_partition(y, ws)
            windows = WindowAttention(
                dim=C, num_heads=self.num_heads, window_size=ws,
                softmax_bf16=self.softmax_bf16,
                dtype=self.dtype, name="attn")(windows, attn_mask)
            y = window_unpartition(windows, ws, hp, wp)
            if shift > 0:
                y = jnp.roll(y, (shift, shift), axis=(1, 2))
            if pad:
                y = y[:, :H, :W, :]
            x = shortcut + DropPath(name="drop_path1")(
                y, deterministic=not train, rate=dp_rate)

        # fused MLP only pays where the branch is activation-bound: at
        # C<=256 (stages 0/1) the kernel beats XLA fwd+bwd by 30-43%; at
        # C=512 it ties standalone and at C=1024 the f32 weight pair alone
        # (32 MB) crowds VMEM (scripts/probe_fused_mlp.py, PERF.md).
        # FMC_FUSED_MLP_MAX_C widens the gate for end-to-end A/B.
        max_c = int(os.environ.get("FMC_FUSED_MLP_MAX_C", "256"))
        if self.fused_mlp and C <= max_c:
            from fmc_uia_tpu.ops.swin_block_pallas import fused_mlp_branch

            hidden = int(C * self.mlp_ratio)
            ln2_s, ln2_b = _LNParams(C, name="norm2")()
            w1, b1 = _DenseParams(hidden, name="mlp_fc1")(C)
            w2, b2 = _DenseParams(C, name="mlp_fc2")(hidden)
            dp2 = DropPath(name="drop_path2")(
                x, deterministic=not train, rate=dp_rate, return_mask=True)
            # residual + drop-path folded into the kernel
            return fused_mlp_branch(x.astype(self.dtype), ln2_s, ln2_b,
                                    w1, b1, w2, b2, dp_scale=dp2)
        y = nn.LayerNorm(dtype=self.ln_dtype, name="norm2")(x)
        y = nn.Dense(int(C * self.mlp_ratio), dtype=self.dtype,
                     name="mlp_fc1")(y)
        y = nn.gelu(y)
        y = nn.Dense(C, dtype=self.dtype, name="mlp_fc2")(y)
        return x + DropPath(name="drop_path2")(
            y, deterministic=not train, rate=dp_rate)


class SwinBlockPair(nn.Module):
    """One scan body: a W-MSA block followed by a SW-MSA block.

    Swin stages are sequences of (window, shifted-window) pairs; scanning
    over pairs compiles ONE pair program per stage instead of ``depth``
    unrolled blocks — a ~9x XLA code-size/compile-time cut for swin_b's
    18-block stage at 512^2 (where unrolled compiles took tens of minutes
    through the remote-compile tunnel).
    """

    dim: int
    num_heads: int
    window_size: int
    mlp_ratio: float = 4.0
    softmax_bf16: bool = False
    ln_bf16: bool = False
    fused_block: bool = False
    fused_mlp: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, rates: jax.Array, train: bool):
        # rates: [2] drop-path rates for the two blocks
        x = SwinBlock(dim=self.dim, num_heads=self.num_heads,
                      window_size=self.window_size, shift=0,
                      mlp_ratio=self.mlp_ratio,
                      softmax_bf16=self.softmax_bf16, ln_bf16=self.ln_bf16,
                      fused_block=self.fused_block,
                      fused_mlp=self.fused_mlp, dtype=self.dtype,
                      name="block0")(x, train, rates[0])
        x = SwinBlock(dim=self.dim, num_heads=self.num_heads,
                      window_size=self.window_size,
                      shift=self.window_size // 2,
                      mlp_ratio=self.mlp_ratio,
                      softmax_bf16=self.softmax_bf16, ln_bf16=self.ln_bf16,
                      fused_block=self.fused_block,
                      fused_mlp=self.fused_mlp, dtype=self.dtype,
                      name="block1")(x, train, rates[1])
        return x, None


class _DenseKernel(nn.Module):
    """nn.Dense-compatible {kernel} declaration (no application)."""

    in_features: int
    out_features: int

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(),
                          (self.in_features, self.out_features), jnp.float32)


class PatchMerging(nn.Module):
    """2x2 neighborhood concat -> LN -> Linear(4C -> 2C).

    Default formulation (``sliced=True``): four contiguous strided slices
    x[:, di::2, dj::2, :] stand in for the concat; LN statistics combine
    the four partial sums, and the 4C->2C reduction runs as four C->2C
    matmuls against slices of the SAME [4C, 2C] kernel, accumulated in
    f32. Mathematically identical to concat->LN->Dense with an identical
    param tree ({norm/{scale,bias}, reduction/kernel}) — but XLA never
    sees the 6D reshape/transpose, which the r3 op dump showed being
    materialized as f32 copies fwd AND bwd (~5 ms/step at merge1,
    B=24 512^2). The transpose was also what forced the TP
    with_sharding_constraint workarounds (MULTICHIP_r02 involuntary
    rematerialization warnings).
    """

    ln_bf16: bool = False
    sliced: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, H, W, C = x.shape
        if H % 2 or W % 2:
            x = jnp.pad(x, ((0, 0), (0, H % 2), (0, W % 2), (0, 0)))
            H, W = x.shape[1], x.shape[2]

        if not self.sliced:
            x = x.reshape(B, H // 2, 2, W // 2, 2, C)
            x = x.transpose(0, 1, 3, 2, 4, 5).reshape(
                B, H // 2, W // 2, 4 * C)
            x = nn.LayerNorm(
                dtype=self.dtype if self.ln_bf16 else jnp.float32,
                name="norm")(x)
            return nn.Dense(2 * C, use_bias=False, dtype=self.dtype,
                            name="reduction")(x)

        scale, bias = _LNParams(4 * C, name="norm")()
        kernel = _DenseKernel(4 * C, 2 * C, name="reduction")()
        f32 = jnp.float32
        # concat order of the reshape/transpose formulation: k = 2*di + dj
        xs = [x[:, di::2, dj::2, :] for di in (0, 1) for dj in (0, 1)]
        # f32 stats over the virtual 4C concat (converts fuse into the
        # reductions; no f32 map is materialized)
        s1 = sum(jnp.sum(xk.astype(f32), axis=-1, keepdims=True)
                 for xk in xs)
        s2 = sum(jnp.sum(jnp.square(xk.astype(f32)), axis=-1, keepdims=True)
                 for xk in xs)
        n = 4 * C
        mu = s1 / n
        var = s2 / n - mu * mu
        rstd = jax.lax.rsqrt(var + 1e-6)  # nn.LayerNorm default epsilon
        ln_dt = self.dtype if self.ln_bf16 else f32
        y = None
        for k, xk in enumerate(xs):
            sk = scale[k * C:(k + 1) * C].astype(ln_dt)
            bk = bias[k * C:(k + 1) * C].astype(ln_dt)
            xh = (xk.astype(ln_dt) - mu.astype(ln_dt)) * rstd.astype(ln_dt)
            xn = (xh * sk + bk).astype(self.dtype)
            wk = kernel[k * C:(k + 1) * C].astype(self.dtype)
            yk = jnp.dot(xn, wk, preferred_element_type=f32)
            y = yk if y is None else y + yk
        return y.astype(self.dtype)


class SwinEncoder(nn.Module):
    """4-stage Swin pyramid encoder."""

    embed_dim: int = 128
    depths: Sequence[int] = (2, 2, 18, 2)
    num_heads: Sequence[int] = (4, 8, 16, 32)
    window_size: int = 7
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.1
    patch_size: int = 4
    remat: bool = False  # rematerialize blocks: trade FLOPs for HBM
    remat_policy: str = "full"  # 'full' | 'dots' (save matmul outputs)
    # which stages to remat (None = all). Early stages carry the large
    # (128^2-grid) activations — remat there buys the memory; stage 2 has
    # 18 of the 24 blocks but tiny 32^2-grid activations, so rematting it
    # is nearly all recompute cost and no memory win. (0, 1) is the sweet
    # spot at 512^2.
    remat_stages: Optional[Sequence[int]] = None
    scan_blocks: bool = True  # nn.scan over block pairs (compile-time)
    # which stages scan (None = all). Scanning stage 2 (18 blocks) cuts
    # compile ~9x but its stacked params pay dynamic-slice reads fwd and
    # dynamic-update-slice grad writes bwd (~5% of the step in the r2
    # profile); unrolling it trades compile time back for those copies.
    scan_stages: Optional[Sequence[int]] = None
    softmax_bf16: bool = False  # bf16 scores/softmax (see WindowAttention)
    ln_bf16: bool = False  # bf16 LayerNorm outputs (stats stay f32)
    fused_block: bool = False  # fused Pallas attention branch (SwinBlock)
    fused_mlp: bool = False  # fused Pallas MLP branch (SwinBlock)
    # which stages use the fused attention branch (None = all). The kernel
    # wins decisively at stages 0/1 (large grids, small C); at stage 2/3
    # the recompute-vjp backward roughly ties XLA (probe_fused_block.py
    # PROBE_STAGES=stage2) — gate to measure/tune per model.
    fused_stages: Optional[Sequence[int]] = None
    dtype: jnp.dtype = jnp.float32

    @property
    def out_channels(self) -> Tuple[int, int, int, int]:
        return tuple(self.embed_dim * (2**i) for i in range(4))

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        x = x.astype(self.dtype)
        x = nn.Conv(self.embed_dim, (self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size),
                    dtype=self.dtype, name="patch_embed")(x)
        # honors ln_bf16 like the block/merge LNs (r2-6): stats stay f32
        # inside flax; only the materialized [B,H/4,W/4,C] output (201 MB
        # f32 at B=24 512^2) halves. The r3 op dump showed this was the one
        # LN still emitting f32, dragging f32 converts/copies through the
        # stage-0 entry (convert.31/32 + stride-4 f32 copies).
        x = nn.LayerNorm(dtype=self.dtype if self.ln_bf16 else jnp.float32,
                         name="patch_norm")(x)

        total_blocks = sum(self.depths)
        dpr = np.linspace(0, self.drop_path_rate, total_blocks)
        block_id = 0

        policy = None
        if self.remat_policy == "dots":
            # keep matmul outputs, recompute elementwise/norm only
            policy = jax.checkpoint_policies.checkpoint_dots
        remat_block_cls = nn.remat(SwinBlock, static_argnums=(2,))
        # prevent_cse=False: required for efficient remat inside scan
        remat_pair_cls = nn.remat(SwinBlockPair, static_argnums=(3,),
                                  prevent_cse=False, policy=policy)

        def stage_classes(stage):
            on = self.remat and (self.remat_stages is None
                                 or stage in tuple(self.remat_stages))
            return ((remat_block_cls, remat_pair_cls) if on
                    else (SwinBlock, SwinBlockPair))

        # Activation layout pins for tensor parallelism: without them GSPMD
        # must infer a layout through the PatchMerging reshape/transpose and
        # falls back to involuntary full rematerialization (replicate +
        # repartition) at every stage boundary. Batch stays on 'data',
        # features replicated over 'model' (Megatron block-boundary layout).
        # No-op without an installed mesh (parallel/activation.py).
        from fmc_uia_tpu.parallel import shard_batch_activation

        features = []
        for stage, depth in enumerate(self.depths):
            block_cls, pair_cls = stage_classes(stage)
            fused_this = self.fused_block and (
                self.fused_stages is None
                or stage in tuple(self.fused_stages))
            if stage > 0:
                x = shard_batch_activation(x)
                x = PatchMerging(dtype=self.dtype, ln_bf16=self.ln_bf16,
                                 name=f"merge{stage}")(x)
                x = shard_batch_activation(x)
            dim = self.embed_dim * (2**stage)
            scan_this = self.scan_blocks and (
                self.scan_stages is None
                or stage in tuple(self.scan_stages))
            if scan_this and depth % 2 == 0 and depth > 0:
                n_pairs = depth // 2
                rates = jnp.asarray(
                    dpr[block_id : block_id + depth], jnp.float32
                ).reshape(n_pairs, 2)
                scanned = nn.scan(
                    pair_cls,
                    variable_axes={"params": 0},
                    split_rngs={"params": True, "dropout": True},
                    in_axes=(0, nn.broadcast),
                    length=n_pairs,
                )
                x, _ = scanned(
                    dim=dim,
                    num_heads=self.num_heads[stage],
                    window_size=self.window_size,
                    mlp_ratio=self.mlp_ratio,
                    softmax_bf16=self.softmax_bf16,
                    ln_bf16=self.ln_bf16,
                    fused_block=fused_this,
                    fused_mlp=self.fused_mlp,
                    dtype=self.dtype,
                    name=f"stage{stage}_scan",
                )(x, rates, train)
                block_id += depth
            else:
                for b in range(depth):
                    x = block_cls(
                        dim=dim,
                        num_heads=self.num_heads[stage],
                        window_size=self.window_size,
                        shift=0 if b % 2 == 0 else self.window_size // 2,
                        mlp_ratio=self.mlp_ratio,
                        drop_path=float(dpr[block_id]),
                        softmax_bf16=self.softmax_bf16,
                        ln_bf16=self.ln_bf16,
                        fused_block=fused_this,
                        fused_mlp=self.fused_mlp,
                        dtype=self.dtype,
                        name=f"stage{stage}_block{b}",
                    )(x, train)  # positional: remat static_argnums=(2,)
                    block_id += 1
            features.append(x)
        return features


_SWIN_VARIANTS = {
    "swin_t": dict(embed_dim=96, depths=(2, 2, 6, 2),
                   num_heads=(3, 6, 12, 24)),
    "swin_s": dict(embed_dim=96, depths=(2, 2, 18, 2),
                   num_heads=(3, 6, 12, 24)),
    "swin_b": dict(embed_dim=128, depths=(2, 2, 18, 2),
                   num_heads=(4, 8, 16, 32)),
    "swin_l": dict(embed_dim=192, depths=(2, 2, 18, 2),
                   num_heads=(6, 12, 24, 48)),
    # test-size variant
    "swin_nano": dict(embed_dim=32, depths=(1, 1, 1, 1),
                      num_heads=(2, 2, 4, 4)),
    # swin_t-shaped test variant: even per-stage depths so the scanned
    # SwinBlockPair path engages — the dryrun/mesh tests exercise the same
    # scan+fused-kernel program structure the flagship swin_b bench runs.
    "swin_micro": dict(embed_dim=32, depths=(2, 2, 2, 2),
                       num_heads=(2, 4, 8, 16)),
}


def build_swin(name: str, config=None, dtype=jnp.float32) -> SwinEncoder:
    if name not in _SWIN_VARIANTS:
        raise ValueError(
            f"Unknown swin variant {name!r}; have {sorted(_SWIN_VARIANTS)}")
    kwargs = dict(_SWIN_VARIANTS[name])
    drop_path = 0.1
    remat = False
    window = 7
    if config is not None:
        drop_path = float(config.get("model.encoder.drop_path_rate", 0.1))
        remat = bool(config.get("model.encoder.remat", False)
                     or config.get("training.remat", False))
        # window 7 matches timm checkpoints; 8 divides stride-4 grids of
        # power-of-two inputs exactly (no pad/mask) and N=64 aligns with
        # TPU tiles — ~1.4x faster at 512^2. The weight converter
        # interpolates rel-pos bias tables between window sizes.
        window = int(config.get("model.encoder.window_size", 7))
    remat_policy = "full"
    remat_stages = None
    softmax_bf16 = False
    ln_bf16 = False
    if config is not None:
        remat_policy = str(config.get("model.encoder.remat_policy", "full"))
        rs = config.get("model.encoder.remat_stages")
        remat_stages = tuple(int(s) for s in rs) if rs is not None else None
        softmax_bf16 = bool(config.get("model.encoder.softmax_bf16", False))
        ln_bf16 = bool(config.get("model.encoder.ln_bf16", False))
        # fused Pallas kernels default ON on real TPUs (1.3x end-to-end,
        # and numerically MORE conservative than the XLA chain: f32
        # softmax in VMEM). On CPU they'd run in slow interpret mode, so
        # the default follows the backend; config keys override either way.
        on_tpu = jax.default_backend() == "tpu"
        fused_block = bool(config.get("model.encoder.fused_block", on_tpu))
        fused_mlp = bool(config.get("model.encoder.fused_mlp", on_tpu))
    scan_stages = None
    fused_stages = None
    if config is None:
        fused_block = False
        fused_mlp = False
    else:
        ss = config.get("model.encoder.scan_stages")
        scan_stages = tuple(int(s) for s in ss) if ss is not None else None
        fs = config.get("model.encoder.fused_stages")
        fused_stages = tuple(int(s) for s in fs) if fs is not None else None
    return SwinEncoder(dtype=dtype, drop_path_rate=drop_path, remat=remat,
                       remat_policy=remat_policy, window_size=window,
                       remat_stages=remat_stages, softmax_bf16=softmax_bf16,
                       ln_bf16=ln_bf16, scan_stages=scan_stages,
                       fused_block=fused_block, fused_mlp=fused_mlp,
                       fused_stages=fused_stages, **kwargs)
