"""Shared layers: ConvGNAct and *banked* layers for per-subtask heads.

The reference keeps one ``nn.Module`` per subtask in a ModuleDict and
dispatches by task_id string in Python (reference heads.py:585-590). Under
jit that would mean 27 compiled programs (and 27 recompiles per shape). Here
every per-subtask layer is a *bank*: its parameters carry a leading
``num_banks`` axis and the forward gathers one slice with a device-side
integer index. One compiled step per task TYPE serves every subtask.

The gather is tiny (head params are KBs-MBs) and XLA turns it into a single
dynamic-slice from HBM — negligible next to the encoder matmuls.

Layout: NHWC activations, HWIO conv kernels (TPU-native).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def gn_groups(channels: int) -> int:
    """Largest group count <= 32 dividing channels (reference heads.py:9-13)."""
    groups = min(32, channels)
    while channels % groups != 0:
        groups -= 1
    return groups


class ConvGNAct(nn.Module):
    """Conv3x3 + GroupNorm + SiLU (reference encoders.py:338-351)."""

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    act: Callable = nn.silu
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.features, self.kernel_size, strides=self.strides,
            use_bias=False, dtype=self.dtype,
        )(x)
        x = nn.GroupNorm(num_groups=gn_groups(self.features),
                         dtype=self.dtype)(x)
        return self.act(x)


# --------------------------------------------------------------------------
# Banked layers — parameters with a leading task axis, gathered by index.
# --------------------------------------------------------------------------
def _banked_kernel_init(scale: float = 1.0):
    # fan computed over (kh, kw, cin) -> cout; leading bank axis is batch.
    return nn.initializers.variance_scaling(
        scale, "fan_in", "truncated_normal",
        in_axis=-2, out_axis=-1, batch_axis=(0,),
    )


class BankedConv(nn.Module):
    """Per-task 2D convolution bank. Kernel: [T, kh, kw, Cin, Cout]."""

    num_banks: int
    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: str = "SAME"
    use_bias: bool = True
    bias_init_value: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, idx: jax.Array) -> jax.Array:
        cin = x.shape[-1]
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel", _banked_kernel_init(),
            (self.num_banks, kh, kw, cin, self.features), jnp.float32,
        )
        k = jnp.take(kernel, idx, axis=0).astype(self.dtype)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), k,
            window_strides=self.strides, padding=self.padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param(
                "bias",
                nn.initializers.constant(self.bias_init_value),
                (self.num_banks, self.features), jnp.float32,
            )
            y = y + jnp.take(bias, idx, axis=0).astype(self.dtype)
        return y


class BankedDense(nn.Module):
    """Per-task dense bank. Kernel: [T, Cin, Cout]."""

    num_banks: int
    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, idx: jax.Array) -> jax.Array:
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", _banked_kernel_init(),
            (self.num_banks, cin, self.features), jnp.float32,
        )
        k = jnp.take(kernel, idx, axis=0).astype(self.dtype)
        y = jnp.dot(x.astype(self.dtype), k,
                    preferred_element_type=jnp.float32).astype(self.dtype)
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros,
                (self.num_banks, self.features), jnp.float32,
            )
            y = y + jnp.take(bias, idx, axis=0).astype(self.dtype)
        return y


class BankedGroupNorm(nn.Module):
    """Per-task GroupNorm bank: shared normalization, banked scale/shift.

    Statistics are always reduced in f32; the elementwise normalize+affine
    runs in the input dtype (flax nn.GroupNorm(dtype=...) semantics). The
    old all-f32 elementwise path materialized f32 [B,H,W,C] maps fwd AND
    bwd — the r3 op dump showed ~7.5 ms/step of f32 stride-4 copies in the
    detection step from exactly these (4 GNs in the CenterNet head bank).
    """

    num_banks: int
    num_groups: int

    @nn.compact
    def __call__(self, x: jax.Array, idx: jax.Array) -> jax.Array:
        C = x.shape[-1]
        scale = self.param(
            "scale", nn.initializers.ones, (self.num_banks, C), jnp.float32
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.num_banks, C), jnp.float32
        )
        dt = x.dtype
        B, H, W, _ = x.shape
        g = self.num_groups
        xg = x.reshape(B, H, W, g, C // g)
        # f32 stats from the (possibly bf16) input: convert fuses into the
        # reduction, no f32 map is materialized
        mean = jnp.mean(xg.astype(jnp.float32), axis=(1, 2, 4),
                        keepdims=True)
        var = jnp.var(xg.astype(jnp.float32), axis=(1, 2, 4), keepdims=True)
        rs = jax.lax.rsqrt(var + 1e-5)
        xg = (xg - mean.astype(dt)) * rs.astype(dt)
        xn = xg.reshape(B, H, W, C)
        s = jnp.take(scale, idx, axis=0).astype(dt)
        b = jnp.take(bias, idx, axis=0).astype(dt)
        return xn * s + b


class BankedMLP(nn.Module):
    """Per-task MLP bank: dense(+SiLU+dropout) chain ending in a plain dense.

    Mirrors the reference RegressionHead MLP structure (heads.py:326-336).
    """

    num_banks: int
    hidden_dims: Sequence[int]
    out_dim: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, idx, train: bool = False):
        for i, h in enumerate(self.hidden_dims):
            x = BankedDense(self.num_banks, h, dtype=self.dtype,
                            name=f"dense_{i}")(x, idx)
            x = nn.silu(x)
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return BankedDense(self.num_banks, self.out_dim, dtype=self.dtype,
                           name=f"dense_{len(self.hidden_dims)}")(x, idx)


def upsample_2x(x: jax.Array, method: str = "nearest") -> jax.Array:
    """2x spatial upsample, NHWC."""
    B, H, W, C = x.shape
    if method == "nearest":
        return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    return jax.image.resize(x, (B, H * 2, W * 2, C), method=method)


def resize_to(x: jax.Array, h: int, w: int, method: str = "bilinear") -> jax.Array:
    B, _, _, C = x.shape
    if x.shape[1] == h and x.shape[2] == w:
        return x
    return jax.image.resize(x, (B, h, w, C), method=method)
