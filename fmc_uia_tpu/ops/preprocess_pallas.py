"""Fused Pallas preprocessing kernel.

One VMEM pass per image implementing the whole photometric train chain of
reference train.py:35-44 on device:

    uint8 -> brightness/contrast (per-image alpha/beta) -> clip ->
    gaussian noise (on-core PRNG + Box-Muller) -> clip ->
    (x - mean)/std -> bf16/f32

The jnp path (ops/image.py) reads/writes the batch several times and runs
the threefry RNG for the noise tensor; this kernel reads uint8 once, uses
the TPU hardware PRNG, and writes the normalized output once — HBM traffic
~= 1 read + 1 write.

Layout: the [H, W, 3] image is viewed as [H, W*3] so the lane dimension is
W*3 (multiple of 128 for W in {128, 256, 512, ...}; other widths still work,
just with partial tiles). Per-channel mean/std become a [W*3] row pattern.

Per-image scalars (alpha, beta, sigma, seed) are computed with jax.random
outside (cheap [B] work) and enter via scalar prefetch.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(scalars_ref, seed_ref, img_ref, mean_ref, std_ref, out_ref):
    i = pl.program_id(0)
    pltpu.prng_seed(seed_ref[i])

    # Mosaic has no direct uint8 -> f32 cast; go through int32.
    x = img_ref[...].astype(jnp.int32).astype(jnp.float32)  # [H, W*3]
    alpha = scalars_ref[i, 0]
    beta = scalars_ref[i, 1]
    sigma = scalars_ref[i, 2]

    x = jnp.clip(x * alpha + beta, 0.0, 255.0)

    # gaussian noise via Box-Muller on hardware PRNG bits
    bits1 = pltpu.bitcast(pltpu.prng_random_bits(x.shape), jnp.uint32)
    bits2 = pltpu.bitcast(pltpu.prng_random_bits(x.shape), jnp.uint32)
    # uint32 -> f32 casts are unsupported; the >>8 result fits int32.
    u1 = pltpu.bitcast(bits1 >> 8, jnp.int32).astype(jnp.float32) * (
        1.0 / 16777216.0)
    u2 = pltpu.bitcast(bits2 >> 8, jnp.int32).astype(jnp.float32) * (
        1.0 / 16777216.0)
    u1 = jnp.maximum(u1, 1e-7)
    normal = jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(
        2.0 * np.float32(np.pi) * u2)
    x = jnp.clip(x + sigma * normal, 0.0, 255.0)

    x = (x - mean_ref[...]) * std_ref[...]  # std_ref holds 1/(std*255)
    out_ref[...] = x.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("dtype_name",))
def _fused_call(images, scalars, seeds, mean_row, inv_std_row,
                dtype_name: str):
    B, H, W, C = images.shape
    dtype = jnp.dtype(dtype_name)
    img2d = images.reshape(B, H, W * C)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # scalars [B,3], seeds [B]
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, W * C), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W * C), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W * C), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, W * C), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((B, H, W * C), dtype),
        grid_spec=grid_spec,
    )(scalars, seeds, img2d, mean_row[None], inv_std_row[None])
    return out.reshape(B, H, W, C)


def fused_augment_normalize(
    key: jax.Array,
    images: jax.Array,
    mean: Sequence[float],
    std: Sequence[float],
    brightness_contrast_p: float = 0.2,
    gauss_noise_p: float = 0.1,
    brightness_limit: float = 0.2,
    contrast_limit: float = 0.2,
    var_limit: Tuple[float, float] = (10.0, 50.0),
    dtype=jnp.bfloat16,
) -> jax.Array:
    """Drop-in replacement for ops.image.augment_and_normalize(train=True)."""
    B, H, W, C = images.shape
    k_bc, k_a, k_b, k_n, k_v, k_s = jax.random.split(key, 6)

    apply_bc = jax.random.bernoulli(k_bc, brightness_contrast_p, (B,))
    alpha = jnp.where(
        apply_bc,
        1.0 + jax.random.uniform(k_a, (B,), minval=-contrast_limit,
                                 maxval=contrast_limit),
        1.0)
    beta = jnp.where(
        apply_bc,
        jax.random.uniform(k_b, (B,), minval=-brightness_limit,
                           maxval=brightness_limit) * 255.0,
        0.0)
    apply_noise = jax.random.bernoulli(k_n, gauss_noise_p, (B,))
    var = jax.random.uniform(k_v, (B,), minval=var_limit[0],
                             maxval=var_limit[1])
    sigma = jnp.where(apply_noise, jnp.sqrt(var), 0.0)

    scalars = jnp.stack([alpha, beta, sigma], axis=1).astype(jnp.float32)
    seeds = jax.random.randint(k_s, (B,), 0, np.iinfo(np.int32).max,
                               dtype=jnp.int32)

    mean_row = jnp.tile(jnp.asarray(mean, jnp.float32) * 255.0, W)
    inv_std_row = jnp.tile(
        1.0 / (jnp.asarray(std, jnp.float32) * 255.0), W)

    return _fused_call(images, scalars, seeds, mean_row, inv_std_row,
                       jnp.dtype(dtype).name)
