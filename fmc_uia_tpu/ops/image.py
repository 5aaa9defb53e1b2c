"""Device-side photometric augmentation + normalization.

The reference runs albumentations on CPU worker processes
(reference train.py:35-54: Resize → RandomBrightnessContrast(p) →
GaussNoise(p) → Normalize → ToTensor). TPU-first split: the host only decodes
and geometrically resizes to the static training resolution (fixed shapes for
XLA); everything photometric runs on device over the whole batch:

    uint8 [B, H, W, 3] → brightness/contrast → gauss noise → (x/255 - mean)/std

Randomness is driven by explicit JAX PRNG keys (per-image apply-probability
and parameter sampling match albumentations' default semantics:
brightness/contrast limits ±0.2 with brightness_by_max, gauss noise variance
uniform in [10, 50] on the 0..255 scale). Bit-exactness with albumentations'
RNG stream is not a goal — these are random augmentations; the deterministic
val path (normalize only) is exact.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


def normalize_images(
    images: jax.Array,
    mean: Sequence[float],
    std: Sequence[float],
    dtype=jnp.float32,
) -> jax.Array:
    """(x/255 - mean) / std, matching A.Normalize (max_pixel_value=255)."""
    mean = jnp.asarray(mean, jnp.float32) * 255.0
    denom = jnp.asarray(std, jnp.float32) * 255.0
    x = images.astype(jnp.float32)
    return ((x - mean) / denom).astype(dtype)


def random_brightness_contrast(
    key: jax.Array,
    images: jax.Array,
    p: float = 0.2,
    brightness_limit: float = 0.2,
    contrast_limit: float = 0.2,
) -> jax.Array:
    """Per-image random brightness/contrast on the 0..255 scale.

    alpha = 1 + U(-contrast_limit, contrast_limit)
    beta  = U(-brightness_limit, brightness_limit) * 255   (brightness_by_max)
    out   = clip(x * alpha + beta, 0, 255), applied with probability p.
    """
    B = images.shape[0]
    k_apply, k_alpha, k_beta = jax.random.split(key, 3)
    apply = jax.random.bernoulli(k_apply, p, (B,))
    alpha = 1.0 + jax.random.uniform(
        k_alpha, (B,), minval=-contrast_limit, maxval=contrast_limit
    )
    beta = jax.random.uniform(
        k_beta, (B,), minval=-brightness_limit, maxval=brightness_limit
    ) * 255.0
    alpha = jnp.where(apply, alpha, 1.0)[:, None, None, None]
    beta = jnp.where(apply, beta, 0.0)[:, None, None, None]
    x = images.astype(jnp.float32)
    return jnp.clip(x * alpha + beta, 0.0, 255.0)


def random_gauss_noise(
    key: jax.Array,
    images: jax.Array,
    p: float = 0.1,
    var_limit: Tuple[float, float] = (10.0, 50.0),
) -> jax.Array:
    """Per-image additive gaussian noise on the 0..255 scale."""
    B = images.shape[0]
    k_apply, k_var, k_noise = jax.random.split(key, 3)
    apply = jax.random.bernoulli(k_apply, p, (B,))
    var = jax.random.uniform(
        k_var, (B,), minval=var_limit[0], maxval=var_limit[1]
    )
    sigma = jnp.sqrt(var)
    noise = jax.random.normal(k_noise, images.shape, jnp.float32)
    scale = jnp.where(apply, sigma, 0.0)[:, None, None, None]
    x = images.astype(jnp.float32)
    return jnp.clip(x + noise * scale, 0.0, 255.0)


def random_flips(
    key: jax.Array,
    images: jax.Array,
    labels: jax.Array,
    task_type: str,
    horizontal_p: float = 0.0,
    vertical_p: float = 0.0,
):
    """Synchronized per-image random flips of images AND labels.

    The reference declares flip probabilities in config but never applies
    them (config.yaml:27-28 vs build_dataloaders, SURVEY.md §2.1); here they
    work, with geometry-aware label handling:
      segmentation: mask flips with the image
      detection:    x1' = 1-x2, x2' = 1-x1 (and y for vertical); invalid
                    sentinel boxes pass through untouched
      Regression:   x' = 1-x / y' = 1-y per point
      classification: label unchanged
    """
    B = images.shape[0]
    kh, kv = jax.random.split(key)
    do_h = jax.random.bernoulli(kh, horizontal_p, (B,)) if horizontal_p > 0 \
        else jnp.zeros((B,), bool)
    do_v = jax.random.bernoulli(kv, vertical_p, (B,)) if vertical_p > 0 \
        else jnp.zeros((B,), bool)

    img_h = jnp.flip(images, axis=2)
    images = jnp.where(do_h[:, None, None, None], img_h, images)
    img_v = jnp.flip(images, axis=1)
    images = jnp.where(do_v[:, None, None, None], img_v, images)

    if task_type == "segmentation":
        lab_h = jnp.flip(labels, axis=2)
        labels = jnp.where(do_h[:, None, None], lab_h, labels)
        lab_v = jnp.flip(labels, axis=1)
        labels = jnp.where(do_v[:, None, None], lab_v, labels)
    elif task_type == "detection":
        valid = jnp.all(labels >= 0, axis=1)
        x1, y1, x2, y2 = (labels[:, 0], labels[:, 1], labels[:, 2],
                          labels[:, 3])
        fh = jnp.stack([1.0 - x2, y1, 1.0 - x1, y2], axis=1)
        labels = jnp.where((do_h & valid)[:, None], fh, labels)
        x1, y1, x2, y2 = (labels[:, 0], labels[:, 1], labels[:, 2],
                          labels[:, 3])
        fv = jnp.stack([x1, 1.0 - y2, x2, 1.0 - y1], axis=1)
        labels = jnp.where((do_v & valid)[:, None], fv, labels)
    elif task_type == "Regression":
        is_x = jnp.arange(labels.shape[-1]) % 2 == 0
        fh = jnp.where(is_x, 1.0 - labels, labels)
        labels = jnp.where(do_h[:, None], fh, labels)
        fv = jnp.where(~is_x, 1.0 - labels, labels)
        labels = jnp.where(do_v[:, None], fv, labels)
    return images, labels


def input_prep_fns(config, compute_dtype=jnp.float32):
    """Build (train_prep(key, images), eval_prep(images)) from config.

    Standard path: device photometric augmentation + dataset-stats
    normalization. Adaptive-norm path (data.use_adaptive_norm, the
    reference's experimental new_dataloader variant): images arrive already
    per-image standardized from the host — pass through unchanged (the
    reference likewise warns against stacking A.Normalize on top,
    new_dataloader.py:45-66).
    """
    if config.get("data.use_adaptive_norm", False):
        # normalize-conflict guard (reference new_dataloader.py:45-66):
        # stacking dataset-stats normalization on per-image adaptive norm
        # double-normalizes; warn unless the configured stats are identity
        mean = config.get("data.augmentation.normalize.mean")
        std = config.get("data.augmentation.normalize.std")
        identity = (
            (mean is None or list(mean) == [0, 0, 0])
            and (std is None or list(std) == [1, 1, 1]))
        if not identity:
            import warnings

            warnings.warn(
                "CONFLICT: data.use_adaptive_norm is on but "
                f"data.augmentation.normalize has non-identity stats "
                f"(mean={mean}, std={std}). Adaptive norm already "
                "standardizes each image; the stats are IGNORED here — "
                "set mean=[0,0,0], std=[1,1,1] to silence this warning.",
                stacklevel=2)

        def train_prep(key, images):
            del key
            return images.astype(compute_dtype)

        def eval_prep(images):
            return images.astype(compute_dtype)

        return train_prep, eval_prep

    mean = config.get("data.augmentation.normalize.mean")
    std = config.get("data.augmentation.normalize.std")
    aug = config.get_augmentation_config("train") or {}
    bc_p = float(aug.get("random_brightness_contrast", 0.2))
    noise_p = float(aug.get("gauss_noise", 0.1))

    # fused Pallas photometric chain (ops/preprocess_pallas.py): one VMEM
    # pass + hardware PRNG instead of several jnp passes + threefry.
    # Same distribution, different RNG stream. TPU only.
    use_fused = bool(config.get("data.fused_preprocess", False))

    def train_prep(key, images):
        if use_fused and jax.default_backend() == "tpu":
            from fmc_uia_tpu.ops.preprocess_pallas import (
                fused_augment_normalize,
            )

            return fused_augment_normalize(
                key, images, mean, std, brightness_contrast_p=bc_p,
                gauss_noise_p=noise_p, dtype=compute_dtype)
        return augment_and_normalize(
            key, images, mean, std, brightness_contrast_p=bc_p,
            gauss_noise_p=noise_p, train=True, dtype=compute_dtype)

    def eval_prep(images):
        return normalize_images(images, mean, std, dtype=compute_dtype)

    return train_prep, eval_prep


def augment_and_normalize(
    key: Optional[jax.Array],
    images: jax.Array,
    mean: Sequence[float],
    std: Sequence[float],
    brightness_contrast_p: float = 0.2,
    gauss_noise_p: float = 0.1,
    train: bool = True,
    dtype=jnp.float32,
) -> jax.Array:
    """Full device-side photometric chain.

    Train: brightness/contrast → noise → normalize (reference train.py:35-44).
    Val:   normalize only (reference train.py:47-54).
    """
    if train:
        if key is None:
            raise ValueError("train=True requires a PRNG key")
        k_bc, k_noise = jax.random.split(key)
        x = random_brightness_contrast(k_bc, images, p=brightness_contrast_p)
        x = random_gauss_noise(k_noise, x, p=gauss_noise_p)
    else:
        x = images
    return normalize_images(x, mean, std, dtype=dtype)
