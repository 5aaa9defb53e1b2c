"""Device-side photometric augmentation tests."""

import jax
import jax.numpy as jnp
import numpy as np

from fmc_uia_tpu.ops.image import (
    augment_and_normalize,
    normalize_images,
    random_brightness_contrast,
    random_gauss_noise,
)

MEAN = [0.330189, 0.330189, 0.330189]
STD = [0.178211, 0.178211, 0.178211]


def test_normalize_matches_formula():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (2, 8, 8, 3)).astype(np.uint8)
    out = np.asarray(normalize_images(jnp.asarray(img), MEAN, STD))
    ref = (img.astype(np.float32) / 255.0 - np.array(MEAN)) / np.array(STD)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_brightness_contrast_identity_when_p0():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (4, 8, 8, 3)).astype(np.uint8)
    out = random_brightness_contrast(jax.random.PRNGKey(0), jnp.asarray(img), p=0.0)
    np.testing.assert_allclose(np.asarray(out), img.astype(np.float32))


def test_gauss_noise_identity_when_p0():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (4, 8, 8, 3)).astype(np.uint8)
    out = random_gauss_noise(jax.random.PRNGKey(0), jnp.asarray(img), p=0.0)
    np.testing.assert_allclose(np.asarray(out), img.astype(np.float32))


def test_brightness_contrast_changes_when_p1():
    img = np.full((4, 8, 8, 3), 128, np.uint8)
    out = np.asarray(
        random_brightness_contrast(jax.random.PRNGKey(1), jnp.asarray(img), p=1.0)
    )
    assert not np.allclose(out, 128.0)
    assert out.min() >= 0.0 and out.max() <= 255.0


def test_val_path_is_pure_normalize():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (2, 8, 8, 3)).astype(np.uint8)
    out = augment_and_normalize(None, jnp.asarray(img), MEAN, STD, train=False)
    ref = normalize_images(jnp.asarray(img), MEAN, STD)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref))


def test_train_path_deterministic_given_key():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (2, 16, 16, 3)).astype(np.uint8)
    key = jax.random.PRNGKey(7)
    a = augment_and_normalize(key, jnp.asarray(img), MEAN, STD, train=True)
    b = augment_and_normalize(key, jnp.asarray(img), MEAN, STD, train=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_bf16_output_dtype():
    img = np.zeros((1, 8, 8, 3), np.uint8)
    out = normalize_images(jnp.asarray(img), MEAN, STD, dtype=jnp.bfloat16)
    assert out.dtype == jnp.bfloat16
