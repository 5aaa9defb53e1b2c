"""Fused Pallas preprocessing kernel: statistical parity with the jnp path.

The kernel uses the TPU hardware PRNG (different stream from threefry), so
parity is distributional, not bitwise: with augmentation probabilities
forced to 0/1 the deterministic parts (contrast/brightness, normalize)
must match exactly; the noise path must match in moments.

TPU-only (Mosaic kernel); skipped on the CPU test mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

if jax.default_backend() != "tpu":
    pytest.skip("Pallas TPU kernel; run with JAX_PLATFORMS=tpu",
                allow_module_level=True)

from fmc_uia_tpu.ops.image import augment_and_normalize
from fmc_uia_tpu.ops.preprocess_pallas import fused_augment_normalize

MEAN = [0.33, 0.33, 0.33]
STD = [0.18, 0.18, 0.18]


def test_deterministic_path_matches_jnp():
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randint(0, 255, (4, 128, 128, 3)), jnp.uint8)
    # p=0: no augmentation applies -> pure normalize, must match exactly
    got = fused_augment_normalize(
        jax.random.PRNGKey(0), images, MEAN, STD,
        brightness_contrast_p=0.0, gauss_noise_p=0.0, dtype=jnp.float32)
    want = augment_and_normalize(
        jax.random.PRNGKey(0), images, MEAN, STD,
        brightness_contrast_p=0.0, gauss_noise_p=0.0, train=True,
        dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-5)


def test_noise_moments():
    rng = np.random.RandomState(1)
    images = jnp.asarray(np.full((2, 256, 256, 3), 128, np.uint8))
    out = fused_augment_normalize(
        jax.random.PRNGKey(1), images, [0.0] * 3, [1 / 255.0] * 3,
        brightness_contrast_p=0.0, gauss_noise_p=1.0,
        var_limit=(25.0, 25.0), dtype=jnp.float32)
    # output = 128 + N(0, 5^2) clipped; check mean/std in raw pixel units
    raw = np.asarray(out)
    assert abs(raw.mean() - 128.0) < 0.5
    assert abs(raw.std() - 5.0) < 0.5
