"""Albumentations bit-parity harness for the validation path.

The reference val pipeline is ``A.Compose([A.Resize(S,S), A.Normalize(mean,
std), ToTensorV2])`` (reference train.py:47-54). Albumentations is not
installed here, but those two transforms are thin wrappers with exact,
documented semantics:

  * A.Resize     -> cv2.resize(img, (S, S), interpolation=INTER_LINEAR)
                    (masks: INTER_NEAREST)
  * A.Normalize  -> (img - mean*255) / (std*255)   (max_pixel_value=255)

so the parity oracle is that composed cv2/numpy computation itself. The
claim under test: our host resize (data/dataset.py:_resize_image/_resize_
mask) is BIT-identical to the reference's resize, and the device-side
normalize (ops/image.py:normalize_images) matches the float formula to
f32 rounding. Train-path photometric RNG is intentionally different
(device PRNG; documented in ops/image.py) and is not asserted here.
"""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from fmc_uia_tpu.data.dataset import _resize_image, _resize_mask
from fmc_uia_tpu.ops.image import normalize_images

MEAN = [0.33841, 0.33086, 0.33520]
STD = [0.18361, 0.17918, 0.18268]


def _ref_val_transform(img, size, mean, std):
    """What A.Resize + A.Normalize compute (composed oracle)."""
    r = cv2.resize(img, (size, size), interpolation=cv2.INTER_LINEAR)
    m = np.asarray(mean, np.float32) * 255.0
    s = np.asarray(std, np.float32) * 255.0
    return (r.astype(np.float32) - m) / s


@pytest.mark.parametrize("hw", [(300, 420), (512, 512), (97, 233)])
def test_val_image_resize_bit_parity(hw, rng):
    img = rng.randint(0, 256, (*hw, 3)).astype(np.uint8)
    ours = _resize_image(img, 224)
    ref = cv2.resize(img, (224, 224), interpolation=cv2.INTER_LINEAR)
    np.testing.assert_array_equal(ours, ref)  # bit-identical


@pytest.mark.parametrize("hw", [(300, 420), (97, 233)])
def test_val_mask_resize_bit_parity(hw, rng):
    mask = rng.randint(0, 5, hw).astype(np.uint8)
    ours = _resize_mask(mask, 224)
    ref = cv2.resize(mask, (224, 224), interpolation=cv2.INTER_NEAREST)
    np.testing.assert_array_equal(ours, ref)


def test_val_normalize_matches_albumentations_formula(rng):
    img = rng.randint(0, 256, (2, 64, 64, 3)).astype(np.uint8)
    ours = np.asarray(normalize_images(img, MEAN, STD))
    ref = np.stack([_ref_val_transform(im, 64, MEAN, STD) for im in img])
    np.testing.assert_allclose(ours, ref, rtol=0, atol=1e-6)


def test_val_end_to_end_parity(rng):
    """resize -> normalize chain == the composed albumentations oracle."""
    img = rng.randint(0, 256, (417, 299, 3)).astype(np.uint8)
    ours = np.asarray(
        normalize_images(_resize_image(img, 224)[None], MEAN, STD))[0]
    ref = _ref_val_transform(img, 224, MEAN, STD)
    np.testing.assert_allclose(ours, ref, rtol=0, atol=1e-6)
