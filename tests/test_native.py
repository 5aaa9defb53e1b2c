"""Native preprocessing library tests (built on demand)."""

import numpy as np
import pytest

from fmc_uia_tpu import native


@pytest.fixture(scope="module", autouse=True)
def built():
    if not native.available():
        from fmc_uia_tpu.native.build import build

        try:
            build(verbose=False)
        except Exception as e:
            pytest.skip(f"native build unavailable: {e}")
    import importlib

    importlib.reload(native)
    assert native.available()


def test_bilinear_matches_cv2_within_1():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (180, 260, 3)).astype(np.uint8)
    ours = native.resize_bilinear(img, 96, 128)
    ref = cv2.resize(img, (128, 96), interpolation=cv2.INTER_LINEAR)
    assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 1


def test_nearest_preserves_label_set():
    rng = np.random.RandomState(1)
    mask = rng.randint(0, 4, (77, 91)).astype(np.uint8)
    out = native.resize_nearest(mask, 64, 64)
    assert set(np.unique(out)).issubset(set(np.unique(mask)))
    assert out.shape == (64, 64)


def test_batch_resize_threaded():
    rng = np.random.RandomState(2)
    imgs = [rng.randint(0, 256, (rng.randint(50, 120),
                                  rng.randint(50, 120), 3)).astype(np.uint8)
            for _ in range(9)]
    batch = native.resize_batch(imgs, 64, 64, bilinear=True, num_threads=4)
    assert batch.shape == (9, 64, 64, 3)
    for i, im in enumerate(imgs):
        single = native.resize_bilinear(im, 64, 64)
        np.testing.assert_array_equal(batch[i], single)
