"""Synchronized random flip tests."""

import jax
import jax.numpy as jnp
import numpy as np

from fmc_uia_tpu.ops.image import random_flips


def _batch():
    rng = np.random.RandomState(0)
    return jnp.asarray(rng.randint(0, 255, (4, 8, 8, 3)).astype(np.uint8))


def test_no_flip_identity():
    imgs = _batch()
    labels = jnp.zeros((4, 8, 8), jnp.int32)
    out_i, out_l = random_flips(jax.random.PRNGKey(0), imgs, labels,
                                "segmentation", 0.0, 0.0)
    np.testing.assert_array_equal(np.asarray(out_i), np.asarray(imgs))


def test_seg_mask_flips_with_image():
    imgs = _batch()
    rng = np.random.RandomState(1)
    labels = jnp.asarray(rng.randint(0, 2, (4, 8, 8)).astype(np.int32))
    out_i, out_l = random_flips(jax.random.PRNGKey(3), imgs, labels,
                                "segmentation", 1.0, 0.0)
    np.testing.assert_array_equal(np.asarray(out_i),
                                  np.asarray(imgs)[:, :, ::-1])
    np.testing.assert_array_equal(np.asarray(out_l),
                                  np.asarray(labels)[:, :, ::-1])


def test_detection_box_flip_geometry():
    imgs = _batch()
    boxes = jnp.asarray([[0.1, 0.2, 0.4, 0.5],
                         [-1, -1, -1, -1],  # invalid: untouched
                         [0.0, 0.0, 1.0, 1.0],
                         [0.3, 0.3, 0.6, 0.9]], jnp.float32)
    _, out = random_flips(jax.random.PRNGKey(0), imgs, boxes,
                          "detection", 1.0, 0.0)
    out = np.asarray(out)
    np.testing.assert_allclose(out[0], [0.6, 0.2, 0.9, 0.5], atol=1e-6)
    np.testing.assert_allclose(out[1], [-1, -1, -1, -1], atol=1e-6)
    np.testing.assert_allclose(out[2], [0.0, 0.0, 1.0, 1.0], atol=1e-6)
    # boxes stay well-formed (x1 < x2)
    assert (out[[0, 2, 3], 0] < out[[0, 2, 3], 2]).all()


def test_regression_point_flip():
    imgs = _batch()
    pts = jnp.asarray([[0.1, 0.2, 0.7, 0.9]] * 4, jnp.float32)
    _, out_h = random_flips(jax.random.PRNGKey(0), imgs, pts,
                            "Regression", 1.0, 0.0)
    np.testing.assert_allclose(np.asarray(out_h)[0],
                               [0.9, 0.2, 0.3, 0.9], atol=1e-6)
    _, out_v = random_flips(jax.random.PRNGKey(0), imgs, pts,
                            "Regression", 0.0, 1.0)
    np.testing.assert_allclose(np.asarray(out_v)[0],
                               [0.1, 0.8, 0.7, 0.1], atol=1e-6)


def test_classification_labels_untouched():
    imgs = _batch()
    labels = jnp.asarray([0, 1, 2, 1], jnp.int32)
    _, out = random_flips(jax.random.PRNGKey(0), imgs, labels,
                          "classification", 1.0, 1.0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(labels))
