"""Fused window-attention kernel tests.

The Pallas kernel lowers for TPU only; on the CPU test mesh we verify the
reference path + group-size logic, and the kernel itself when a TPU is
available (run manually: JAX_PLATFORMS=tpu pytest tests/test_window_attention.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fmc_uia_tpu.ops.window_attention import (
    _reference_attention,
    fused_window_attention,
    pick_group_size,
)


def test_pick_group_size():
    # divides nW and Bn, respects the VMEM budget
    assert pick_group_size(4096, 256, 64, 32) == 16
    assert pick_group_size(4096, 256, 64, 32, vmem_budget=1 << 20) == 8
    assert pick_group_size(64, 6, 64, 32) == 2  # nW=6 -> G in {2,1}
    assert pick_group_size(64, 7, 64, 32) == 1  # prime nW


def test_reference_attention_math():
    """Reference path == explicit per-window softmax attention."""
    rng = np.random.RandomState(0)
    Bn, N, C, H = 8, 16, 32, 2
    dh = C // H
    nW = 4
    qkv = rng.randn(Bn, N, 3 * C).astype(np.float32)
    addmask = rng.randn(H, nW, N, N).astype(np.float32) * 0.1

    out = np.asarray(_reference_attention(
        jnp.asarray(qkv), jnp.asarray(addmask), H))

    q = qkv[..., :C].reshape(Bn, N, H, dh)
    k = qkv[..., C : 2 * C].reshape(Bn, N, H, dh)
    v = qkv[..., 2 * C :].reshape(Bn, N, H, dh)
    expected = np.zeros((Bn, N, C), np.float32)
    for b in range(Bn):
        for h in range(H):
            s = (q[b, :, h] / np.sqrt(dh)) @ k[b, :, h].T
            s = s + addmask[h, b % nW]
            e = np.exp(s - s.max(axis=1, keepdims=True))
            p = e / e.sum(axis=1, keepdims=True)
            expected[b, :, h * dh : (h + 1) * dh] = p @ v[b, :, h]
    np.testing.assert_allclose(out, expected, rtol=2e-3, atol=2e-3)


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="Pallas TPU kernel requires TPU")
def test_fused_matches_reference_on_tpu():  # pragma: no cover (CPU CI)
    rng = np.random.RandomState(0)
    Bn, N, C, H = 64, 64, 128, 4
    qkv = jnp.asarray(rng.randn(Bn, N, 3 * C).astype(np.float32))
    nW = 16
    mask = jnp.asarray(
        rng.choice([0.0, -100.0], size=(nW, N, N)).astype(np.float32))
    bias = jnp.asarray(rng.randn(H, N, N).astype(np.float32) * 0.1)
    addmask = bias[:, None] + mask[None]
    G = pick_group_size(Bn, nW, N, C // H)
    out_f = fused_window_attention(qkv, addmask, H, G)
    out_r = _reference_attention(qkv, addmask, H)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_r),
                               atol=2e-2)
