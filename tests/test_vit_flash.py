"""ViT global attention: flash-kernel gating, CPU fallback, qkv layout.

The flash Pallas kernel itself is TPU-only (exercised by
scripts/probe_vit_flash.py and the TPU-gated test at the bottom); on the
CPU test mesh `global_attention` must transparently fall back to the XLA
einsum path so 'auto'/'on' configs stay runnable everywhere.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fmc_uia_tpu.ops.vit_attention import _xla_attention, global_attention


def _qkv(rng, B=2, H=3, N=1029, dh=32):
    q = jnp.asarray(rng.randn(B, H, N, dh) * 0.3, jnp.float32)
    k = jnp.asarray(rng.randn(B, H, N, dh) * 0.3, jnp.float32)
    v = jnp.asarray(rng.randn(B, H, N, dh) * 0.3, jnp.float32)
    return q, k, v


def test_cpu_fallback_matches_reference():
    rng = np.random.RandomState(0)
    q, k, v = _qkv(rng, N=260)
    out = global_attention(q, k, v, sm_scale=32 ** -0.5, use_flash=True)
    ref = _xla_attention(q, k, v, 32 ** -0.5)
    if jax.default_backend() != "tpu":
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)
    else:  # kernel path: bf16-class drift
        np.testing.assert_allclose(np.asarray(out, np.float32),
                                   np.asarray(ref, np.float32),
                                   rtol=2e-2, atol=2e-2)


def test_vit_block_flash_gate_runs_long_sequence():
    """'auto' flips to the flash path at N>=1024; on CPU that must still
    produce the einsum numbers (fallback inside global_attention)."""
    from fmc_uia_tpu.models.encoders.vit import ViTBlock

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 1029, 64) * 0.2, jnp.float32)
    auto = ViTBlock(dim=64, num_heads=2, flash_attention="auto")
    off = ViTBlock(dim=64, num_heads=2, flash_attention="off")
    params = auto.init(jax.random.PRNGKey(0), x)
    y_auto = auto.apply(params, x)
    y_off = off.apply(params, x)
    assert y_auto.shape == x.shape
    assert np.isfinite(np.asarray(y_auto)).all()
    if jax.default_backend() != "tpu":
        np.testing.assert_allclose(np.asarray(y_auto), np.asarray(y_off),
                                   rtol=1e-5, atol=1e-5)


def test_flash_gate_short_sequence_uses_einsum():
    from fmc_uia_tpu.models.encoders.vit import ViTBlock

    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 80, 64) * 0.2, jnp.float32)
    blk = ViTBlock(dim=64, num_heads=2, flash_attention="auto")
    params = blk.init(jax.random.PRNGKey(0), x)
    y = blk.apply(params, x)
    assert y.shape == x.shape and np.isfinite(np.asarray(y)).all()


def test_flash_config_knob_validation():
    from fmc_uia_tpu.models.encoders.vit import build_vit_encoder
    from tests.helpers import make_tiny_config

    cfg = make_tiny_config()
    cfg.config["model"]["encoder"]["flash_attention"] = "sideways"
    with pytest.raises(ValueError, match="flash_attention"):
        build_vit_encoder("vit_nano", cfg)
    cfg.config["model"]["encoder"]["flash_attention"] = True
    enc = build_vit_encoder("vit_nano", cfg)
    assert enc.flash_attention == "on"


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="Pallas flash kernel; run with JAX_PLATFORMS=tpu")
def test_flash_kernel_grads_match_reference_tpu():
    rng = np.random.RandomState(3)
    q, k, v = _qkv(rng, B=1, H=2, N=1029, dh=64)
    scale = 64 ** -0.5

    def loss_flash(q, k, v):
        return jnp.sum(global_attention(
            q, k, v, sm_scale=scale).astype(jnp.float32) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_xla_attention(q, k, v, scale).astype(
            jnp.float32) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, nm in zip(gf, gr, "qkv"):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        scale_b = max(np.abs(b).max(), 1e-6)
        drift = np.median(np.abs(a - b) / np.maximum(np.abs(b),
                                                     1e-2 * scale_b))
        assert drift < 2e-2, (nm, drift)
