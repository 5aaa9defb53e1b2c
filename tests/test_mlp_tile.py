"""Fused-MLP kernel tile selection and XLA fallback.

Regression for the swin_t@224² failure: stage 1 has T = 8·28·28 = 6272
tokens = 128·49 — no power-of-two tile divides it, and the old picker fell
back to ONE whole-T program whose scoped-VMEM stack (97 MB) blew the 64 MB
Mosaic limit at compile time (seen as a tpu_compile_helper 500 inside the
TPU fit proof). The picker now scans general divisors and returns 0 when
nothing fits, and ``fused_mlp_branch`` falls back to the identical math
under XLA.
"""

import jax
import jax.numpy as jnp

import fmc_uia_tpu.ops.swin_block_pallas as sbp


def _fits(tt, C, Ch, bwd):
    w_bytes = 12 * C * Ch
    factor = 2.5 if bwd else 1.0
    budget = int(sbp._MLP_VMEM_LIMIT * 0.72)
    return w_bytes + tt * (12 * C + 6 * Ch) * factor <= budget


def test_pow2_shapes_unchanged():
    # swin_b@512² stage 0: T = B·128² — the power-of-two ladder applies
    assert sbp._pick_mlp_tile(393216, 128, 512, bwd=True) == 4096


def test_non_pow2_divisor_tile():
    # swin_t@224² stage 1: T = 6272 = 128·49
    for bwd in (False, True):
        tt = sbp._pick_mlp_tile(6272, 192, 768, bwd=bwd)
        assert tt > 0 and 6272 % tt == 0 and tt % 8 == 0
        assert _fits(tt, 192, 768, bwd)


def test_returns_zero_when_nothing_fits():
    assert sbp._pick_mlp_tile(6272, 8192, 32768, bwd=True) == 0


def test_fallback_matches_mlp_math():
    # T = 98 has no multiple-of-8 divisor -> XLA fallback path
    key = jax.random.PRNGKey(0)
    B, H, W, C, Ch = 2, 7, 7, 16, 64
    ks = jax.random.split(key, 3)
    x = jax.random.normal(ks[0], (B, H, W, C), jnp.float32)
    lns, lnb = jnp.ones((C,)), jnp.zeros((C,))
    w1 = jax.random.normal(ks[1], (C, Ch)) * 0.02
    w2 = jax.random.normal(ks[2], (Ch, C)) * 0.02
    b1, b2 = jnp.zeros((Ch,)), jnp.zeros((C,))
    assert sbp._pick_mlp_tile(B * H * W, C, Ch, bwd=False) == 0

    y = sbp.fused_mlp_branch(x, lns, lnb, w1, b1, w2, b2)
    ref = sbp._mlp_math(x.reshape(-1, C), lns, lnb, w1, b1, w2, b2,
                        jnp.ones((1, 1), x.dtype),
                        compute_dtype=x.dtype).reshape(x.shape)
    assert float(jnp.max(jnp.abs(y - ref))) == 0.0

    g = jax.grad(lambda p: jnp.sum(
        sbp.fused_mlp_branch(x, lns, lnb, p, b1, w2, b2) ** 2))(w1)
    assert bool(jnp.all(jnp.isfinite(g)))
