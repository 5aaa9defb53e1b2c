"""Standalone probe: fused Pallas attention branch vs XLA at Swin stage
shapes. Run on TPU:  python scripts/probe_fused_block.py

Correctness (vs pure-jnp reference) + fwd and fwd+bwd wall times at
stage-0 (128^2 grid, C=128, H=4) and stage-1 (64^2, C=256, H=8) scale,
batch 16, window 8. Decides whether the kernel ships (PERF.md records the
result either way).
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from fmc_uia_tpu.ops.swin_block_pallas import (
    _branch_math,
    fused_attention_branch,
)


def xla_reference(x, lns, lnb, wqkv, bqkv, wproj, bproj, bias, mask, H):
    """Same math, plain XLA (what the current SwinBlock path does, modulo
    module plumbing)."""
    B, Hp, Wp, C = x.shape
    ws = int(round(bias.shape[-1] ** 0.5))

    def tile_fn(xt):
        return _branch_math(xt, lns, lnb, wqkv, bqkv, wproj, bproj, bias,
                            None if mask is None else None,
                            num_heads=H, ws=ws, compute_dtype=x.dtype)

    # full-batch version with window partition like swin.py
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, -1, keepdims=True)
    var = jnp.mean(xf * xf, -1, keepdims=True) - mu * mu
    xn = ((xf - mu) * jax.lax.rsqrt(var + 1e-6) * lns + lnb).astype(x.dtype)
    w = xn.reshape(B, Hp // ws, ws, Wp // ws, ws, C)
    w = w.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, C)
    qkv = w @ wqkv.astype(x.dtype) + bqkv.astype(x.dtype)
    N = ws * ws
    Bn = w.shape[0]
    dh = C // H
    q = qkv[..., :C].reshape(Bn, N, H, dh)
    k = qkv[..., C:2 * C].reshape(Bn, N, H, dh)
    v = qkv[..., 2 * C:].reshape(Bn, N, H, dh)
    s = jnp.einsum("bnhd,bmhd->bhnm", q * (dh ** -0.5), k,
                   preferred_element_type=jnp.float32)
    s = s + bias[None]
    if mask is not None:
        nW = mask.shape[0]
        s = s.reshape(Bn // nW, nW, H, N, N) + mask[None, :, None]
        s = s.reshape(Bn, H, N, N)
    p = jax.nn.softmax(s, -1).astype(x.dtype)
    o = jnp.einsum("bhnm,bmhd->bnhd", p, v,
                   preferred_element_type=jnp.float32).astype(x.dtype)
    o = o.reshape(Bn, N, C) @ wproj.astype(x.dtype) + bproj.astype(x.dtype)
    o = o.reshape(B, Hp // ws, Wp // ws, ws, ws, C)
    return o.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, C).astype(
        x.dtype)


def make_args(rng, B, S, C, H, ws, with_mask, dtype=jnp.bfloat16):
    N = ws * ws
    x = jnp.asarray(rng.randn(B, S, S, C) * 0.5, dtype)
    lns = jnp.asarray(1.0 + 0.1 * rng.randn(C), jnp.float32)
    lnb = jnp.asarray(0.1 * rng.randn(C), jnp.float32)
    wqkv = jnp.asarray(rng.randn(C, 3 * C) / np.sqrt(C), jnp.float32)
    bqkv = jnp.asarray(0.02 * rng.randn(3 * C), jnp.float32)
    wproj = jnp.asarray(rng.randn(C, C) / np.sqrt(C), jnp.float32)
    bproj = jnp.asarray(0.02 * rng.randn(C), jnp.float32)
    bias = jnp.asarray(0.1 * rng.randn(H, N, N), jnp.float32)
    mask = None
    if with_mask:
        nW = (S // ws) ** 2
        m = np.zeros((nW, N, N), np.float32)
        m[::3, :, : N // 2] = -100.0
        mask = jnp.asarray(m)
    return x, lns, lnb, wqkv, bqkv, wproj, bproj, bias, mask


def timed(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


_STAGE_SHAPES = {  # swin_b @ 512^2, batch 16
    "stage0": (16, 128, 128, 4),
    "stage1": (16, 64, 256, 8),
    "stage2": (16, 32, 512, 16),
    "stage3": (16, 16, 1024, 32),
}


def main():
    print("backend:", jax.default_backend(), file=sys.stderr)
    which = os.environ.get("PROBE_STAGES", "stage0,stage1").split(",")
    for name in which:
        B, S, C, H = _STAGE_SHAPES[name]
        for with_mask in (False, True):
            rng = np.random.RandomState(0)
            args = make_args(rng, B, S, C, H, 8, with_mask)
            x, lns, lnb, wqkv, bqkv, wproj, bproj, bias, mask = args

            fused = jax.jit(functools.partial(
                fused_attention_branch, num_heads=H))
            ref = jax.jit(functools.partial(xla_reference, H=H))

            y_f = fused(x, lns, lnb, wqkv, bqkv, wproj, bproj, bias, mask)
            y_r = ref(x, lns, lnb, wqkv, bqkv, wproj, bproj, bias, mask)
            a = np.asarray(y_f, np.float32)
            b = np.asarray(y_r, np.float32)
            drift = np.median(np.abs(a - b) / np.maximum(np.abs(b), 1e-2))
            print(f"{name} mask={with_mask}: median drift {drift:.5f}")

            t_f = timed(fused, x, lns, lnb, wqkv, bqkv, wproj, bproj,
                        bias, mask)
            t_r = timed(ref, x, lns, lnb, wqkv, bqkv, wproj, bproj, bias,
                        mask)
            print(f"{name} mask={with_mask}: fwd fused {t_f:.2f} ms vs "
                  f"XLA {t_r:.2f} ms")

            def loss_f(xx, ws_, bs_):
                return jnp.sum(fused_attention_branch(
                    xx, lns, lnb, ws_, bqkv, bs_, bproj, bias, mask,
                    num_heads=H).astype(jnp.float32) ** 2)

            def loss_r(xx, ws_, bs_):
                return jnp.sum(xla_reference(
                    xx, lns, lnb, ws_, bqkv, bs_, bproj, bias, mask,
                    H=H).astype(jnp.float32) ** 2)

            gf = jax.jit(jax.grad(loss_f, argnums=(0, 1, 2)))
            gr = jax.jit(jax.grad(loss_r, argnums=(0, 1, 2)))
            gfo = gf(x, wqkv, wproj)
            gro = gr(x, wqkv, wproj)
            for gfl, grl, nm in zip(gfo, gro, ("dx", "dwqkv", "dwproj")):
                a = np.asarray(gfl, np.float32)
                b = np.asarray(grl, np.float32)
                scale = np.maximum(np.abs(b).max(), 1e-6)
                gd = np.median(np.abs(a - b) / np.maximum(np.abs(b),
                                                          1e-2 * scale))
                print(f"    grad {nm}: median drift {gd:.5f}")
            t_gf = timed(gf, x, wqkv, wproj, iters=10)
            t_gr = timed(gr, x, wqkv, wproj, iters=10)
            print(f"{name} mask={with_mask}: fwd+bwd fused {t_gf:.2f} ms "
                  f"vs XLA {t_gr:.2f} ms")


if __name__ == "__main__":
    main()
