"""Standalone probe: fused Pallas MLP branch vs XLA at Swin stage shapes.
Run on TPU:  python scripts/probe_fused_mlp.py

Correctness (vs pure-jnp reference) + fwd and fwd+bwd wall times at
stage-0 (128^2 grid, C=128) and stage-1 (64^2, C=256) scale, batch 16.
Decides whether the kernel defaults on (PERF.md records the result).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from fmc_uia_tpu.ops.swin_block_pallas import fused_mlp_branch


def xla_reference(x, lns, lnb, w1, b1, w2, b2):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, -1, keepdims=True)
    var = jnp.mean(xf * xf, -1, keepdims=True) - mu * mu
    xn = ((xf - mu) * jax.lax.rsqrt(var + 1e-6) * lns + lnb).astype(x.dtype)
    h = jax.nn.gelu(xn @ w1.astype(x.dtype) + b1.astype(x.dtype))
    return (h @ w2.astype(x.dtype) + b2.astype(x.dtype)).astype(x.dtype)


def make_args(rng, B, S, C, dtype=jnp.bfloat16):
    Ch = 4 * C
    x = jnp.asarray(rng.randn(B, S, S, C) * 0.5, dtype)
    lns = jnp.asarray(1.0 + 0.1 * rng.randn(C), jnp.float32)
    lnb = jnp.asarray(0.1 * rng.randn(C), jnp.float32)
    w1 = jnp.asarray(rng.randn(C, Ch) / np.sqrt(C), jnp.float32)
    b1 = jnp.asarray(0.02 * rng.randn(Ch), jnp.float32)
    w2 = jnp.asarray(rng.randn(Ch, C) / np.sqrt(Ch), jnp.float32)
    b2 = jnp.asarray(0.02 * rng.randn(C), jnp.float32)
    return x, lns, lnb, w1, b1, w2, b2


def timed(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    print("backend:", jax.default_backend(), file=sys.stderr)
    for name, (B, S, C) in {
        "stage0": (16, 128, 128),
        "stage1": (16, 64, 256),
        "stage2": (16, 32, 512),
    }.items():
        rng = np.random.RandomState(0)
        args = make_args(rng, B, S, C)
        x, lns, lnb, w1, b1, w2, b2 = args

        fused = jax.jit(fused_mlp_branch)
        ref = jax.jit(xla_reference)

        y_f = fused(*args)
        y_r = ref(*args)
        a = np.asarray(y_f, np.float32)
        b = np.asarray(y_r, np.float32)
        drift = np.median(np.abs(a - b) / np.maximum(np.abs(b), 1e-2))
        print(f"{name}: median drift {drift:.5f}")

        t_f = timed(fused, *args)
        t_r = timed(ref, *args)
        print(f"{name}: fwd fused {t_f:.2f} ms vs XLA {t_r:.2f} ms")

        def loss_f(xx, w1_, w2_):
            return jnp.sum(fused_mlp_branch(
                xx, lns, lnb, w1_, b1, w2_, b2).astype(jnp.float32) ** 2)

        def loss_r(xx, w1_, w2_):
            return jnp.sum(xla_reference(
                xx, lns, lnb, w1_, b1, w2_, b2).astype(jnp.float32) ** 2)

        gf = jax.jit(jax.grad(loss_f, argnums=(0, 1, 2)))
        gr = jax.jit(jax.grad(loss_r, argnums=(0, 1, 2)))
        gfo = gf(x, w1, w2)
        gro = gr(x, w1, w2)
        for gfl, grl, nm in zip(gfo, gro, ("dx", "dw1", "dw2")):
            a = np.asarray(gfl, np.float32)
            b = np.asarray(grl, np.float32)
            scale = np.maximum(np.abs(b).max(), 1e-6)
            gd = np.median(np.abs(a - b) / np.maximum(np.abs(b),
                                                      1e-2 * scale))
            print(f"    grad {nm}: median drift {gd:.5f}")
        t_gf = timed(gf, x, w1, w2, iters=10)
        t_gr = timed(gr, x, w1, w2, iters=10)
        print(f"{name}: fwd+bwd fused {t_gf:.2f} ms vs XLA {t_gr:.2f} ms")


if __name__ == "__main__":
    main()
