"""Probe: flash vs XLA-einsum global attention at ViT/DINOv3 shapes.

Wall-clock timing is valid here (both paths are well above the ~5 ms axon
dispatch floor at these sizes). Also demonstrates the capability gap: the
einsum path at 512^2 patch-8 scale (N=4101) materializes [B,H,N,N] scores
and OOMs at modest batch; flash runs it.

Run on TPU:  python scripts/probe_vit_flash.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from fmc_uia_tpu.ops.vit_attention import _xla_attention, global_attention


def timed(fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    print("backend:", jax.default_backend(), file=sys.stderr)
    shapes = [
        ("vit_b 512^2/p16 (N=1024+5)", 8, 12, 1029, 64),
        ("vit_b 512^2/p8  (N=4096+5)", 4, 12, 4101, 64),
    ]
    for name, B, H, N, dh in shapes:
        rng = np.random.RandomState(0)
        q = jnp.asarray(rng.randn(B, H, N, dh) * 0.3, jnp.bfloat16)
        k = jnp.asarray(rng.randn(B, H, N, dh) * 0.3, jnp.bfloat16)
        v = jnp.asarray(rng.randn(B, H, N, dh) * 0.3, jnp.bfloat16)
        scale = dh ** -0.5

        flash = jax.jit(lambda q, k, v: global_attention(
            q, k, v, sm_scale=scale))
        ref = jax.jit(lambda q, k, v: _xla_attention(q, k, v, scale))

        def gtime(f):
            loss = jax.jit(jax.grad(
                lambda q, k, v: jnp.sum(f(q, k, v).astype(jnp.float32) ** 2),
                argnums=(0, 1, 2)))
            return timed(loss, q, k, v, iters=5)

        t_flash = timed(flash, q, k, v)
        tg_flash = gtime(lambda q, k, v: global_attention(
            q, k, v, sm_scale=scale))
        print(f"{name}: flash fwd {t_flash:.2f} ms, fwd+bwd "
              f"{tg_flash:.2f} ms (B={B})")
        try:
            a = np.asarray(flash(q, k, v), np.float32)
            b = np.asarray(ref(q, k, v), np.float32)
            drift = np.median(np.abs(a - b) / np.maximum(np.abs(b), 1e-2))
            t_ref = timed(ref, q, k, v)
            tg_ref = gtime(lambda q, k, v: _xla_attention(q, k, v, scale))
            print(f"{name}: XLA   fwd {t_ref:.2f} ms, fwd+bwd "
                  f"{tg_ref:.2f} ms | median drift {drift:.5f}")
        except Exception as e:
            print(f"{name}: XLA einsum path failed "
                  f"({type(e).__name__}: {str(e)[:120]}) — expected OOM at "
                  "this scale; flash is the only viable path")


if __name__ == "__main__":
    main()
