"""Probe: fused-block backward mode (recompute-vjp vs hand-written
analytic pullback) at swin_b 512^2 stage shapes, on TPU.

The vjp pullback's matmuls carry f32 cotangent operands (half-or-worse MXU
rate) and re-differentiate the lane-sliced head gather as scatter-adds;
the analytic pullback keeps every matmul a bf16-operand head-batched
dot_general. Run:  python scripts/probe_bwd_mode.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from fmc_uia_tpu.ops.swin_block_pallas import fused_attention_branch

sys.path.insert(0, os.path.dirname(__file__))
from probe_fused_block import _STAGE_SHAPES, make_args, timed  # noqa: E402


def main():
    print("backend:", jax.default_backend(), file=sys.stderr)
    which = os.environ.get("PROBE_STAGES",
                           "stage0,stage1,stage2,stage3").split(",")
    for name in which:
        B, S, C, H = _STAGE_SHAPES[name]
        rng = np.random.RandomState(0)
        args = make_args(rng, B, S, C, H, 8, True)
        x, lns, lnb, wqkv, bqkv, wproj, bproj, bias, mask = args

        grads = {}
        times = {}
        for mode in ("vjp", "analytic"):
            os.environ["FMC_FUSED_BWD"] = mode

            def loss(xx, ws_, bs_):
                return jnp.sum(fused_attention_branch(
                    xx, lns, lnb, ws_, bqkv, bs_, bproj, bias, mask,
                    num_heads=H).astype(jnp.float32) ** 2)

            g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
            t0 = time.time()
            grads[mode] = jax.block_until_ready(g(x, wqkv, wproj))
            print(f"{name} [{mode}] compile+first: {time.time() - t0:.1f}s",
                  file=sys.stderr)
            times[mode] = timed(g, x, wqkv, wproj, iters=10)

        for a, b, nm in zip(grads["vjp"], grads["analytic"],
                            ("dx", "dwqkv", "dwproj")):
            a = np.asarray(a, np.float32)
            b = np.asarray(b, np.float32)
            scale = np.maximum(np.abs(a).max(), 1e-6)
            gd = np.median(np.abs(a - b) / np.maximum(np.abs(a), 1e-2 * scale))
            print(f"    {name} grad {nm}: median drift {gd:.5f}")
        print(f"{name}: fwd+bwd vjp {times['vjp']:.2f} ms vs analytic "
              f"{times['analytic']:.2f} ms "
              f"({times['vjp'] / times['analytic']:.2f}x)")


if __name__ == "__main__":
    main()
