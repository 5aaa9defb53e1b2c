"""Probe: intra-kernel time split of the fused Swin attention forward.

Times stripped variants of the kernel body at stage shapes to attribute
per-program cost: full branch vs attention-matmuls-removed vs
projections-removed (layout+LN only). Guides where kernel optimization
effort should go. Run on TPU:  python scripts/probe_kernel_split.py

CAVEAT (measured 2026-08-17): under the axon remote-TPU tunnel,
wall-clock timing of sub-dispatch-latency kernels is unusable —
``block_until_ready`` can return early, and per-call dispatch (~5 ms)
floors every variant to the same number. For intra-kernel attribution,
run the variants under ``jax.profiler`` and read device op times from
the xplane trace instead (scripts/profile_step.py shows the parsing).
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fmc_uia_tpu.ops.swin_block_pallas import _ATTN_VMEM_LIMIT

sys.path.insert(0, os.path.dirname(__file__))
from probe_fused_block import _STAGE_SHAPES, make_args, timed  # noqa: E402


def branch_variant(x_tile, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj,
                   bias_hnn, *, num_heads, ws, variant):
    ws_, Wp, C = x_tile.shape
    G = Wp // ws
    N = ws * ws
    H = num_heads
    dh = C // H
    cdt = x_tile.dtype

    xw = x_tile.reshape(1, ws, G, ws, C).transpose(0, 2, 1, 3, 4)
    xf = xw.reshape(G * N, C).astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu
    xh = (xf - mu) * jax.lax.rsqrt(var + 1e-6)
    xn = (xh * ln_scale.astype(jnp.float32)
          + ln_bias.astype(jnp.float32)).astype(cdt)

    if variant == "layout_ln":  # no matmuls at all
        y = xn
    else:
        qkv = jnp.dot(xn, wqkv.astype(cdt),
                      preferred_element_type=jnp.float32)
        qkv = (qkv + bqkv.astype(jnp.float32)).astype(cdt)
        q = qkv[:, :C]
        v = qkv[:, 2 * C:]
        if variant == "no_attn":  # skip scores/softmax/AV, keep projections
            o = v
        else:  # full
            k = qkv[:, C:2 * C]
            scale = jnp.asarray(dh ** -0.5, cdt)

            def head_stack(t):
                parts = [t[:, h * dh:(h + 1) * dh].reshape(G, N, dh)
                         for h in range(H)]
                return jnp.stack(parts).reshape(H * G, N, dh)

            qb = head_stack(q * scale)
            kb = head_stack(k)
            vb = head_stack(v)
            s = jax.lax.dot_general(qb, kb, (((2,), (2,)), ((0,), (0,))),
                                    preferred_element_type=jnp.float32)
            s = s.reshape(H, G, N, N) + bias_hnn[:, None].astype(jnp.float32)
            p = jax.nn.softmax(s, axis=-1).astype(cdt)
            ob = jax.lax.dot_general(
                p.reshape(H * G, N, N), vb, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            ob = ob.astype(cdt).reshape(H, G, N, dh)
            o = jnp.concatenate([ob[h] for h in range(H)], axis=-1)
            o = o.reshape(G * N, C)
        y = jnp.dot(o, wproj.astype(cdt),
                    preferred_element_type=jnp.float32)
        y = (y + bproj.astype(jnp.float32)).astype(cdt)
    yw = y.reshape(1, G, ws, ws, C).transpose(0, 2, 1, 3, 4)
    return yw.reshape(ws_, Wp, C)


def kern(x_ref, lns_ref, lnb_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
         bias_ref, out_ref, *, num_heads, ws, variant):
    out_ref[0] = branch_variant(
        x_ref[0], lns_ref[0], lnb_ref[0], wqkv_ref[:], bqkv_ref[0],
        wproj_ref[:], bproj_ref[0], bias_ref[:],
        num_heads=num_heads, ws=ws, variant=variant)


def run_variant(x, lns, lnb, wqkv, bqkv, wproj, bproj, bias, H, ws, variant):
    B, Hp, Wp, C = x.shape
    N = ws * ws
    nrows = Hp // ws
    x_spec = pl.BlockSpec((1, ws, Wp, C), lambda b, r: (b, r, 0, 0),
                          memory_space=pltpu.VMEM)
    const = lambda b, r: (0, 0)  # noqa: E731
    in_specs = [
        x_spec,
        pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((C, 3 * C), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 3 * C), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((C, C), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((H, N, N), lambda b, r: (0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    f = functools.partial(kern, num_heads=H, ws=ws, variant=variant)
    call = pl.pallas_call(
        f, grid=(B, nrows), in_specs=in_specs, out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_ATTN_VMEM_LIMIT))
    return jax.jit(lambda *a: call(*a))


def main():
    print("backend:", jax.default_backend(), file=sys.stderr)
    for name in os.environ.get("PROBE_STAGES", "stage0,stage2").split(","):
        B, S, C, H = _STAGE_SHAPES[name]
        rng = np.random.RandomState(0)
        x, lns, lnb, wqkv, bqkv, wproj, bproj, bias, _ = make_args(
            rng, B, S, C, H, 8, False)
        res = {}
        for variant in ("layout_ln", "no_attn", "full"):
            fn = run_variant(x, lns, lnb, wqkv, bqkv, wproj, bproj, bias,
                             H, 8, variant)
            res[variant] = timed(fn, x, lns[None], lnb[None], wqkv,
                                 bqkv[None], wproj, bproj[None], bias)
        print(f"{name}: layout+LN {res['layout_ln']:.2f} ms | "
              f"+qkv/proj {res['no_attn']:.2f} ms | "
              f"full {res['full']:.2f} ms -> attn-part "
              f"{res['full'] - res['no_attn']:.2f} ms, matmul-part "
              f"{res['no_attn'] - res['layout_ln']:.2f} ms")


if __name__ == "__main__":
    main()
