"""Intra-kernel attribution of the fused Swin attention BACKWARD kernel.

Same method as probe_kernel_xplane.py (device time from xplane, stripped
variants), applied to the analytic pullback:

  full      shipping _branch_pullback
  noexp     softmax recompute replaced by a linear map (cuts max/exp/sum/div)
  nodj      softmax jacobian ds = pf*(dp - rowsum(dp*pf)) replaced by ds = dp
  nogradw   weight-grad matmuls (dwqkv/dwproj) skipped (zeros written)
  nogather  head_stack/head_unstack lane-slice relayouts replaced with
            reshape-only approximations (wrong numerics, same matmul shapes)
  noln      LN recompute + LN input-grad pullback skipped (xf used as xn)
  noattnmm  the 4 pullback attention matmuls skipped (dob reused)
  hb        head-batched-weights formulation (CORRECT numerics for dx/dw):
            qkv/dxn/dwqkv as H-batched matmuls against [H, C, 3dh] weights,
            so q/k/v/dq/dk/dv never lane-slice activations; only the proj
            side keeps one stack + one concat. Weight reshape happens
            in-kernel here (real impl would pass it pre-reshaped), so the
            measured time is an UPPER bound.

Run on TPU:  python scripts/probe_bwd_xplane.py
Env: PROBE_STAGES (default stage0,stage1), PROBE_ITERS (default 30),
     PROBE_BATCH (default 16).
"""

import functools
import os
import shutil
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fmc_uia_tpu.ops.swin_block_pallas import _ATTN_VMEM_LIMIT, _LN_EPS

sys.path.insert(0, os.path.dirname(__file__))
from probe_fused_block import _STAGE_SHAPES, make_args  # noqa: E402
from probe_kernel_xplane import device_time_ms  # noqa: E402


def pullback_variant(x_tile, lns, lnb, wqkv, bqkv, wproj, bproj, bias_hnn,
                     dy_tile, *, num_heads, ws, variant):
    Rws, Wp, C = x_tile.shape
    R = Rws // ws
    G = (Wp // ws) * R
    N = ws * ws
    H = num_heads
    dh = C // H
    f32 = jnp.float32
    cdt = x_tile.dtype

    xw = x_tile.reshape(R, ws, Wp // ws, ws, C).transpose(0, 2, 1, 3, 4)
    xf = xw.reshape(G * N, C).astype(f32)
    if variant == "noln":
        rstd = jnp.ones((G * N, 1), f32)
        xh = xf
        xn = xf.astype(cdt)
    else:
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu
        rstd = jax.lax.rsqrt(var + _LN_EPS)
        xh = (xf - mu) * rstd
        xn = (xh * lns.astype(f32) + lnb.astype(f32)).astype(cdt)
    T = G * N
    scale = jnp.asarray(dh ** -0.5, cdt)
    if variant == "hb":
        # [H, C, 3dh] weight layout (in-kernel rebuild = upper bound;
        # the real formulation passes it pre-reshaped)
        w_h = jnp.stack([
            jnp.concatenate([wqkv[:, j * C + h * dh:j * C + (h + 1) * dh]
                             for j in range(3)], axis=-1)
            for h in range(H)]).astype(cdt)            # [H, C, 3dh]
        # bias omitted in the probe (timing-only; the add is negligible)
        xn_b = jnp.broadcast_to(xn[None], (H, T, C))
        qkv_b = jax.lax.dot_general(
            xn_b, w_h, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=f32).astype(cdt)    # [H, T, 3dh]
        qb = (qkv_b[..., :dh] * scale).reshape(H * G, N, dh)
        kb = qkv_b[..., dh:2 * dh].reshape(H * G, N, dh)
        vb = qkv_b[..., 2 * dh:].reshape(H * G, N, dh)
    else:
        qkv = jnp.dot(xn, wqkv.astype(cdt), preferred_element_type=f32)
        qkv = (qkv + bqkv.astype(f32)).astype(cdt)
        q = qkv[:, :C]
        k = qkv[:, C:2 * C]
        v = qkv[:, 2 * C:]

    if variant == "nogather":
        # reshape/broadcast stand-ins: wrong numerics, identical matmul
        # shapes, NO lane-offset slice/concat relayouts
        def head_stack(t):
            t0 = t[:, :dh].reshape(1, G, N, dh)
            return jnp.broadcast_to(t0, (H, G, N, dh)).reshape(
                H * G, N, dh)

        ones_uc = jnp.ones((dh, C), cdt)

        def head_unstack(tb):
            t0 = tb.reshape(H, G, N, dh)[0].reshape(G * N, dh)
            return jnp.dot(t0, ones_uc,
                           preferred_element_type=f32).astype(cdt)
    else:
        def head_stack(t):
            parts = [t[:, h * dh:(h + 1) * dh].reshape(G, N, dh)
                     for h in range(H)]
            return jnp.stack(parts).reshape(H * G, N, dh)

        def head_unstack(tb):
            t4 = tb.reshape(H, G, N, dh)
            return jnp.concatenate(
                [t4[h].reshape(G * N, dh) for h in range(H)], axis=-1)

    if variant != "hb":
        qb = head_stack(q * scale)
        kb = head_stack(k)
        vb = head_stack(v)
    s = jax.lax.dot_general(qb, kb, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=f32)
    s = s.reshape(H, G, N, N) + bias_hnn[:, None].astype(f32)
    if variant == "noexp":
        pf = s * 0.01
    else:
        pf = jax.nn.softmax(s, axis=-1)
    p = pf.astype(cdt).reshape(H * G, N, N)
    ob = jax.lax.dot_general(p, vb, (((2,), (1,)), ((0,), (0,))),
                             preferred_element_type=f32)
    obc = ob.astype(cdt).reshape(H, G, N, dh)
    o = jnp.concatenate([obc[h] for h in range(H)], axis=-1)
    o = o.reshape(G * N, C)

    dyw = dy_tile.reshape(R, ws, Wp // ws, ws, C).transpose(0, 2, 1, 3, 4)
    dyf = dyw.reshape(G * N, C).astype(cdt)
    dbproj = jnp.sum(dyf.astype(f32), axis=0)
    if variant == "nogradw":
        dwproj = jnp.zeros((C, C), f32)
    else:
        dwproj = jax.lax.dot_general(o, dyf, (((0,), (0,)), ((), ())),
                                     preferred_element_type=f32)
    do = jax.lax.dot_general(dyf, wproj.astype(cdt),
                             (((1,), (1,)), ((), ())),
                             preferred_element_type=f32)
    dob = head_stack(do.astype(cdt))
    if variant == "noattnmm":
        dvb = dob.astype(f32)
        dp = s
    else:
        dvb = jax.lax.dot_general(p, dob, (((1,), (1,)), ((0,), (0,))),
                                  preferred_element_type=f32)
        dpb = jax.lax.dot_general(dob, vb, (((2,), (2,)), ((0,), (0,))),
                                  preferred_element_type=f32)
        dp = dpb.reshape(H, G, N, N)
    if variant == "nodj":
        ds = dp
    else:
        ds = pf * (dp - jnp.sum(dp * pf, axis=-1, keepdims=True))
    dbias = jnp.sum(ds, axis=1)
    dsb = ds.reshape(H * G, N, N).astype(cdt)
    if variant == "noattnmm":
        dqb = kb.astype(f32) + dsb[:, :, :1]
        dkb = qb.astype(f32) + dsb[:, :, :1]
    else:
        dqb = jax.lax.dot_general(dsb, kb, (((2,), (1,)), ((0,), (0,))),
                                  preferred_element_type=f32)
        dkb = jax.lax.dot_general(dsb, qb, (((1,), (1,)), ((0,), (0,))),
                                  preferred_element_type=f32)
    if variant == "hb":
        dq_b = (dqb.astype(cdt) * scale).reshape(H, T, dh)
        dk_b = dkb.astype(cdt).reshape(H, T, dh)
        dv_b = dvb.astype(cdt).reshape(H, T, dh)
        dqkv_b = jnp.concatenate([dq_b, dk_b, dv_b], axis=-1)  # [H,T,3dh]
        # probe-only shape shim for the [1, 3C] out_spec (tiny)
        dbqkv = jnp.full((3 * C,), jnp.sum(dqkv_b.astype(f32)), f32)
        dwqkv = jax.lax.dot_general(
            xn_b, dqkv_b, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=f32)                 # [H, C, 3dh]
        dxn_b = jax.lax.dot_general(
            dqkv_b, w_h, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=f32)                 # [H, T, C]
        dxn = jnp.sum(dxn_b, axis=0)
    else:
        dq = head_unstack(dqb.astype(cdt)) * scale
        dk = head_unstack(dkb.astype(cdt))
        dv = head_unstack(dvb.astype(cdt))
        dqkv = jnp.concatenate([dq, dk, dv], axis=-1)
        dbqkv = jnp.sum(dqkv.astype(f32), axis=0)
        if variant == "nogradw":
            dwqkv = jnp.zeros((C, 3 * C), f32)
        else:
            dwqkv = jax.lax.dot_general(xn, dqkv, (((0,), (0,)), ((), ())),
                                        preferred_element_type=f32)
        dxn = jax.lax.dot_general(dqkv, wqkv.astype(cdt),
                                  (((1,), (1,)), ((), ())),
                                  preferred_element_type=f32)
    dg = jnp.sum(dxn * xh, axis=0)
    dbeta = jnp.sum(dxn, axis=0)
    if variant == "noln":
        dxf = dxn
    else:
        dxh = dxn * lns.astype(f32)
        dxf = (dxh - jnp.mean(dxh, axis=-1, keepdims=True)
               - xh * jnp.mean(dxh * xh, axis=-1, keepdims=True)) * rstd
    dxw = dxf.astype(x_tile.dtype).reshape(R, Wp // ws, ws, ws, C)
    dx_tile = dxw.transpose(0, 2, 1, 3, 4).reshape(Rws, Wp, C)
    return dx_tile, dg, dbeta, dwqkv, dbqkv, dwproj, dbproj, dbias


def kern(x_ref, lns_ref, lnb_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
         bias_ref, dy_ref, dx_ref, dlns_ref, dlnb_ref, dwqkv_ref, dbqkv_ref,
         dwproj_ref, dbproj_ref, dbias_ref, *, num_heads, ws, variant):
    (dx, dlns, dlnb, dwqkv, dbqkv, dwproj, dbproj, dbias) = pullback_variant(
        x_ref[0], lns_ref[0], lnb_ref[0], wqkv_ref[:], bqkv_ref[0],
        wproj_ref[:], bproj_ref[0], bias_ref[:], dy_ref[0],
        num_heads=num_heads, ws=ws, variant=variant)
    dx_ref[0] = dx
    first = jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0)

    @pl.when(first)
    def _():
        dlns_ref[0] = dlns
        dlnb_ref[0] = dlnb
        dwqkv_ref[:] = dwqkv
        dbqkv_ref[0] = dbqkv
        dwproj_ref[:] = dwproj
        dbproj_ref[0] = dbproj
        dbias_ref[:] = dbias

    @pl.when(jnp.logical_not(first))
    def _():
        dlns_ref[0] += dlns
        dlnb_ref[0] += dlnb
        dwqkv_ref[:] += dwqkv
        dbqkv_ref[0] += dbqkv
        dwproj_ref[:] += dwproj
        dbproj_ref[0] += dbproj
        dbias_ref[:] += dbias


def build(x, H, ws, variant):
    B, Hp, Wp, C = x.shape
    N = ws * ws
    dh = C // H
    nrows = Hp // ws
    x_spec = pl.BlockSpec((1, ws, Wp, C), lambda b, r: (b, r, 0, 0),
                          memory_space=pltpu.VMEM)
    const = lambda b, r: (0, 0)  # noqa: E731
    w_specs = [
        pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((C, 3 * C), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 3 * C), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((C, C), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((H, N, N), lambda b, r: (0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    in_specs = [x_spec] + w_specs + [x_spec]
    out_specs = [x_spec] + list(w_specs)
    out_shapes = [
        jax.ShapeDtypeStruct(x.shape, x.dtype),
        jax.ShapeDtypeStruct((1, C), jnp.float32),
        jax.ShapeDtypeStruct((1, C), jnp.float32),
        jax.ShapeDtypeStruct((C, 3 * C), jnp.float32),
        jax.ShapeDtypeStruct((1, 3 * C), jnp.float32),
        jax.ShapeDtypeStruct((C, C), jnp.float32),
        jax.ShapeDtypeStruct((1, C), jnp.float32),
        jax.ShapeDtypeStruct((H, N, N), jnp.float32),
    ]
    if variant == "hb":  # dwqkv stays in head-batched layout
        out_specs[3] = pl.BlockSpec((H, C, 3 * dh), lambda b, r: (0, 0, 0),
                                    memory_space=pltpu.VMEM)
        out_shapes[3] = jax.ShapeDtypeStruct((H, C, 3 * dh), jnp.float32)
    f = functools.partial(kern, num_heads=H, ws=ws, variant=variant)
    call = pl.pallas_call(
        f, grid=(B, nrows), in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_ATTN_VMEM_LIMIT))
    return jax.jit(lambda *a: call(*a))


def main():
    print("backend:", jax.default_backend(), file=sys.stderr)
    iters = int(os.environ.get("PROBE_ITERS", "30"))
    batch = int(os.environ.get("PROBE_BATCH", "16"))
    stages = os.environ.get("PROBE_STAGES", "stage0,stage1").split(",")
    variants = os.environ.get(
        "PROBE_VARIANTS", "full,noexp,nodj,nogradw").split(",")

    for name in stages:
        _, S, C, H = _STAGE_SHAPES[name]
        rng = np.random.RandomState(0)
        x, lns, lnb, wqkv, bqkv, wproj, bproj, bias, _ = make_args(
            rng, batch, S, C, H, 8, False)
        dy = jnp.asarray(np.asarray(
            rng.randn(*x.shape), np.float32) * 0.1, x.dtype)
        print(f"\n=== {name} bwd: B={batch} grid {S}x{S} C={C} H={H} ===")
        results = {}
        for variant in variants:
            fn = build(x, H, 8, variant)
            args = (x, lns[None], lnb[None], wqkv, bqkv[None], wproj,
                    bproj[None], bias, dy)
            jax.block_until_ready(fn(*args))
            tdir = f"/tmp/fmc_bprobe/{name}_{variant}"
            shutil.rmtree(tdir, ignore_errors=True)
            jax.profiler.start_trace(tdir)
            out = None
            for _ in range(iters):
                out = fn(*args)
            jax.block_until_ready(out)
            jax.profiler.stop_trace()
            t = device_time_ms(tdir, iters)
            results[variant] = t.get("kernel", 0.0)
            print(f"  {variant:8s} kernel {t.get('kernel', 0):7.3f} ms",
                  flush=True)
        if "full" in results:
            r = results
            print("  -- deltas: softmax-recompute "
                  f"{r['full'] - r.get('noexp', float('nan')):.3f} | "
                  f"softmax-jacobian "
                  f"{r['full'] - r.get('nodj', float('nan')):.3f} | "
                  f"weight-grad matmuls "
                  f"{r['full'] - r.get('nogradw', float('nan')):.3f}")


if __name__ == "__main__":
    main()
