"""Intra-kernel attribution of the fused Swin attention kernel via xplane.

Compiles stripped variants of the forward kernel body at stage shapes and
reads DEVICE op time from a jax.profiler trace (wall clock under the axon
tunnel is floored by ~5 ms dispatch and block_until_ready can return early
— see probe_kernel_split.py header). Variant ladder isolates:

  copy        in->out DMA + per-program fixed cost
  layout      + window partition/unpartition transposes
  ln          + f32 LayerNorm
  proj        + qkv and output projection matmuls (no attention)
  headstack   + per-head lane-slice gather/scatter (no score matmuls)
  full        + batched score/AV matmuls + softmax  (shipping kernel body)
  natural     full math, windows formed by sublane reshape (no transposes)
  pair2/pair4 full math with P windows folded into the score matmul
              (block-diag bias; xP score/AV flops for 4x MXU tile use)

Run on TPU:  python scripts/probe_kernel_xplane.py
Env: PROBE_STAGES (default stage0,stage1), PROBE_ITERS (default 30),
     PROBE_BATCH (default 16).
"""

import functools
import glob
import os
import shutil
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fmc_uia_tpu.ops.swin_block_pallas import _ATTN_VMEM_LIMIT

sys.path.insert(0, os.path.dirname(__file__))
from probe_fused_block import _STAGE_SHAPES, make_args  # noqa: E402


def body(x_tile, lns, lnb, wqkv, bqkv, wproj, bproj, bias_hnn, bias_pair,
         *, num_heads, ws, variant):
    ws_, Wp, C = x_tile.shape
    G = Wp // ws
    N = ws * ws
    H = num_heads
    dh = C // H
    cdt = x_tile.dtype

    if variant == "copy":
        return x_tile

    if variant == "natural":
        # windows = contiguous 64-token runs (sublane split only; WRONG
        # semantics, same cost model minus the transposes)
        xf = x_tile.reshape(G * N, C).astype(jnp.float32)
    else:
        xw = x_tile.reshape(1, ws, G, ws, C).transpose(0, 2, 1, 3, 4)
        xf = xw.reshape(G * N, C).astype(jnp.float32)

    if variant == "layout":
        y = xf.astype(cdt)
    else:
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu
        xh = (xf - mu) * jax.lax.rsqrt(var + 1e-6)
        xn = (xh * lns.astype(jnp.float32)
              + lnb.astype(jnp.float32)).astype(cdt)
        if variant == "ln":
            y = xn
        else:
            qkv = jnp.dot(xn, wqkv.astype(cdt),
                          preferred_element_type=jnp.float32)
            qkv = (qkv + bqkv.astype(jnp.float32)).astype(cdt)
            q = qkv[:, :C]
            k = qkv[:, C:2 * C]
            v = qkv[:, 2 * C:]
            if variant == "proj":
                o = v
            else:
                scale = jnp.asarray(dh ** -0.5, cdt)

                def head_stack(t):
                    parts = [t[:, h * dh:(h + 1) * dh].reshape(G, N, dh)
                             for h in range(H)]
                    return jnp.stack(parts).reshape(H * G, N, dh)

                qb = head_stack(q * scale)
                kb = head_stack(k)
                vb = head_stack(v)
                if variant == "headstack":
                    ob = vb
                elif variant == "nosm":
                    # full minus softmax (keeps matmuls + bias add)
                    s = jax.lax.dot_general(
                        qb, kb, (((2,), (2,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32)
                    s = (s.reshape(H, G, N, N)
                         + bias_hnn[:, None].astype(jnp.float32))
                    p = (s * 0.01).astype(cdt)
                    ob = jax.lax.dot_general(
                        p.reshape(H * G, N, N), vb,
                        (((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32)
                    ob = ob.astype(cdt)
                elif variant == "smbf16":
                    # scores cast to bf16 pre-softmax; softmax VPU work in
                    # bf16 (max-sub still exact: bf16 max, f32-range safe)
                    s = jax.lax.dot_general(
                        qb, kb, (((2,), (2,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32)
                    s = (s.reshape(H, G, N, N)
                         + bias_hnn[:, None].astype(jnp.float32))
                    p = jax.nn.softmax(s.astype(cdt), axis=-1)
                    ob = jax.lax.dot_general(
                        p.reshape(H * G, N, N), vb,
                        (((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32)
                    ob = ob.astype(cdt)
                elif variant == "nobias":
                    s = jax.lax.dot_general(
                        qb, kb, (((2,), (2,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32)
                    p = jax.nn.softmax(s, axis=-1).astype(cdt)
                    ob = jax.lax.dot_general(
                        p, vb, (((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32)
                    ob = ob.astype(cdt)
                elif variant == "postnorm":
                    # softmax without the div pass: normalize the AV output
                    # ([N, dh] is half the elements of [N, N])
                    s = jax.lax.dot_general(
                        qb, kb, (((2,), (2,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32)
                    s = (s.reshape(H, G, N, N)
                         + bias_hnn[:, None].astype(jnp.float32))
                    m = jnp.max(s, axis=-1, keepdims=True)
                    e = jnp.exp(s - m)
                    r = jnp.sum(e, axis=-1, keepdims=True)
                    eb = e.astype(cdt).reshape(H * G, N, N)
                    ob = jax.lax.dot_general(
                        eb, vb, (((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32)
                    ob = (ob.reshape(H, G, N, dh)
                          / r).astype(cdt).reshape(H * G, N, dh)
                elif variant == "smT":
                    # transposed scores: softmax reduction over the SUBLANE
                    # axis instead of the lane axis; AV contracts dim 1
                    sT = jax.lax.dot_general(
                        kb, qb, (((2,), (2,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32)  # [HG, Nk, Nq]
                    biasT = jnp.swapaxes(bias_hnn, -1, -2)
                    sT = (sT.reshape(H, G, N, N)
                          + biasT[:, None].astype(jnp.float32))
                    m = jnp.max(sT, axis=-2, keepdims=True)
                    e = jnp.exp(sT - m)
                    r = jnp.sum(e, axis=-2, keepdims=True)  # [H, G, 1, Nq]
                    eb = e.astype(cdt).reshape(H * G, N, N)
                    ob = jax.lax.dot_general(
                        eb, vb, (((1,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32)  # [HG, Nq, dh]
                    rq = jnp.swapaxes(r, -1, -2).reshape(H * G, N, 1)
                    ob = (ob / rq).astype(cdt)
                elif variant in ("pair2", "pair4"):
                    P = 2 if variant == "pair2" else 4
                    PN = P * N
                    qp = qb.reshape(H * G // P, PN, dh)
                    kp = kb.reshape(H * G // P, PN, dh)
                    vp = vb.reshape(H * G // P, PN, dh)
                    s = jax.lax.dot_general(
                        qp, kp, (((2,), (2,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32)
                    s = (s.reshape(H, G // P, PN, PN)
                         + bias_pair[:, None].astype(jnp.float32))
                    p = jax.nn.softmax(s, axis=-1).astype(cdt)
                    op = jax.lax.dot_general(
                        p.reshape(H * G // P, PN, PN), vp,
                        (((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32)
                    ob = op.astype(cdt).reshape(H * G, N, dh)
                else:  # full
                    s = jax.lax.dot_general(
                        qb, kb, (((2,), (2,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32)
                    s = (s.reshape(H, G, N, N)
                         + bias_hnn[:, None].astype(jnp.float32))
                    p = jax.nn.softmax(s, axis=-1).astype(cdt)
                    ob = jax.lax.dot_general(
                        p.reshape(H * G, N, N), vb,
                        (((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32)
                    ob = ob.astype(cdt)
                ob4 = ob.reshape(H, G, N, dh)
                o = jnp.concatenate([ob4[h] for h in range(H)], axis=-1)
                o = o.reshape(G * N, C)
            y = jnp.dot(o, wproj.astype(cdt),
                        preferred_element_type=jnp.float32)
            y = (y + bproj.astype(jnp.float32)).astype(cdt)

    if variant == "natural":
        return y.reshape(ws_, Wp, C)
    yw = y.reshape(1, G, ws, ws, C).transpose(0, 2, 1, 3, 4)
    return yw.reshape(ws_, Wp, C)


def kern(x_ref, lns_ref, lnb_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
         bias_ref, biasp_ref, out_ref, *, num_heads, ws, variant):
    out_ref[0] = body(
        x_ref[0], lns_ref[0], lnb_ref[0], wqkv_ref[:], bqkv_ref[0],
        wproj_ref[:], bproj_ref[0], bias_ref[:], biasp_ref[:],
        num_heads=num_heads, ws=ws, variant=variant)


def build_variant(x, H, ws, variant, PN):
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
        pl.BlockSpec((H, PN, PN), lambda b, r: (0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    f = functools.partial(kern, num_heads=H, ws=ws, variant=variant)
    call = pl.pallas_call(
        f, grid=(B, nrows), in_specs=in_specs, out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_ATTN_VMEM_LIMIT))
    return jax.jit(lambda *a: call(*a))


def pair_bias(bias_hnn, P):
    """[H, N, N] per-window bias -> [H, P*N, P*N] block-diagonal with -1e9
    off the diagonal blocks (cross-window attention killed)."""
    H, N, _ = bias_hnn.shape
    out = np.full((H, P * N, P * N), -1e9, np.float32)
    b = np.asarray(bias_hnn, np.float32)
    for i in range(P):
        out[:, i * N:(i + 1) * N, i * N:(i + 1) * N] = b
    return jnp.asarray(out)


def device_time_ms(trace_dir, iters):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    path = max(paths, key=os.path.getmtime)
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    per_cat = defaultdict(float)
    for plane in xs.planes:
        if not plane.name.startswith("/device:TPU"):
            continue
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                meta = plane.event_metadata[ev.metadata_id]
                n = meta.name.lower()
                if ("custom-call" in n or "pallas" in n
                        or "tpu_custom_call" in n):
                    per_cat["kernel"] += ev.duration_ps / 1e6
                else:
                    per_cat["other"] += ev.duration_ps / 1e6
    return {k: v / iters / 1e3 for k, v in per_cat.items()}  # ms/iter


def main():
    print("backend:", jax.default_backend(), file=sys.stderr)
    iters = int(os.environ.get("PROBE_ITERS", "30"))
    batch = int(os.environ.get("PROBE_BATCH", "16"))
    stages = os.environ.get("PROBE_STAGES", "stage0,stage1").split(",")
    variants = os.environ.get(
        "PROBE_VARIANTS",
        "copy,layout,ln,proj,headstack,full,natural,pair2,pair4").split(",")

    for name in stages:
        _, S, C, H = _STAGE_SHAPES[name]
        rng = np.random.RandomState(0)
        x, lns, lnb, wqkv, bqkv, wproj, bproj, bias, _ = make_args(
            rng, batch, S, C, H, 8, False)
        print(f"\n=== {name}: B={batch} grid {S}x{S} C={C} H={H} "
              f"({batch * (S // 8)} programs) ===")
        results = {}
        for variant in variants:
            P = {"pair2": 2, "pair4": 4}.get(variant, 1)
            G = S // 8
            if variant.startswith("pair") and (G % P or (H * G) % P):
                continue
            bp = pair_bias(bias, P) if P > 1 else jnp.zeros(
                (H, 64, 64), jnp.float32)
            fn = build_variant(x, H, 8, variant, P * 64 if P > 1 else 64)
            args = (x, lns[None], lnb[None], wqkv, bqkv[None], wproj,
                    bproj[None], bias, bp)
            jax.block_until_ready(fn(*args))  # compile + warm
            tdir = f"/tmp/fmc_kprobe/{name}_{variant}"
            shutil.rmtree(tdir, ignore_errors=True)
            jax.profiler.start_trace(tdir)
            out = None
            for _ in range(iters):
                out = fn(*args)
            jax.block_until_ready(out)
            jax.profiler.stop_trace()
            t = device_time_ms(tdir, iters)
            results[variant] = t.get("kernel", 0.0)
            print(f"  {variant:10s} kernel {t.get('kernel', 0):7.3f} ms  "
                  f"(other {t.get('other', 0):6.3f} ms)", flush=True)
        if "full" in results:
            f_ = results["full"]
            def d(a, b):
                return results[a] - results[b] if (
                    a in results and b in results) else float("nan")
            print(f"  -- deltas: transposes {d('full', 'natural'):.3f} | "
                  f"attn-matmuls+softmax {d('full', 'headstack'):.3f} | "
                  f"headstack {d('headstack', 'proj'):.3f} | "
                  f"qkv/proj {d('proj', 'ln'):.3f} | "
                  f"ln {d('ln', 'layout'):.3f} | "
                  f"partition {d('layout', 'copy'):.3f} | "
                  f"fixed+dma {results.get('copy', float('nan')):.3f} "
                  f"(full {f_:.3f})")


if __name__ == "__main__":
    main()
