"""Fused Swin attention branch as a Pallas TPU kernel.

Fuses LN1 -> window partition -> qkv -> per-window attention (rel-pos bias
+ shift/pad mask, f32 softmax) -> output projection -> window unpartition
into ONE kernel. The XLA path materializes every intermediate of that chain
in HBM ([B,Hp,Wp,C] activations, [B*nW,N,3C] qkv, [B*nW,H,N,N] scores);
at swin_b stages 0/1 (128^2/64^2 grids) those round-trips — not the
matmul FLOPs — dominate the step time (PERF.md r2 profile: ~23% raw data
movement, stages 0/1 ≈ half the encoder time). Here the only HBM traffic
is: read x tile + weights, write y tile. Scores live in VMEM in f32 — the
kernel is simultaneously *more* numerically conservative than the XLA
``softmax_bf16`` path and cheaper.

Round 1's retired kernel (see PERF.md "Fused Pallas window attention")
fused only scores/softmax and lost to XLA; the lesson recorded there was
that a win requires fusing the *layout* work (partition/unpartition) and
the projections too. This kernel is that formulation.

Grid: ``(B, Hp/ws)`` — one program per row of windows. Each program:

  tile [ws, Wp, C] -> windows [G, N, C] (VMEM relayout, G = Wp/ws,
  N = ws*ws) -> f32 LN -> [G*N, C] @ Wqkv (MXU) -> per-head batched
  [G,N,dh] x [G,N,dh] scores (MXU, f32 accum) -> +bias +mask -> f32
  softmax -> @v -> concat heads -> @ Wproj -> tile [ws, Wp, C].

Backward = recompute-in-VMEM: a second kernel re-runs the forward on the
tile and differentiates it with ``jax.vjp`` *inside* the kernel (the
pullback is ordinary traced JAX, so Mosaic compiles it like hand-written
code); weight/bias/LN grads accumulate in f32 across the sequential grid.
The ``rel_pos_bias`` table expansion (gather by relative-position index)
happens OUTSIDE the custom_vjp boundary, so its gradient (scatter-add back
to the table) is handled by XLA autodiff.

Constraints: Wp % ws == 0 (callers pad; window 8 on power-of-two inputs is
exact), C % num_heads == 0. The shift roll happens outside (cheap,
differentiable); the combined shift+pad additive mask is passed per window
row as ``mask[row]`` with shape [G, N, N] (or None when neither applies).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LN_EPS = 1e-6
_ATTN_VMEM_LIMIT = 100 * 1024 * 1024


def _interpret() -> bool:
    """Pallas TPU kernels run in interpreter mode on CPU (tests / the
    virtual multi-chip mesh); compiled Mosaic on real TPUs."""
    return jax.default_backend() != "tpu"


def _branch_math(x_tile, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj,
                 bias_hnn, mask_gnn, dp, *, num_heads: int, ws: int,
                 compute_dtype):
    """The fused branch on one [R*ws, Wp, C] tile (R window-rows per
    program) — pure jnp, used by both the forward kernel and (via jax.vjp)
    the backward kernel. Multi-row tiles batch the per-head attention
    matmuls R×G wide, which matters at the small late-stage grids (stage 2:
    one row = 4 windows of 64 tokens — too little work per MXU issue)."""
    Rws, Wp, C = x_tile.shape
    R = Rws // ws
    G = (Wp // ws) * R  # windows per program
    N = ws * ws
    H = num_heads
    dh = C // H

    # window partition (VMEM relayout): [R*ws, Wp, C] -> [G, N, C] tokens
    xw = x_tile.reshape(R, ws, Wp // ws, ws, C).transpose(0, 2, 1, 3, 4)
    xf = xw.reshape(G * N, C).astype(jnp.float32)

    # LayerNorm in f32 (flax fast-variance formula, eps 1e-6)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu
    xh = (xf - mu) * jax.lax.rsqrt(var + _LN_EPS)
    xn = (xh * ln_scale.astype(jnp.float32)
          + ln_bias.astype(jnp.float32)).astype(compute_dtype)

    qkv = jnp.dot(xn, wqkv.astype(compute_dtype),
                  preferred_element_type=jnp.float32)
    qkv = qkv + bqkv.astype(jnp.float32)
    qkv = qkv.astype(compute_dtype)

    q = qkv[:, :C]
    k = qkv[:, C:2 * C]
    v = qkv[:, 2 * C:]

    scale = jnp.asarray(dh ** -0.5, compute_dtype)
    # head-batched attention: ONE H*G-batched dot_general pair instead of
    # an unrolled per-head loop of tiny matmuls (H serial MXU issues).
    # Heads are gathered by lane-dim slicing (a lane SPLIT reshape is an
    # unsupported Mosaic relayout) and stacked on a new leading batch dim;
    # Mosaic's tpu.matmul takes a single batch dim, so H and G fold.
    def head_stack(t):  # [G*N, C] -> [H*G, N, dh]
        parts = [t[:, h * dh:(h + 1) * dh].reshape(G, N, dh)
                 for h in range(H)]
        return jnp.stack(parts).reshape(H * G, N, dh)

    qb = head_stack(q * scale)
    kb = head_stack(k)
    vb = head_stack(v)
    s = jax.lax.dot_general(
        qb, kb, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # [H*G, N, N]
    s = s.reshape(H, G, N, N) + bias_hnn[:, None].astype(jnp.float32)
    if mask_gnn is not None:
        s = s + mask_gnn[None].astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1).astype(compute_dtype)
    ob = jax.lax.dot_general(
        p.reshape(H * G, N, N), vb, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # [H*G, N, dh]
    ob = ob.astype(compute_dtype).reshape(H, G, N, dh)
    o = jnp.concatenate([ob[h] for h in range(H)], axis=-1)
    o = o.reshape(G * N, C)
    y = jnp.dot(o, wproj.astype(compute_dtype),
                preferred_element_type=jnp.float32)
    y = (y + bproj.astype(jnp.float32)).astype(compute_dtype)
    # window unpartition back to the tile layout
    y = y.reshape(R, Wp // ws, ws, ws, C).transpose(0, 2, 1, 3, 4)
    y = y.reshape(Rws, Wp, C)
    # residual + per-sample drop-path scale folded in (r3): the block's
    # shortcut-add and stochastic-depth select used to be separate XLA
    # full-map passes (~2.8 ms/step at B=24 512^2 across the stages); the
    # kernel already holds x, so the add is free here. dp is the
    # pre-scaled per-sample factor (1/keep for kept samples, 0 dropped).
    return x_tile + dp.astype(compute_dtype) * y


def _fwd_kernel(x_ref, lns_ref, lnb_ref, wqkv_ref, bqkv_ref, wproj_ref,
                bproj_ref, bias_ref, mask_ref, dp_ref, out_ref, *,
                num_heads, ws, compute_dtype, has_mask):
    mask = None
    if has_mask:  # [R, Gcol, N, N] -> [G, N, N] in window order
        m = mask_ref[:]
        mask = m.reshape(-1, m.shape[-2], m.shape[-1])
    out_ref[0] = _branch_math(
        x_ref[0], lns_ref[0], lnb_ref[0], wqkv_ref[:], bqkv_ref[0],
        wproj_ref[:], bproj_ref[0], bias_ref[:], mask,
        dp_ref[pl.program_id(0), 0],
        num_heads=num_heads, ws=ws, compute_dtype=compute_dtype)


def _branch_pullback(x_tile, lns, lnb, wqkv, bqkv, wproj, bproj, bias_hnn,
                     mask_gnn, dp, dy_tile, *, num_heads: int, ws: int,
                     compute_dtype):
    """Hand-written pullback of ``_branch_math`` on one tile.

    ``jax.vjp`` of the forward produces pullback matmuls whose cotangent
    operands stay f32 (half-or-worse MXU rate) and re-differentiates the
    lane-sliced head gather as scatter-adds; this analytic version keeps
    every matmul a bf16-operand / f32-accumulate head-batched dot_general —
    the exact shape family the forward already proved fast — and rebuilds
    the head gather/scatter as the same slice+concat the forward uses.
    Recompute stays in-VMEM (LN/qkv/softmax re-run here, nothing saved to
    HBM). Returns (dx_tile, dlns, dlnb, dwqkv, dbqkv, dwproj, dbproj,
    dbias) with the weight/bias grads in f32.
    """
    Rws, Wp, C = x_tile.shape
    R = Rws // ws
    G = (Wp // ws) * R
    N = ws * ws
    H = num_heads
    dh = C // H
    f32 = jnp.float32

    # --- recompute the forward (same casts as _branch_math) ---
    xw = x_tile.reshape(R, ws, Wp // ws, ws, C).transpose(0, 2, 1, 3, 4)
    xf = xw.reshape(G * N, C).astype(f32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu
    rstd = jax.lax.rsqrt(var + _LN_EPS)
    xh = (xf - mu) * rstd
    xn = (xh * lns.astype(f32) + lnb.astype(f32)).astype(compute_dtype)
    qkv = jnp.dot(xn, wqkv.astype(compute_dtype),
                  preferred_element_type=f32)
    qkv = (qkv + bqkv.astype(f32)).astype(compute_dtype)
    q = qkv[:, :C]
    k = qkv[:, C:2 * C]
    v = qkv[:, 2 * C:]
    scale = jnp.asarray(dh ** -0.5, compute_dtype)

    def head_stack(t):  # [G*N, C] -> [H*G, N, dh]
        parts = [t[:, h * dh:(h + 1) * dh].reshape(G, N, dh)
                 for h in range(H)]
        return jnp.stack(parts).reshape(H * G, N, dh)

    def head_unstack(tb):  # [H*G, N, dh] -> [G*N, C]
        t4 = tb.reshape(H, G, N, dh)
        return jnp.concatenate(
            [t4[h].reshape(G * N, dh) for h in range(H)], axis=-1)

    qb = head_stack(q * scale)
    kb = head_stack(k)
    vb = head_stack(v)
    s = jax.lax.dot_general(qb, kb, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=f32)
    s = s.reshape(H, G, N, N) + bias_hnn[:, None].astype(f32)
    if mask_gnn is not None:
        s = s + mask_gnn[None].astype(f32)
    pf = jax.nn.softmax(s, axis=-1)                     # f32 [H,G,N,N]
    p = pf.astype(compute_dtype).reshape(H * G, N, N)
    ob = jax.lax.dot_general(p, vb, (((2,), (1,)), ((0,), (0,))),
                             preferred_element_type=f32)
    obc = ob.astype(compute_dtype).reshape(H, G, N, dh)
    o = jnp.concatenate([obc[h] for h in range(H)], axis=-1)
    o = o.reshape(G * N, C)

    # --- pullback ---
    # out = x + dp * branch(x): the branch side sees dp-scaled cotangents;
    # the identity path adds dy_tile to dx at the end.
    dyw = dy_tile.reshape(R, ws, Wp // ws, ws, C).transpose(0, 2, 1, 3, 4)
    dyf = (dyw.reshape(G * N, C) * dp).astype(compute_dtype)
    dbproj = jnp.sum(dyf.astype(f32), axis=0)
    dwproj = jax.lax.dot_general(o, dyf, (((0,), (0,)), ((), ())),
                                 preferred_element_type=f32)
    do = jax.lax.dot_general(dyf, wproj.astype(compute_dtype),
                             (((1,), (1,)), ((), ())),
                             preferred_element_type=f32)
    dob = head_stack(do.astype(compute_dtype))          # [H*G, N, dh]
    dvb = jax.lax.dot_general(p, dob, (((1,), (1,)), ((0,), (0,))),
                              preferred_element_type=f32)
    dpb = jax.lax.dot_general(dob, vb, (((2,), (2,)), ((0,), (0,))),
                              preferred_element_type=f32)
    dp = dpb.reshape(H, G, N, N)
    ds = pf * (dp - jnp.sum(dp * pf, axis=-1, keepdims=True))  # f32
    dbias = jnp.sum(ds, axis=1)                          # [H, N, N]
    dsb = ds.reshape(H * G, N, N).astype(compute_dtype)
    dqb = jax.lax.dot_general(dsb, kb, (((2,), (1,)), ((0,), (0,))),
                              preferred_element_type=f32)
    dkb = jax.lax.dot_general(dsb, qb, (((1,), (1,)), ((0,), (0,))),
                              preferred_element_type=f32)
    dq = head_unstack(dqb.astype(compute_dtype)) * scale
    dk = head_unstack(dkb.astype(compute_dtype))
    dv = head_unstack(dvb.astype(compute_dtype))
    dqkv = jnp.concatenate([dq, dk, dv], axis=-1)        # [G*N, 3C]
    dbqkv = jnp.sum(dqkv.astype(f32), axis=0)
    dwqkv = jax.lax.dot_general(xn, dqkv, (((0,), (0,)), ((), ())),
                                preferred_element_type=f32)
    dxn = jax.lax.dot_general(dqkv, wqkv.astype(compute_dtype),
                              (((1,), (1,)), ((), ())),
                              preferred_element_type=f32)
    dg = jnp.sum(dxn * xh, axis=0)
    dbeta = jnp.sum(dxn, axis=0)
    dxh = dxn * lns.astype(f32)
    dxf = (dxh - jnp.mean(dxh, axis=-1, keepdims=True)
           - xh * jnp.mean(dxh * xh, axis=-1, keepdims=True)) * rstd
    dxw = dxf.astype(x_tile.dtype).reshape(R, Wp // ws, ws, ws, C)
    dx_tile = dxw.transpose(0, 2, 1, 3, 4).reshape(Rws, Wp, C)
    dx_tile = dx_tile + dy_tile.astype(x_tile.dtype)  # identity path
    return dx_tile, dg, dbeta, dwqkv, dbqkv, dwproj, dbproj, dbias


def _bwd_mode() -> str:
    import os

    return os.environ.get("FMC_FUSED_BWD", "analytic")


def _bwd_kernel(x_ref, lns_ref, lnb_ref, wqkv_ref, bqkv_ref, wproj_ref,
                bproj_ref, bias_ref, mask_ref, dp_ref, dy_ref,
                dx_ref, dlns_ref, dlnb_ref, dwqkv_ref, dbqkv_ref,
                dwproj_ref, dbproj_ref, dbias_ref, *, num_heads, ws,
                compute_dtype, has_mask, mode):
    mask = None
    if has_mask:
        m = mask_ref[:]
        mask = m.reshape(-1, m.shape[-2], m.shape[-1])
    dp = dp_ref[pl.program_id(0), 0]

    if mode == "analytic":
        (dx, dlns, dlnb, dwqkv, dbqkv, dwproj, dbproj,
         dbias) = _branch_pullback(
            x_ref[0], lns_ref[0], lnb_ref[0], wqkv_ref[:], bqkv_ref[0],
            wproj_ref[:], bproj_ref[0], bias_ref[:], mask, dp, dy_ref[0],
            num_heads=num_heads, ws=ws, compute_dtype=compute_dtype)
    else:
        def f(x_tile, lns, lnb, wqkv, bqkv, wproj, bproj, bias):
            return _branch_math(x_tile, lns, lnb, wqkv, bqkv, wproj, bproj,
                                bias, mask, dp, num_heads=num_heads, ws=ws,
                                compute_dtype=compute_dtype)

        _, pull = jax.vjp(f, x_ref[0], lns_ref[0], lnb_ref[0], wqkv_ref[:],
                          bqkv_ref[0], wproj_ref[:], bproj_ref[0],
                          bias_ref[:])
        dx, dlns, dlnb, dwqkv, dbqkv, dwproj, dbproj, dbias = pull(dy_ref[0])

    dx_ref[0] = dx
    first = jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0)

    @pl.when(first)
    def _():
        dlns_ref[0] = dlns.astype(jnp.float32)
        dlnb_ref[0] = dlnb.astype(jnp.float32)
        dwqkv_ref[:] = dwqkv.astype(jnp.float32)
        dbqkv_ref[0] = dbqkv.astype(jnp.float32)
        dwproj_ref[:] = dwproj.astype(jnp.float32)
        dbproj_ref[0] = dbproj.astype(jnp.float32)
        dbias_ref[:] = dbias.astype(jnp.float32)

    @pl.when(jnp.logical_not(first))
    def _():
        dlns_ref[0] += dlns.astype(jnp.float32)
        dlnb_ref[0] += dlnb.astype(jnp.float32)
        dwqkv_ref[:] += dwqkv.astype(jnp.float32)
        dbqkv_ref[0] += dbqkv.astype(jnp.float32)
        dwproj_ref[:] += dwproj.astype(jnp.float32)
        dbproj_ref[0] += dbproj.astype(jnp.float32)
        dbias_ref[:] += dbias.astype(jnp.float32)


def _pick_rows(nrows: int, ws: int, Wp: int) -> int:
    """Window-rows per program (default 1 == one window-row).

    Multi-row tiles were built and MEASURED AS A NET LOSS end-to-end
    (PERF.md r2-13): standalone probes showed stage-1/2 kernel wins, but
    the full train step regressed 117 -> ~91 img/s at R=2 and compile
    times exploded near the VMEM ceiling at R=4. The machinery stays for
    future shapes: set FMC_FUSED_ROW_TOKENS to a per-program token target
    (e.g. 1024) to re-enable row batching."""
    import os

    target = int(os.environ.get("FMC_FUSED_ROW_TOKENS", "0"))
    if target <= 0:
        return 1
    R = max(1, target // (ws * Wp))
    while R > 1 and nrows % R:
        R -= 1
    return min(R, nrows)


def _specs(B, Hp, Wp, C, H, N, ws, has_mask, nrows, G, R):
    """(grid, in_specs) shared by fwd and bwd. R = window-rows/program."""
    grid = (B, nrows // R)
    x_spec = pl.BlockSpec((1, R * ws, Wp, C), lambda b, r: (b, r, 0, 0),
                          memory_space=pltpu.VMEM)
    const = lambda b, r: (0, 0)  # noqa: E731
    in_specs = [
        x_spec,
        pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),   # ln scale
        pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),   # ln bias
        pl.BlockSpec((C, 3 * C), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 3 * C), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((C, C), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((H, N, N), lambda b, r: (0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if has_mask:
        in_specs.append(pl.BlockSpec((R, G, N, N),
                                     lambda b, r: (r, 0, 0, 0),
                                     memory_space=pltpu.VMEM))
    else:  # dummy scalar placeholder (never read)
        in_specs.append(pl.BlockSpec((1, 1), const,
                                     memory_space=pltpu.VMEM))
    # per-sample drop-path scale [B, 1] — whole array in SMEM (a (1,1)
    # VMEM block violates the (8,128) tile rule); kernels index it by
    # pl.program_id(0)
    in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
    return grid, in_specs, x_spec


@functools.partial(jax.custom_vjp, nondiff_argnums=(10,))
def _fused_branch(x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj, bias_hnn,
                  mask_rgnn, dp, num_heads):
    return _fused_branch_fwd_impl(x, ln_scale, ln_bias, wqkv, bqkv, wproj,
                                  bproj, bias_hnn, mask_rgnn, dp, num_heads)


def _fused_branch_fwd_impl(x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj,
                           bias_hnn, mask_rgnn, dp, num_heads):
    B, Hp, Wp, C = x.shape
    H = num_heads
    N = bias_hnn.shape[-1]
    ws = int(round(N ** 0.5))
    nrows = Hp // ws
    G = Wp // ws
    has_mask = mask_rgnn is not None
    R = _pick_rows(nrows, ws, Wp)
    grid, in_specs, x_spec = _specs(B, Hp, Wp, C, H, N, ws, has_mask,
                                    nrows, G, R)
    kern = functools.partial(_fwd_kernel, num_heads=H, ws=ws,
                             compute_dtype=x.dtype, has_mask=has_mask)
    mask_arg = (mask_rgnn if has_mask
                else jnp.zeros((1, 1), jnp.float32))
    return pl.pallas_call(
        kern, grid=grid, in_specs=in_specs, out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=_interpret(),
        # multi-row tiles and the late stages' f32 weight pairs exceed the
        # 16 MB scoped-vmem default (e.g. stage 3: wqkv f32+bf16 ≈ 19 MB)
        compiler_params=None if _interpret() else pltpu.CompilerParams(
            vmem_limit_bytes=_ATTN_VMEM_LIMIT),
    )(x, ln_scale[None], ln_bias[None], wqkv, bqkv[None], wproj,
      bproj[None], bias_hnn, mask_arg, dp)


def _fused_branch_fwd(x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj,
                      bias_hnn, mask_rgnn, dp, num_heads):
    y = _fused_branch_fwd_impl(x, ln_scale, ln_bias, wqkv, bqkv, wproj,
                               bproj, bias_hnn, mask_rgnn, dp, num_heads)
    return y, (x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj, bias_hnn,
               mask_rgnn, dp)


def _fused_branch_bwd(num_heads, res, dy):
    (x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj, bias_hnn,
     mask_rgnn, dp) = res
    B, Hp, Wp, C = x.shape
    H = num_heads
    N = bias_hnn.shape[-1]
    ws = int(round(N ** 0.5))
    nrows = Hp // ws
    G = Wp // ws
    has_mask = mask_rgnn is not None
    R = _pick_rows(nrows, ws, Wp)
    grid, in_specs, x_spec = _specs(B, Hp, Wp, C, H, N, ws, has_mask,
                                    nrows, G, R)
    in_specs = in_specs + [x_spec]  # dy blocked like x
    const = lambda b, r: (0, 0)  # noqa: E731
    out_specs = [
        x_spec,  # dx
        pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((C, 3 * C), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 3 * C), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((C, C), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((H, N, N), lambda b, r: (0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
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
    kern = functools.partial(_bwd_kernel, num_heads=H, ws=ws,
                             compute_dtype=x.dtype, has_mask=has_mask,
                             mode=_bwd_mode())
    mask_arg = (mask_rgnn if has_mask
                else jnp.zeros((1, 1), jnp.float32))
    outs = pl.pallas_call(
        kern, grid=grid, in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shapes,
        interpret=_interpret(),
        # the recompute-vjp body needs far more scoped VMEM than the
        # 16 MB default (stage-2 R=4 tile: 65.3 MB measured); v5e has 128
        compiler_params=None if _interpret() else pltpu.CompilerParams(
            vmem_limit_bytes=_ATTN_VMEM_LIMIT),
    )(x, ln_scale[None], ln_bias[None], wqkv, bqkv[None], wproj,
      bproj[None], bias_hnn, mask_arg, dp, dy)
    dx, dlns, dlnb, dwqkv, dbqkv, dwproj, dbproj, dbias = outs
    dmask = None if mask_rgnn is None else jnp.zeros_like(mask_rgnn)
    return (dx,
            dlns[0].astype(ln_scale.dtype),
            dlnb[0].astype(ln_bias.dtype),
            dwqkv.astype(wqkv.dtype),
            dbqkv[0].astype(bqkv.dtype),
            dwproj.astype(wproj.dtype),
            dbproj[0].astype(bproj.dtype),
            dbias.astype(bias_hnn.dtype),
            dmask,
            jnp.zeros_like(dp))  # random mask: not differentiated


_fused_branch.defvjp(_fused_branch_fwd, _fused_branch_bwd)


def fused_attention_branch(x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj,
                           bias_hnn, mask_gnn: Optional[jax.Array],
                           num_heads: int,
                           dp_scale: Optional[jax.Array] = None):
    """x + dp*(LN1 + windowed MHSA + proj) on ``x`` [B, Hp, Wp, C]
    (pre-roll applied by the caller; the residual add commutes with the
    roll, so the caller's roll-back/crop of the returned sum is exact).
    ``bias_hnn``: [H, N, N] expanded rel-pos bias (gradient to the table
    flows through the outside gather). ``mask_gnn``: [nW, N, N] additive
    shift/pad mask or None; reshaped per window row internally.
    ``dp_scale``: per-sample drop-path factor [B] or [B,1] (1/keep for
    kept samples, 0 for dropped), or None for no stochastic depth.
    Returns the BLOCK-half output (residual included).
    """
    B, Hp, Wp, C = x.shape
    N = bias_hnn.shape[-1]
    ws = int(round(N ** 0.5))
    if Hp % ws or Wp % ws:
        raise ValueError(f"padded grid ({Hp},{Wp}) must be divisible by "
                         f"window {ws}")
    mask_rgnn = None
    if mask_gnn is not None:
        nrows, G = Hp // ws, Wp // ws
        # pad-only masks are built broadcastable ([nW, 1, N]); expand
        mask_gnn = jnp.broadcast_to(mask_gnn,
                                    (mask_gnn.shape[0], N, N))
        mask_rgnn = mask_gnn.reshape(nrows, G, N, N)
    # f32: Mosaic only supports 32-bit scalar vector.extracts (dp_ref[0,0])
    if dp_scale is None:
        dp = jnp.ones((B, 1), jnp.float32)
    else:
        dp = dp_scale.reshape(B, 1).astype(jnp.float32)
    return _fused_branch(x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj,
                         bias_hnn, mask_rgnn, dp, num_heads)


# ---------------------------------------------------------------------------
# Fused MLP branch: LN2 -> fc1 -> gelu -> fc2 (pre-residual)
# ---------------------------------------------------------------------------
def _mlp_math(x_tile, ln_scale, ln_bias, w1, b1, w2, b2, dp, *,
              compute_dtype):
    """x + dp*(LN2 + fc1 + gelu + fc2) on a [T, C] tile; LN stats f32,
    matmul accum f32. ``dp``: drop-path scale, scalar or [T, 1]
    (residual + stochastic depth folded in, see _branch_math)."""
    T, C = x_tile.shape
    xf = x_tile.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu
    xh = (xf - mu) * jax.lax.rsqrt(var + _LN_EPS)
    xn = (xh * ln_scale.astype(jnp.float32)
          + ln_bias.astype(jnp.float32)).astype(compute_dtype)
    h = jnp.dot(xn, w1.astype(compute_dtype),
                preferred_element_type=jnp.float32)
    h = jax.nn.gelu(h + b1.astype(jnp.float32)).astype(compute_dtype)
    y = jnp.dot(h, w2.astype(compute_dtype),
                preferred_element_type=jnp.float32)
    y = (y + b2.astype(jnp.float32)).astype(compute_dtype)
    return x_tile + dp.astype(compute_dtype) * y


def _mlp_fwd_kernel(x_ref, lns_ref, lnb_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                    dp_ref, out_ref, *, compute_dtype, tt, hw):
    dp = dp_ref[(pl.program_id(0) * tt) // hw, 0]
    out_ref[:] = _mlp_math(x_ref[:], lns_ref[0], lnb_ref[0], w1_ref[:],
                           b1_ref[0], w2_ref[:], b2_ref[0], dp,
                           compute_dtype=compute_dtype)


def _mlp_pullback(x_tile, lns, lnb, w1, b1, w2, b2, dp, dy_tile, *,
                  compute_dtype):
    """Hand-written pullback of ``_mlp_math``: every matmul a bf16-operand
    / f32-accumulate dot_general (the jax.vjp pullback kept f32 cotangent
    operands — half-rate MXU; see _branch_pullback). The gelu derivative
    is taken with an elementwise jax.vjp (exact, VPU-cheap).
    out = x + dp*branch(x): the branch sees dp-scaled cotangents; the
    identity path adds dy at the end."""
    f32 = jnp.float32
    xf = x_tile.astype(f32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu
    rstd = jax.lax.rsqrt(var + _LN_EPS)
    xh = (xf - mu) * rstd
    xn = (xh * lns.astype(f32) + lnb.astype(f32)).astype(compute_dtype)
    h1 = jnp.dot(xn, w1.astype(compute_dtype),
                 preferred_element_type=f32) + b1.astype(f32)
    g, gelu_vjp = jax.vjp(jax.nn.gelu, h1)
    gc = g.astype(compute_dtype)

    dyc = (dy_tile * dp).astype(compute_dtype)
    db2 = jnp.sum(dyc.astype(f32), axis=0)
    dw2 = jax.lax.dot_general(gc, dyc, (((0,), (0,)), ((), ())),
                              preferred_element_type=f32)
    dg = jax.lax.dot_general(dyc, w2.astype(compute_dtype),
                             (((1,), (1,)), ((), ())),
                             preferred_element_type=f32)
    dh1, = gelu_vjp(dg)
    db1 = jnp.sum(dh1, axis=0)
    dh1c = dh1.astype(compute_dtype)
    dw1 = jax.lax.dot_general(xn, dh1c, (((0,), (0,)), ((), ())),
                              preferred_element_type=f32)
    dxn = jax.lax.dot_general(dh1c, w1.astype(compute_dtype),
                              (((1,), (1,)), ((), ())),
                              preferred_element_type=f32)
    dg_ln = jnp.sum(dxn * xh, axis=0)
    dbeta = jnp.sum(dxn, axis=0)
    dxh = dxn * lns.astype(f32)
    dxf = (dxh - jnp.mean(dxh, axis=-1, keepdims=True)
           - xh * jnp.mean(dxh * xh, axis=-1, keepdims=True)) * rstd
    dx = dxf.astype(x_tile.dtype) + dy_tile.astype(x_tile.dtype)
    return (dx, dg_ln, dbeta, dw1, db1, dw2, db2)


def _mlp_bwd_kernel(x_ref, lns_ref, lnb_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                    dp_ref, dy_ref, dx_ref, dlns_ref, dlnb_ref, dw1_ref,
                    db1_ref, dw2_ref, db2_ref, *, compute_dtype, mode,
                    tt, hw):
    dp = dp_ref[(pl.program_id(0) * tt) // hw, 0]
    if mode == "analytic":
        dx, dlns, dlnb, dw1, db1, dw2, db2 = _mlp_pullback(
            x_ref[:], lns_ref[0], lnb_ref[0], w1_ref[:], b1_ref[0],
            w2_ref[:], b2_ref[0], dp, dy_ref[:],
            compute_dtype=compute_dtype)
    else:
        def f(x_tile, lns, lnb, w1, b1, w2, b2):
            return _mlp_math(x_tile, lns, lnb, w1, b1, w2, b2, dp,
                             compute_dtype=compute_dtype)

        _, pull = jax.vjp(f, x_ref[:], lns_ref[0], lnb_ref[0], w1_ref[:],
                          b1_ref[0], w2_ref[:], b2_ref[0])
        dx, dlns, dlnb, dw1, db1, dw2, db2 = pull(dy_ref[:])
    dx_ref[:] = dx
    first = pl.program_id(0) == 0

    @pl.when(first)
    def _():
        dlns_ref[0] = dlns.astype(jnp.float32)
        dlnb_ref[0] = dlnb.astype(jnp.float32)
        dw1_ref[:] = dw1.astype(jnp.float32)
        db1_ref[0] = db1.astype(jnp.float32)
        dw2_ref[:] = dw2.astype(jnp.float32)
        db2_ref[0] = db2.astype(jnp.float32)

    @pl.when(jnp.logical_not(first))
    def _():
        dlns_ref[0] += dlns.astype(jnp.float32)
        dlnb_ref[0] += dlnb.astype(jnp.float32)
        dw1_ref[:] += dw1.astype(jnp.float32)
        db1_ref[0] += db1.astype(jnp.float32)
        dw2_ref[:] += dw2.astype(jnp.float32)
        db2_ref[0] += db2.astype(jnp.float32)


def _mlp_tile(TT: int, C: int, Ch: int, hw: int):
    const = lambda i: (0, 0)  # noqa: E731
    x_spec = pl.BlockSpec((TT, C), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    in_specs = [
        x_spec,
        pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((C, Ch), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Ch), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((Ch, C), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),
        # per-sample drop-path scale [B,1], whole array in SMEM; the kernel
        # derives the sample as (program_id * TT) // hw — the caller
        # guarantees hw % TT == 0 so a tile never spans samples.
        pl.BlockSpec(memory_space=pltpu.SMEM),
    ]
    return x_spec, in_specs, const


_MLP_VMEM_LIMIT = 64 * 1024 * 1024


def _pick_mlp_tile(T: int, C: int, Ch: int, *, bwd: bool) -> int:
    """Largest tile dividing T whose VMEM working set fits (0 = none).

    Per-tile bytes ≈ weights (f32 pair + bf16 casts = 12·C·Ch) + activations
    (x/LN/y chain ≈ 12·C + hidden f32-accum+bf16 ≈ 6·Ch per row); the vjp
    backward roughly 2.5×'s the activation set (primals + cotangents).

    T is B·H·W; at power-of-two image sizes it is a power-of-two multiple,
    but e.g. swin_t@224² stage 1 gives T = 6272 = 128·49 — no power-of-two
    candidate divides it, and falling back to one whole-T program blows the
    scoped-VMEM stack (measured 97 MB vs the 64 MB limit). So: try the
    power-of-two ladder first, then any divisor of T that is a multiple of
    8 sublanes; return 0 when nothing fits and let the caller use XLA."""
    w_bytes = 12 * C * Ch
    factor = 2.5 if bwd else 1.0
    budget = int(_MLP_VMEM_LIMIT * 0.72)

    def fits(tt: int) -> bool:
        return w_bytes + tt * (12 * C + 6 * Ch) * factor <= budget

    for tt in (4096, 2048, 1024, 512, 256):
        if T % tt == 0 and fits(tt):
            return tt
    best = 0
    d = 1
    while d * d <= T:
        if T % d == 0:
            for c in (d, T // d):
                if c % 8 == 0 and c <= 4096 and c > best and fits(c):
                    best = c
        d += 1
    return best


@functools.partial(jax.custom_vjp, nondiff_argnums=(8,))
def _fused_mlp(x2d, ln_scale, ln_bias, w1, b1, w2, b2, dp, hw):
    return _fused_mlp_fwd_impl(x2d, ln_scale, ln_bias, w1, b1, w2, b2,
                               dp, hw)


def _fused_mlp_fwd_impl(x2d, ln_scale, ln_bias, w1, b1, w2, b2, dp, hw):
    T, C = x2d.shape
    Ch = w1.shape[1]
    TT = _pick_mlp_tile(T, C, Ch, bwd=False)
    x_spec, in_specs, _ = _mlp_tile(TT, C, Ch, hw)
    kern = functools.partial(_mlp_fwd_kernel, compute_dtype=x2d.dtype,
                             tt=TT, hw=hw)
    return pl.pallas_call(
        kern, grid=(T // TT,), in_specs=in_specs, out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct(x2d.shape, x2d.dtype),
        interpret=_interpret(),
        compiler_params=None if _interpret() else pltpu.CompilerParams(
            vmem_limit_bytes=_MLP_VMEM_LIMIT),
    )(x2d, ln_scale[None], ln_bias[None], w1, b1[None], w2, b2[None], dp)


def _fused_mlp_fwd(x2d, ln_scale, ln_bias, w1, b1, w2, b2, dp, hw):
    y = _fused_mlp_fwd_impl(x2d, ln_scale, ln_bias, w1, b1, w2, b2, dp, hw)
    return y, (x2d, ln_scale, ln_bias, w1, b1, w2, b2, dp)


def _fused_mlp_bwd(hw, res, dy):
    x2d, ln_scale, ln_bias, w1, b1, w2, b2, dp = res
    T, C = x2d.shape
    Ch = w1.shape[1]
    TT = _pick_mlp_tile(T, C, Ch, bwd=True)
    x_spec, in_specs, const = _mlp_tile(TT, C, Ch, hw)
    in_specs = in_specs + [x_spec]
    out_specs = [
        x_spec,
        pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((C, Ch), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Ch), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((Ch, C), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),
    ]
    out_shapes = [
        jax.ShapeDtypeStruct(x2d.shape, x2d.dtype),
        jax.ShapeDtypeStruct((1, C), jnp.float32),
        jax.ShapeDtypeStruct((1, C), jnp.float32),
        jax.ShapeDtypeStruct((C, Ch), jnp.float32),
        jax.ShapeDtypeStruct((1, Ch), jnp.float32),
        jax.ShapeDtypeStruct((Ch, C), jnp.float32),
        jax.ShapeDtypeStruct((1, C), jnp.float32),
    ]
    kern = functools.partial(_mlp_bwd_kernel, compute_dtype=x2d.dtype,
                             mode=_bwd_mode(), tt=TT, hw=hw)
    outs = pl.pallas_call(
        kern, grid=(T // TT,), in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shapes,
        interpret=_interpret(),
        compiler_params=None if _interpret() else pltpu.CompilerParams(
            vmem_limit_bytes=_MLP_VMEM_LIMIT),
    )(x2d, ln_scale[None], ln_bias[None], w1, b1[None], w2, b2[None], dp,
      dy)
    dx, dlns, dlnb, dw1, db1, dw2, db2 = outs
    return (dx, dlns[0].astype(ln_scale.dtype), dlnb[0].astype(ln_bias.dtype),
            dw1.astype(w1.dtype), db1[0].astype(b1.dtype),
            dw2.astype(w2.dtype), db2[0].astype(b2.dtype),
            jnp.zeros_like(dp))  # random mask: not differentiated


_fused_mlp.defvjp(_fused_mlp_fwd, _fused_mlp_bwd)


def fused_mlp_branch(x, ln_scale, ln_bias, w1, b1, w2, b2,
                     dp_scale=None):
    """x + dp*(LN2 + fc1 + gelu + fc2) on ``x`` [B, H, W, C] — residual
    and per-sample drop-path scale folded in (``dp_scale`` [B] or [B,1];
    None = no stochastic depth). Saves the HBM round-trips of the LN
    output and the 4C-wide fc1/gelu intermediates (e.g.
    bf16[16,128,128,512] = 268 MB at swin_b stage 0) plus the block's
    separate residual/drop-path full-map pass.

    Falls back to the same math under XLA when no kernel tile fits the
    scoped-VMEM budget for this token count, or when the tile does not
    align with sample boundaries (the kernel reads ONE dp scalar per
    tile, so hw % tile must be 0)."""
    B, H, W, C = x.shape
    T = B * H * W
    hw = H * W
    Ch = w1.shape[1]
    # f32: Mosaic only supports 32-bit scalar vector.extracts (dp_ref[0,0])
    if dp_scale is None:
        dp = jnp.ones((B, 1), jnp.float32)
    else:
        dp = dp_scale.reshape(B, 1).astype(jnp.float32)
    ttf = _pick_mlp_tile(T, C, Ch, bwd=False)
    ttb = _pick_mlp_tile(T, C, Ch, bwd=True)
    if ttf == 0 or ttb == 0 or hw % ttf or hw % ttb:
        dp_rows = jnp.broadcast_to(dp[:, None], (B, hw, 1)).reshape(T, 1)
        y = _mlp_math(x.reshape(T, C), ln_scale, ln_bias, w1, b1, w2, b2,
                      dp_rows, compute_dtype=x.dtype)
        return y.reshape(B, H, W, C)
    y = _fused_mlp(x.reshape(B * H * W, C), ln_scale, ln_bias, w1, b1,
                   w2, b2, dp, hw)
    return y.reshape(B, H, W, C)
