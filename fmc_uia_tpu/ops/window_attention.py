"""Fused Pallas window-attention kernel.

The XLA window-attention path spends most of its time on tiny padded
batched matmuls ([N, dh] with dh=32 -> 4x lane padding) and HBM round-trips
of the [Bn, H, N, N] score tensor (measured 10.45 ms vs 2.85 ms for the
4x MLP at swin_b stage 0, 512^2 — see PERF.md). This kernel fuses

    scores = q @ k^T * scale + (rel-pos bias [+ shift mask])
    p = softmax(scores);  out = p @ v

entirely in VMEM with MXU-friendly shapes: each program owns G windows of
one head, flattens them to [G*N, dh], and computes ONE [G*N, dh] x
[dh, G*N] score matmul. Cross-window score positions are killed with a
block-diagonal -inf mask (softmax then zeroes them), trading G x redundant
flops on a cheap op for perfect tiling and zero score traffic to HBM.

Backward: custom_vjp recomputing through the reference jnp formulation —
fwd runs the kernel, bwd differentiates the (numerically equivalent)
XLA path.

Constraints: N = window_size^2 must be a multiple of 8 (ws 8/16; ws 7
callers use the XLA path), G | nW so a window tile never crosses an image.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _kernel(q_ref, k_ref, v_ref, bd_ref, out_ref, *, G, N, dh, scale):
    # q/k/v refs: [1, G, N, dh]; bd (block-diag additive mask, precomputed
    # outside): [1, 1, G*N, G*N]; out: [1, G, N, dh]
    q = q_ref[...].reshape(G * N, dh).astype(jnp.float32)
    k = k_ref[...].reshape(G * N, dh).astype(jnp.float32)
    v = v_ref[...].reshape(G * N, dh).astype(jnp.float32)

    scores = jax.lax.dot_general(
        q * scale, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [G*N, G*N]
    scores = scores + bd_ref[0, 0]

    m = jnp.max(scores, axis=1, keepdims=True)
    e = jnp.exp(scores - m)
    p = e / jnp.sum(e, axis=1, keepdims=True)

    out = jax.lax.dot_general(
        p, v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [G*N, dh]
    out_ref[...] = out.reshape(1, G, N, dh).astype(out_ref.dtype)


def _block_diag_mask(addmask: jax.Array, G: int) -> jax.Array:
    """[H, nW, N, N] per-window additive -> [H, nW//G, G*N, G*N] with the
    windows' masks on the diagonal blocks and NEG_INF elsewhere (computed
    once outside the kernel; tiny vs activations)."""
    H, nW, N, _ = addmask.shape
    T = nW // G
    grouped = addmask.reshape(H, T, G, N, N)
    eye = jnp.eye(G, dtype=addmask.dtype)  # [G, G]
    # place block g at (g, g): out[h,t, g1*N+i, g2*N+j]
    bd = jnp.einsum("htgij,gk->htgikj", grouped, eye)  # [H,T,G,N,G,N]
    bd = bd.transpose(0, 1, 2, 3, 4, 5).reshape(H, T, G * N, G * N)
    off = (1.0 - jnp.kron(jnp.eye(G, dtype=addmask.dtype),
                          jnp.ones((N, N), addmask.dtype))) * NEG_INF
    return bd + off[None, None]


@functools.partial(jax.jit, static_argnames=("num_heads", "G"))
def _fused_fwd(qkv: jax.Array, addmask: jax.Array, num_heads: int, G: int):
    Bn, N, C3 = qkv.shape
    C = C3 // 3
    H = num_heads
    dh = C // H
    scale = dh ** -0.5
    nW = addmask.shape[1]

    # head-major layout [H, Bn, N, dh]: block last-two dims (N, dh) satisfy
    # the (div-8, ==array-dim) Mosaic constraint.
    q = qkv[..., :C].reshape(Bn, N, H, dh).transpose(2, 0, 1, 3)
    k = qkv[..., C : 2 * C].reshape(Bn, N, H, dh).transpose(2, 0, 1, 3)
    v = qkv[..., 2 * C :].reshape(Bn, N, H, dh).transpose(2, 0, 1, 3)

    n_tiles = Bn // G
    tiles_per_image_mask = max(1, nW // G)
    bd = _block_diag_mask(addmask.astype(jnp.float32), G)

    def qkv_spec():
        return pl.BlockSpec((1, G, N, dh), lambda i, h: (h, i, 0, 0),
                            memory_space=pltpu.VMEM)

    grid_spec = pl.GridSpec(
        grid=(n_tiles, H),
        in_specs=[
            qkv_spec(), qkv_spec(), qkv_spec(),
            pl.BlockSpec((1, 1, G * N, G * N),
                         lambda i, h: (h, i % tiles_per_image_mask, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, G, N, dh), lambda i, h: (h, i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_kernel, G=G, N=N, dh=dh, scale=scale),
        out_shape=jax.ShapeDtypeStruct((H, Bn, N, dh), qkv.dtype),
        grid_spec=grid_spec,
    )(q, k, v, bd)
    return out.transpose(1, 2, 0, 3).reshape(Bn, N, C)


def _reference_attention(qkv: jax.Array, addmask: jax.Array,
                         num_heads: int) -> jax.Array:
    """jnp reference (same math; used for bwd and for the ws-7 fallback)."""
    Bn, N, C3 = qkv.shape
    C = C3 // 3
    H = num_heads
    dh = C // H
    nW = addmask.shape[1]
    q = qkv[..., :C].reshape(Bn, N, H, dh)
    k = qkv[..., C : 2 * C].reshape(Bn, N, H, dh)
    v = qkv[..., 2 * C :].reshape(Bn, N, H, dh)
    attn = jnp.einsum("bnhd,bmhd->bhnm", q * (dh**-0.5), k,
                      preferred_element_type=jnp.float32)
    # addmask [H, nW, N, N] -> per window (windows cycle every nW)
    add = jnp.tile(addmask.transpose(1, 0, 2, 3), (Bn // nW, 1, 1, 1))
    attn = attn + add
    attn = jax.nn.softmax(attn, axis=-1).astype(qkv.dtype)
    out = jnp.einsum("bhnm,bmhd->bnhd", attn, v,
                     preferred_element_type=jnp.float32)
    return out.astype(qkv.dtype).reshape(Bn, N, C)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def fused_window_attention(qkv: jax.Array, addmask: jax.Array,
                           num_heads: int, G: int) -> jax.Array:
    """Fused forward; differentiable (bwd via the reference path).

    Args:
      qkv: [Bn, N, 3C] packed projections (windows flattened into batch).
      addmask: [H, nW, N, N] additive rel-pos bias (+ shift mask), f32.
      num_heads: H. G: windows per program (must divide Bn and nW or
        equal a multiple of nW handling).
    """
    return _fused_fwd(qkv, addmask, num_heads, G)


def _fwd(qkv, addmask, num_heads, G):
    return _fused_fwd(qkv, addmask, num_heads, G), (qkv, addmask)


def _bwd(num_heads, G, res, g):
    qkv, addmask = res
    _, vjp = jax.vjp(
        lambda qkv_, mask_: _reference_attention(qkv_, mask_, num_heads),
        qkv, addmask)
    dqkv, dmask = vjp(g)
    return dqkv, dmask


fused_window_attention.defvjp(_fwd, _bwd)


def pick_group_size(Bn: int, nW: int, N: int, dh: int,
                    vmem_budget: int = 4 * 1024 * 1024) -> int:
    """Largest G dividing nW with (G*N)^2 f32 scores under the VMEM budget."""
    for G in (16, 8, 4, 2, 1):
        if nW % G or Bn % G:
            continue
        if (G * N) ** 2 * 4 <= vmem_budget:
            return G
    return 1
