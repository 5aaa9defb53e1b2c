"""Ragged expert parallelism: capacity-based token dispatch over ICI.

The package's default MoE (models/conditioning.py MoEConvBlock, mirroring
reference moe.py:31-145) computes ALL experts densely and combines by the
routing weights — the right call at 4-16 conv experts, where dispatch
overhead would dominate. For large expert counts sharded over a mesh axis,
this module provides the GShard/Switch-style alternative: each device hosts
``E / D`` experts, tokens are routed to the device that owns their expert
with a single ``lax.all_to_all`` (one ICI hop each way), and each expert
processes only the tokens routed to it.

Capacity semantics (standard GShard): each expert accepts at most
``capacity`` tokens per source device; overflow tokens are dropped from the
expert path (their combine weight contributes zero — with the usual
residual connection they pass through unchanged). With
``capacity >= local_tokens * top_k`` no token can overflow and the result
is numerically IDENTICAL to the dense compute — that equivalence is the
correctness contract tested in tests/test_expert_parallel.py.

A "token" here is whatever one routing decision covers — for the conv MoE
a whole [H,W,C] feature map (per-sample routing, reference moe.py:85-120).
The API is shape-agnostic: trailing dims are flattened around the expert
function.
"""

from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.8
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map


def default_capacity(local_tokens: int, num_experts: int, top_k: int,
                     capacity_factor: float = 2.0) -> int:
    """Per-(expert, source-device) capacity. ``capacity_factor >=
    num_experts / top_k`` (or just ``capacity >= local_tokens * top_k``)
    guarantees zero drops."""
    return max(1, math.ceil(local_tokens * top_k * capacity_factor
                            / num_experts))


def _dispatch_tensors(probs, top_k: int, capacity: int):
    """Build dispatch/combine tensors for local tokens.

    Args:
      probs: [b, E] softmax routing probabilities.
      top_k: experts per token.
      capacity: slots per expert (for this source device).

    Returns:
      dispatch: [b, E, cap] 0/1; combine: [b, E, cap] gate-weighted;
      both zero for overflow tokens.
    """
    b, E = probs.shape
    gates, idx = jax.lax.top_k(probs, top_k)  # [b, k]
    gates = gates / (jnp.sum(gates, axis=1, keepdims=True) + 1e-9)

    # flatten choices in (slot-priority) order: all tokens' 1st choice,
    # then 2nd, ... — matches GShard's position assignment
    flat_idx = idx.T.reshape(-1)  # [k*b]
    flat_gate = gates.T.reshape(-1)
    onehot = jax.nn.one_hot(flat_idx, E, dtype=jnp.float32)  # [k*b, E]
    # slot within the chosen expert: running count of prior assignments
    pos = (jnp.cumsum(onehot, axis=0) - 1.0) * onehot  # [k*b, E]
    pos = jnp.sum(pos, axis=1)  # [k*b]
    keep = pos < capacity

    slot_oh = jax.nn.one_hot(
        jnp.where(keep, pos, -1.0).astype(jnp.int32), capacity,
        dtype=jnp.float32)  # [k*b, cap]
    disp_flat = onehot[:, :, None] * slot_oh[:, None, :]  # [k*b, E, cap]
    comb_flat = disp_flat * flat_gate[:, None, None]

    disp = disp_flat.reshape(top_k, b, E, capacity).sum(0)
    comb = comb_flat.reshape(top_k, b, E, capacity).sum(0)
    return disp, comb


def ragged_moe_apply(expert_fn: Callable, expert_params, x, probs,
                     mesh: Mesh, axis: str = "model", top_k: int = 1,
                     capacity_factor: float = 2.0):
    """Expert-parallel MoE layer with all_to_all token dispatch.

    Args:
      expert_fn: ``(params_e, tokens) -> tokens`` applied per expert to a
        [n, ...] batch of tokens; output shape must equal input shape.
      expert_params: pytree, leaves with leading dim E, sharded over
        ``axis`` (device d holds experts ``d*Eloc:(d+1)*Eloc``).
      x: [B, ...] tokens, batch-sharded over ``axis``.
      probs: [B, E] routing probabilities (batch-sharded like ``x``).
      mesh: mesh containing ``axis``.
      top_k / capacity_factor: routing hyperparameters.

    Returns:
      [B, ...] combined expert outputs (overflow tokens -> zeros; add your
      residual outside).
    """
    D = mesh.shape[axis]
    E = probs.shape[-1]
    if E % D:
        raise ValueError(f"num_experts {E} must divide over mesh axis "
                         f"{axis!r} of size {D}")
    B = x.shape[0]
    if B % D:
        raise ValueError(f"batch {B} must shard over {axis!r} size {D}")
    Eloc = E // D
    bloc = B // D
    cap = default_capacity(bloc, E, top_k, capacity_factor)
    token_shape = x.shape[1:]
    F = int(math.prod(token_shape)) if token_shape else 1

    def per_device(params, xb, pb):
        # xb: [bloc, ...]; pb: [bloc, E]; params leaves: [Eloc, ...]
        disp, comb = _dispatch_tensors(pb.astype(jnp.float32), top_k, cap)
        xf = xb.reshape(bloc, F)
        # gather tokens into expert slots: [E, cap, F]
        expert_in = jnp.einsum("bec,bf->ecf", disp.astype(xf.dtype), xf)
        # ship slots to the devices owning each expert
        t = expert_in.reshape(D, Eloc, cap, F)
        t = jax.lax.all_to_all(t, axis, split_axis=0, concat_axis=0)
        # t: [D(source), Eloc, cap, F] -> per-expert token batches
        t = t.transpose(1, 0, 2, 3).reshape(Eloc, D * cap, *token_shape)
        out = jax.vmap(expert_fn)(params, t)  # [Eloc, D*cap, ...]
        out = out.reshape(Eloc, D, cap, F).transpose(1, 0, 2, 3)
        out = jax.lax.all_to_all(out, axis, split_axis=0, concat_axis=0)
        # back to [E, cap, F] in source layout
        out = out.reshape(E, cap, F)
        yf = jnp.einsum("bec,ecf->bf", comb.astype(out.dtype), out)
        return yf.reshape(bloc, *token_shape)

    param_specs = jax.tree_util.tree_map(
        lambda p: P(*([axis] + [None] * (p.ndim - 1))), expert_params)
    fn = shard_map(per_device, mesh=mesh,
                   in_specs=(param_specs, P(axis), P(axis)),
                   out_specs=P(axis), check_vma=False)
    return fn(expert_params, x, probs)


def dense_moe_reference(expert_fn: Callable, expert_params, x, probs,
                        top_k: int = 1):
    """Dense all-expert reference (the MoEConvBlock semantics): every expert
    runs on every token; outputs combined by renormalized top-k gates."""
    E = probs.shape[-1]
    gates, idx = jax.lax.top_k(probs, top_k)
    gates = gates / (jnp.sum(gates, axis=1, keepdims=True) + 1e-9)
    w = jnp.zeros_like(probs)
    for j in range(top_k):
        w = w + jax.nn.one_hot(idx[:, j], E, dtype=probs.dtype) * gates[:, j:j + 1]
    outs = jax.vmap(lambda p: expert_fn(p, x))(expert_params)  # [E, B, ...]
    w_t = w.T.reshape((E, x.shape[0]) + (1,) * (x.ndim - 1))
    return jnp.sum(outs * w_t.astype(outs.dtype), axis=0)
