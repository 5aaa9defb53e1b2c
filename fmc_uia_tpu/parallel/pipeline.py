"""Pipeline parallelism: GPipe-style microbatch pipelining over a mesh axis.

The reference is strictly single-device (SURVEY.md §2.11) — pipeline
parallelism is a new, TPU-native capability for models whose parameters +
activations exceed one chip (swin_l / vit_l at >512², or deeper stacks).

Design (the canonical JAX/TPU formulation, cf. the scaling-book pipelining
chapter): the S pipeline stages live one-per-device along a ``pipe`` mesh
axis. Under ``shard_map`` every device runs the SAME program: a
``lax.scan`` over ``M + S - 1`` ticks in which it applies its local stage
to its current activation, then passes the result to the next device with
``lax.ppermute`` (a point-to-point ICI hop — no host involvement). Device 0
injects a fresh microbatch each tick; device S-1 collects outputs. The
pipeline "bubble" is the standard (S-1)/(M+S-1) idle fraction — choose
M >> S.

Because ``ppermute`` and ``scan`` are differentiable (the transpose of a
ppermute is the reversed ppermute), ``jax.grad`` through
:func:`pipeline_apply` yields the exact backward pipeline schedule
automatically — no hand-written backward pass.

Constraints: every stage must map activations of one fixed shape/dtype to
the same shape/dtype (uniform pipeline). Stages with different internal
widths are fine — only the inter-stage activation signature is constrained.
For hierarchical encoders (Swin's 4 resolution stages) this means
pipelining applies within a resolution stage (e.g. splitting swin_l's
18-block stage 2 across chips), not across patch-merging boundaries.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.8
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map


def stack_stage_params(params_list: Sequence):
    """Stack a list of identically-structured per-stage param trees along a
    new leading 'stage' axis (the axis sharded over the ``pipe`` mesh
    axis)."""
    return jax.tree_util.tree_map(
        lambda *leaves: jnp.stack(leaves, axis=0), *params_list)


def shard_stage_params(stacked, mesh: Mesh, axis: str = "pipe"):
    """Place stage-stacked params so device i of the pipe axis holds stage
    i's slice."""
    def put(leaf):
        spec = P(*([axis] + [None] * (leaf.ndim - 1)))
        return jax.device_put(leaf, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map(put, stacked)


def pipeline_apply(stage_fn: Callable, stacked_params, x_microbatches,
                   mesh: Mesh, axis: str = "pipe"):
    """Run S pipeline stages over M microbatches.

    Args:
      stage_fn: ``(stage_params, x) -> y`` with ``y.shape == x.shape`` and
        same dtype. Applied by every device to its local stage slice.
      stacked_params: pytree whose leaves have leading dim S (one slice per
        stage), sharded (or shardable) over ``axis``.
      x_microbatches: ``[M, mb, ...]`` array of microbatch inputs.
      mesh: mesh containing ``axis`` with size S.
      axis: pipeline mesh-axis name.

    Returns:
      ``[M, mb, ...]`` outputs, replicated over ``axis``.
    """
    S = mesh.shape[axis]
    M = x_microbatches.shape[0]
    T = M + S - 1
    fwd_perm = [(i, (i + 1) % S) for i in range(S)]

    def per_device(params, x_all):
        # shard_map hands each device a [1, ...] block of the stage axis
        local = jax.tree_util.tree_map(lambda p: p[0], params)
        idx = jax.lax.axis_index(axis)
        state = jnp.zeros(x_all.shape[1:], x_all.dtype)
        outbuf = jnp.zeros_like(x_all)

        def tick(carry, t):
            state, outbuf = carry
            # device 0 starts microbatch t (idles on garbage after t >= M;
            # masked out at collection)
            inject = jax.lax.dynamic_index_in_dim(
                x_all, jnp.clip(t, 0, M - 1), 0, keepdims=False)
            state = jnp.where(idx == 0, inject, state)
            y = stage_fn(local, state)
            # device S-1 finished microbatch m = t - (S-1)
            m = t - (S - 1)
            mi = jnp.clip(m, 0, M - 1)
            write = jnp.logical_and(idx == S - 1, m >= 0)
            prev = jax.lax.dynamic_index_in_dim(outbuf, mi, 0,
                                                keepdims=False)
            outbuf = jax.lax.dynamic_update_index_in_dim(
                outbuf, jnp.where(write, y, prev), mi, 0)
            state = jax.lax.ppermute(y, axis, fwd_perm)
            return (state, outbuf), None

        (_, outbuf), _ = jax.lax.scan(tick, (state, outbuf), jnp.arange(T))
        # only device S-1 ever wrote; psum replicates the result
        return jax.lax.psum(outbuf, axis)

    param_specs = jax.tree_util.tree_map(
        lambda p: P(*([axis] + [None] * (p.ndim - 1))), stacked_params)
    fn = shard_map(per_device, mesh=mesh,
                   in_specs=(param_specs, P()), out_specs=P(),
                   check_vma=False)
    return fn(stacked_params, x_microbatches)


def pipeline_swin_stage(encoder, params, stage: int, x, mesh: Mesh,
                        microbatches: int, axis: str = "pipe"):
    """Turnkey pipeline parallelism for one scanned Swin stage.

    Splits the stage's ``n_pairs`` (window, shifted-window) block pairs
    across the ``axis`` devices (e.g. swin_l's 18-block stage 2 = 9 pairs
    over a 3-device pipe axis) and streams ``microbatches`` microbatches
    through GPipe-style. The scanned stage's params are ALREADY stacked
    ``[n_pairs, ...]`` (nn.scan variable_axes), so chunking them into
    per-device slices is a reshape — no re-init, no checkpoint surgery.

    Deterministic forward (drop-path off): the pipeline is for
    activation-bound inference/fine-tuning of models whose stage exceeds
    one chip; gradients flow through it via autodiff (ppermute/scan are
    differentiable) but stochastic-depth rngs are not threaded.

    Args:
      encoder: the SwinEncoder module (hyperparameter source).
      params: the encoder's param tree (must contain ``stage{N}_scan``).
      stage: stage index (the stage must be scanned, depth even).
      x: ``[B, H, W, C]`` stage input (post patch-merging).
      mesh: mesh with pipeline axis ``axis`` of size S; n_pairs % S == 0.
      microbatches: M; B % M == 0. Bubble fraction = (S-1)/(M+S-1).

    Returns:
      ``[B, H, W, C]`` stage output, numerically equal to the sequential
      scan over all pairs.
    """
    from fmc_uia_tpu.models.encoders.swin import SwinBlockPair

    key = f"stage{stage}_scan"
    if key not in params:
        raise ValueError(
            f"{key} not in params — stage {stage} is not scanned "
            f"(scan_stages={encoder.scan_stages}); pipeline wiring needs "
            f"the stacked pair layout")
    stage_params = params[key]
    S = mesh.shape[axis]
    n_pairs = jax.tree_util.tree_leaves(stage_params)[0].shape[0]
    if n_pairs % S:
        raise ValueError(f"n_pairs {n_pairs} must divide over pipe axis "
                         f"size {S}")
    B = x.shape[0]
    if B % microbatches:
        raise ValueError(f"batch {B} must divide into {microbatches} "
                         f"microbatches")

    pair = SwinBlockPair(
        dim=encoder.embed_dim * (2 ** stage),
        num_heads=encoder.num_heads[stage],
        window_size=encoder.window_size,
        mlp_ratio=encoder.mlp_ratio,
        softmax_bf16=encoder.softmax_bf16,
        ln_bf16=encoder.ln_bf16,
        fused_block=encoder.fused_block,
        fused_mlp=encoder.fused_mlp,
        dtype=encoder.dtype,
    )
    zero_rates = jnp.zeros((2,), jnp.float32)

    # [n_pairs, ...] -> [S, n_pairs/S, ...] per-device chunks
    chunked = jax.tree_util.tree_map(
        lambda l: l.reshape((S, n_pairs // S) + l.shape[1:]), stage_params)

    def stage_fn(chunk, xx):
        def body(carry, pair_params):
            y, _ = pair.apply({"params": pair_params}, carry, zero_rates,
                              False)
            return y, None

        y, _ = jax.lax.scan(body, xx, chunk)
        return y

    x_mb = x.reshape((microbatches, B // microbatches) + x.shape[1:])
    out = pipeline_apply(stage_fn, chunked, x_mb, mesh, axis)
    return out.reshape(x.shape)


def pipeline_loss_fn(stage_fn: Callable, loss_fn: Callable, mesh: Mesh,
                     axis: str = "pipe"):
    """Convenience: ``(stacked_params, x_mb, y_mb) -> scalar`` mean loss
    over microbatches, differentiable w.r.t. the stacked params (the
    backward pipeline schedule falls out of autodiff through scan +
    ppermute)."""

    def fn(stacked_params, x_mb, y_mb):
        out = pipeline_apply(stage_fn, stacked_params, x_mb, mesh, axis)
        return loss_fn(out, y_mb)

    return fn
