"""ZeRO-1 optimizer-state sharding over the data axis.

The reference is single-device and keeps full AdamW moments resident
(SURVEY.md §2.11 — no distributed execution of any kind). On a TPU mesh the
moments are the largest redundantly-replicated state: f32 ``mu``/``nu`` for a
swin_b-sized model is ~0.7 GB per chip under plain data parallelism. ZeRO-1
shards them over the ``data`` axis instead — with jit-SPMD this is purely a
*layout declaration*: give each moment leaf a PartitionSpec over ``data`` and
XLA partitions the optimizer update, turning the gradient all-reduce into
reduce-scatter (for the moment update) + all-gather (for the applied param
delta) over ICI — the standard ZeRO-1 communication pattern, emitted by the
compiler rather than hand-written.

Opt-in via ``parallel.zero_optimizer: true``. Moments of tensor-parallel
params keep their TP dim sharding and gain the data-axis dim on a *different*
free dim when one divides evenly.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fmc_uia_tpu.parallel.sharding import tp_spec_for_path, _path_str

# leaves smaller than this stay replicated: sharding tiny norms/bias moments
# buys nothing and costs collective latency
_MIN_ZERO_SIZE = 65536


def zero_spec_for_leaf(path: str, leaf, mesh: Mesh,
                       data_axis: str = "data",
                       model_axis: str = "model") -> P:
    """PartitionSpec for one optimizer-state leaf.

    Starts from the TP spec the matching *parameter* would get (moment trees
    mirror the param tree, so the same path-suffix rules apply), then shards
    the first still-unsharded dim that divides the data-axis size.
    """
    ndim = np.ndim(leaf)
    if ndim == 0 or getattr(leaf, "size", 0) < _MIN_ZERO_SIZE:
        return P()
    axis_sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    data_size = axis_sizes.get(data_axis, 1)
    if data_size <= 1:
        return P()
    model_size = axis_sizes.get(model_axis, 1)
    if model_size > 1:
        base = list(tp_spec_for_path(path, ndim, model_axis))
        base += [None] * (ndim - len(base))
        # drop a TP dim that doesn't divide (mirrors apply_param_sharding)
        for i, name in enumerate(base):
            if name is not None and leaf.shape[i] % model_size != 0:
                base = [None] * ndim
                break
    else:
        base = [None] * ndim
    for i in range(ndim):
        if base[i] is None and leaf.shape[i] % data_size == 0 \
                and leaf.shape[i] >= data_size:
            base[i] = data_axis
            return P(*base)
    return P(*base)


def shard_opt_state(opt_state, mesh: Mesh, data_axis: str = "data",
                    model_axis: str = "model"):
    """device_put an optax state tree with ZeRO-1 shardings.

    Non-array leaves (schedule counters, empty states) are replicated.
    """

    def put(path, leaf):
        if not hasattr(leaf, "shape"):
            return leaf
        ps = zero_spec_for_leaf(_path_str(path), leaf, mesh,
                                data_axis, model_axis)
        return jax.device_put(leaf, NamedSharding(mesh, ps))

    return jax.tree_util.tree_map_with_path(put, opt_state)


def zero_sharded_fraction(opt_state) -> float:
    """Diagnostic: fraction of opt-state bytes that are actually sharded."""
    total = 0
    sharded = 0
    for leaf in jax.tree_util.tree_leaves(opt_state):
        if not hasattr(leaf, "nbytes"):
            continue
        total += leaf.nbytes
        spec = getattr(getattr(leaf, "sharding", None), "spec", None)
        if spec and any(s is not None for s in spec):
            sharded += leaf.nbytes
    return (sharded / total) if total else 0.0
