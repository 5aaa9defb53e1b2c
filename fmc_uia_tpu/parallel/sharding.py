"""Parameter sharding rules: data + tensor parallelism.

With jit-SPMD, tensor parallelism is a *layout declaration* problem: give
each large matmul weight a PartitionSpec over the ``model`` mesh axis and
XLA inserts the all-gathers/reduce-scatters over ICI. Rules here follow the
Megatron pattern specialized to our encoders:

  * attention qkv / MLP up-projection kernels: shard the OUTPUT features
    (column parallel)  -> P(None, 'model')
  * attention proj / MLP down-projection kernels: shard the INPUT features
    (row parallel)     -> P('model', None)
  * conv kernels [kh, kw, cin, cout]: shard cout for big 1x1s, replicate
    small spatial convs
  * everything else (norms, biases, tables): replicated

The reference has no distributed execution at all (SURVEY.md §2.11); this is
a new first-class subsystem.
"""

from __future__ import annotations

import re
import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (path regex, spec builder) — first match wins. Paths are '/'-joined.
_COLUMN_PARALLEL = re.compile(
    r"(qkv|mlp_fc1|pwconv1|expert_in|attn1)/kernel$")
_ROW_PARALLEL = re.compile(
    r"(attn/proj|block\d+/proj|mlp_fc2|pwconv2|expert_out|attn2)/kernel$")


def tp_spec_for_path(path: str, ndim: int,
                     model_axis: str = "model") -> P:
    """PartitionSpec for one parameter path."""
    if _COLUMN_PARALLEL.search(path):
        return P(*([None] * (ndim - 1) + [model_axis]))
    if _ROW_PARALLEL.search(path):
        return P(*([None] * (ndim - 2) + [model_axis, None]))
    return P()


def _path_str(path) -> str:
    parts = []
    for p in path:
        parts.append(p.key if hasattr(p, "key") else str(p))
    return "/".join(parts)


def make_param_specs(params, model_axis: str = "model",
                     min_shard_dim: int = 256):
    """PartitionSpec pytree for a params tree.

    Only dims divisible-by-mesh and >= min_shard_dim get sharded (tiny heads
    stay replicated; divisibility is validated at placement time).
    """

    def spec(path, leaf):
        ps = tp_spec_for_path(_path_str(path), np.ndim(leaf), model_axis)
        # skip specs that reference a dim smaller than min_shard_dim
        for axis_idx, name in enumerate(ps):
            if name is not None and leaf.shape[axis_idx] < min_shard_dim:
                return P()
        return ps

    return jax.tree_util.tree_map_with_path(spec, params)


def apply_param_sharding(params, mesh: Mesh, specs=None,
                         model_axis: str = "model"):
    """device_put params with TP specs (replicated where spec is empty)."""
    if specs is None:
        specs = make_param_specs(params, model_axis)

    def put(leaf, ps):
        # drop specs whose sharded dim doesn't divide the mesh axis
        axis_size = dict(zip(mesh.axis_names, mesh.devices.shape)).get(
            model_axis, 1)
        for axis_idx, name in enumerate(ps):
            if name is not None and leaf.shape[axis_idx] % axis_size != 0:
                ps = P()
                break
        return jax.device_put(leaf, NamedSharding(mesh, ps))

    return jax.tree_util.tree_map(put, params, specs)
