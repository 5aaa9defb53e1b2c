"""Device mesh and sharding utilities.

The reference is strictly single-device — its ``device.multi_gpu`` /
``device_ids`` config keys are never read (SURVEY.md §0, §2.11). Here
multi-chip is first-class and TPU-native: a ``jax.sharding.Mesh`` over ICI,
parameters replicated, the batch sharded on the ``data`` axis. Because the
train steps are pure SPMD programs under jit, XLA inserts the gradient
all-reduce (psum over ICI) automatically — there is no hand-written
collective layer to maintain (the "NCCL equivalent" is the compiler).

The default mesh is 1-D ``("data",)``. A second ``model`` axis is accepted
for future tensor-parallel encoder shardings (swin_l/vit_l); with
``model=1`` it is a no-op.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence] = None,
              axes: Tuple[str, ...] = ("data",),
              shape: Optional[Tuple[int, ...]] = None) -> Mesh:
    """Build a mesh over the given (default: all) devices."""
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices)
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axes) - 1)
    return Mesh(devices.reshape(shape), axes)


def batch_sharding(mesh: Mesh, data_axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim across the data axis — and across the
    ``dcn_data`` slice axis too on hybrid DCN x ICI meshes (the per-process
    global batch splits over slices first, then chips)."""
    if "dcn_data" in mesh.axis_names and data_axis in mesh.axis_names:
        return NamedSharding(mesh, P(("dcn_data", data_axis)))
    return NamedSharding(mesh, P(data_axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict, mesh: Mesh, data_axis: str = "data") -> Dict:
    """device_put array leaves of a batch dict: batch-dim sharded arrays,
    scalars replicated."""
    bs = batch_sharding(mesh, data_axis)
    rs = replicated_sharding(mesh)

    def put(x):
        x = np.asarray(x) if not isinstance(x, jax.Array) else x
        if getattr(x, "ndim", 0) >= 1:
            return jax.device_put(x, bs)
        return jax.device_put(x, rs)

    return {k: (put(v) if not isinstance(v, str) else v)
            for k, v in batch.items()}


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params / optimizer state) across the mesh."""
    rs = replicated_sharding(mesh)
    return jax.device_put(tree, rs)
