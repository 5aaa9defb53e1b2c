"""Multi-host (multi-slice) distributed setup: DCN x ICI meshes.

The reference is single-process/single-device (SURVEY.md §2.11 — its
``device.multi_gpu`` keys are never read). Here multi-host is first-class
and TPU-native: ``jax.distributed.initialize`` bootstraps the process group
over DCN, and the device mesh gets a leading ``dcn_data`` axis so
data-parallel gradient reduction happens hierarchically — reduce-scatter
over ICI within a slice, then the (much slower) DCN hop only moves the
per-slice partials. XLA emits that decomposition automatically from the
mesh axis ordering; there is no hand-written comm layer.

Usage (one call per process, before any other jax API):

    from fmc_uia_tpu.parallel import init_distributed, make_hybrid_mesh
    init_distributed(config)            # no-op in single-process runs
    mesh = make_hybrid_mesh(ici_axes={"data": -1, "model": 1})

Env contract (standard JAX multi-process vars, overridable via the
``parallel.distributed`` config section):
  JAX_COORDINATOR_ADDRESS  host:port of process 0
  JAX_NUM_PROCESSES        world size
  JAX_PROCESS_ID           this process's rank
On Cloud TPU slices all three are auto-detected and
``jax.distributed.initialize()`` needs no arguments.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh

_initialized = False


def init_distributed(config=None) -> bool:
    """Initialize the JAX process group if this is a multi-process run.

    Returns True when distributed mode is active. Single-process runs
    (the common case, and all tests) return False without side effects.
    """
    global _initialized
    if _initialized:
        return True

    dist_cfg: Dict = {}
    if config is not None:
        dist_cfg = config.get("parallel.distributed", {}) or {}
    if not dist_cfg.get("enabled", True):
        return False

    coordinator = dist_cfg.get(
        "coordinator_address", os.environ.get("JAX_COORDINATOR_ADDRESS"))
    num_processes = dist_cfg.get(
        "num_processes", os.environ.get("JAX_NUM_PROCESSES"))
    process_id = dist_cfg.get(
        "process_id", os.environ.get("JAX_PROCESS_ID"))

    if num_processes is not None and int(num_processes) <= 1:
        return False
    if coordinator is None and num_processes is None:
        # Cloud TPU slices auto-detect; elsewhere a bare initialize() on a
        # single host is a hang risk, so only auto-init when the TPU
        # runtime advertises MULTIPLE worker hosts (a single-host value
        # like 'localhost' is set even on one chip).
        hosts = os.environ.get("TPU_WORKER_HOSTNAMES", "")
        if "," in hosts:
            jax.distributed.initialize()
            _initialized = True
            return True
        return False

    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=int(num_processes) if num_processes else None,
        process_id=int(process_id) if process_id is not None else None,
    )
    _initialized = True
    return True


def make_hybrid_mesh(ici_axes: Optional[Dict[str, int]] = None,
                     num_slices: Optional[int] = None,
                     devices=None) -> Mesh:
    """Build a (dcn_data, *ici_axes) mesh.

    ``ici_axes``: ordered {axis_name: size} within one slice; one size may
    be -1 (inferred). ``num_slices`` defaults to ``jax.process_count()``
    (1 => the dcn_data axis is size 1 and the mesh degenerates to ICI-only
    semantics, so the same training code runs everywhere).

    Devices are ordered (process_index, id) before reshaping, so each
    dcn_data row holds exactly one slice's chips and the inner axes ride
    ICI.
    """
    if devices is None:
        devices = jax.devices()
    if num_slices is None:
        num_slices = max(1, jax.process_count())
    devices = sorted(devices, key=lambda d: (d.process_index, d.id))
    n = len(devices)
    if n % num_slices != 0:
        raise ValueError(f"{n} devices not divisible into {num_slices} "
                         "slices")
    per_slice = n // num_slices

    ici_axes = dict(ici_axes or {"data": -1})
    sizes = list(ici_axes.values())
    known = int(np.prod([s for s in sizes if s != -1])) if sizes else 1
    if -1 in sizes:
        if per_slice % known != 0:
            raise ValueError(
                f"ici axes {ici_axes} incompatible with {per_slice} "
                "devices per slice")
        sizes[sizes.index(-1)] = per_slice // known
    if int(np.prod(sizes)) != per_slice:
        raise ValueError(
            f"ici axes {dict(zip(ici_axes, sizes))} != {per_slice} "
            "devices per slice")

    shape = (num_slices,) + tuple(sizes)
    axis_names = ("dcn_data",) + tuple(ici_axes.keys())
    return Mesh(np.asarray(devices).reshape(shape), axis_names)


def mesh_from_config(config) -> Optional[Mesh]:
    """Build the training mesh declared by the ``parallel`` config section.

    Returns None when no mesh is requested (single-device training).

      parallel:
        mesh: {data: -1}             # 1-D data parallel over all chips
        mesh: {data: -1, model: 2}   # dp x tp
        distributed: {enabled: true} # + leading dcn_data axis per process
    """
    if config is None:
        return None
    par = config.get("parallel", {}) or {}
    mesh_spec = par.get("mesh")
    if not mesh_spec:
        return None
    if jax.process_count() > 1:
        return make_hybrid_mesh(ici_axes=dict(mesh_spec))
    from fmc_uia_tpu.parallel.mesh import make_mesh

    devices = jax.devices()
    sizes = list(dict(mesh_spec).values())
    known = int(np.prod([s for s in sizes if s != -1]))
    if -1 in sizes:
        sizes[sizes.index(-1)] = len(devices) // known
    return make_mesh(devices[: int(np.prod(sizes))],
                     axes=tuple(dict(mesh_spec).keys()),
                     shape=tuple(sizes))
