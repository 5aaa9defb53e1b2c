"""Device-resident dataset cache: per-task sample banks in HBM + on-device
batch gather.

Why this exists (measured, PERF.md r4): on a host whose device link is a
network tunnel (the axon dev setup) a per-step ``device_put`` of a
24x512^2 batch blocks ~340 ms while the previous step executes — the
transport serializes H2D with compute, so a DataEngine-fed loop runs
transfer-bound at ~43 img/s against a 155 img/s device rate. On co-located
TPU hosts the same transfer is ~4 ms over PCIe, but either way the
TPU-native answer is to stop shipping the batch: stage every decoded,
resized sample to HBM ONCE (uint8 — 512^2 images are 786 KB each), then
assemble each step's batch with an on-device gather driven by the host
sampler's indices. Per-step wire traffic drops to one tiny int32 index
vector; the train/eval step programs are unchanged (they receive the same
uint8 image / int32 label arrays the host path produces).

Scaling (VERDICT r4 #6 / ADVICE r4 medium):

* **Mesh-aware staging** — under a ``jax.sharding.Mesh`` with a ``data``
  axis, banks are staged sharded over the sample axis and the gather emits
  batch-sharded outputs (``PartitionSpec('data')`` on the batch dim), so
  a dp Trainer consumes them without a per-step reshard copy and
  mesh-sharded eval steps see compatible device sets. Multi-host: each
  process stages its addressable shard of the banks (standard GSPMD
  single-controller semantics of ``jax.device_put`` with a NamedSharding).
* **Partial staging** — with ``partial=True`` whole tasks are staged
  largest-first until the budget is spent; un-staged tasks keep streaming
  through the host path (the sampler's one-task-per-batch invariant makes
  task granularity exact: every batch is either fully staged or fully
  streamed). A >budget dataset degrades to a mix instead of falling off
  the streaming cliff.
* **Parallel decode + substitution visibility** — staging decodes with a
  thread pool, and samples whose bytes came from a *different* row (the
  dataset's corrupt-image retry, reference dataset.py:49-52) are logged
  instead of silently frozen into the bank.

The reference has no analogue (its DataLoader re-decodes JPEGs every epoch,
reference dataset.py:35-137); this subsumes ``data.cache_samples`` when the
dataset fits the budget.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from fmc_uia_tpu.data.dataset import MultiTaskDataset
from fmc_uia_tpu.parallel.mesh import batch_sharding
from fmc_uia_tpu.tasks import SEGMENTATION, TaskRegistry


def _narrow_labels(task_name: str, labels: np.ndarray,
                   num_classes: int) -> np.ndarray:
    """Segmentation masks are class ids < 256 — store/ship them as uint8
    (4x fewer bytes than int32); consumers widen on device."""
    if (task_name == SEGMENTATION and labels.dtype == np.int32
            and num_classes <= 255):
        return labels.astype(np.uint8)
    return labels


class DeviceDatasetCache:
    """Per-task sample banks staged to device memory once.

    Args:
      dataset: the host dataset (decode/resize happens here, once per index).
      indices: dataset indices to stage (typically the full split union so
        train and val share one bank).
      registry: task registry (label widening metadata).
      budget_bytes: staging budget. With ``partial=False`` exceeding it
        raises MemoryError (callers fall back to streaming); with
        ``partial=True`` tasks are staged largest-first while they fit and
        the rest stream.
      mesh: optional ``jax.sharding.Mesh``; when it has a ``data`` axis the
        banks are sharded over it and gathers emit batch-sharded outputs.
      partial: enable graceful partial staging (see module docstring).
      workers: decode thread-pool width for staging.
    Raises:
      MemoryError: when ``partial=False`` and the staged banks would exceed
        ``budget_bytes``.
    """

    def __init__(self, dataset: MultiTaskDataset, indices: Sequence[int],
                 registry: TaskRegistry, budget_bytes: int = 4 << 30,
                 mesh=None, partial: bool = False, workers: int = 4):
        self.registry = registry
        self.mesh = mesh if (mesh is not None
                             and "data" in getattr(mesh, "axis_names", ())
                             ) else None
        if self.mesh is not None:
            # batch_sharding handles hybrid DCN x ICI meshes (the batch
            # splits over ('dcn_data', 'data')); banks shard their sample
            # axis the same way so gather locality follows the batch layout
            self._batch_ns = batch_sharding(self.mesh)
            spec0 = self._batch_ns.spec[0]
            axes = (spec0,) if isinstance(spec0, str) else tuple(spec0)
            self._n_shards = int(np.prod([self.mesh.shape[a]
                                          for a in axes]))
        by_task: Dict[str, List[int]] = {}
        for i in indices:
            tid = dataset.dataframe.iloc[int(i)]["task_id"]
            by_task.setdefault(tid, []).append(int(i))

        # index -> (task bank, position inside it)
        self.position: Dict[int, int] = {}
        self._index_task: Dict[int, str] = {}
        self._images: Dict[str, jax.Array] = {}
        self._labels: Dict[str, jax.Array] = {}
        self.skipped_tasks: List[str] = []
        self.substituted: List[tuple] = []  # (requested, actual source)

        pool = ThreadPoolExecutor(max_workers=max(1, int(workers)))
        try:
            total = 0
            staged: Dict[str, tuple] = {}
            # largest-first: staging order maximizes covered batches when
            # the budget forces a partial cache
            order = sorted(by_task, key=lambda t: -len(by_task[t]))
            for tid in order:
                rows = by_task[tid]
                spec = registry[tid]
                samples = list(pool.map(dataset.__getitem__, rows))
                for i, s in zip(rows, samples):
                    src = int(s.get("source_index", i))
                    if src != i:
                        self.substituted.append((i, src))
                        print(f"[data] device cache: index {i} decoded "
                              f"from row {src} (corrupt-image retry); the "
                              f"substitution is frozen into the bank")
                images = np.stack([s["image"] for s in samples])
                if images.dtype != np.float32:  # adaptive-norm path is f32
                    images = images.astype(np.uint8)
                labels = np.stack([s["label"] for s in samples])
                labels = _narrow_labels(spec.task_name, labels,
                                        spec.num_classes)
                nbytes = images.nbytes + labels.nbytes
                if total + nbytes > budget_bytes:
                    if partial:
                        self.skipped_tasks.append(tid)
                        print(f"[data] device cache: task {tid} "
                              f"({nbytes / 1e6:.0f} MB) exceeds the "
                              f"remaining budget; it streams from the host")
                        continue
                    raise MemoryError(
                        f"device dataset cache would exceed budget "
                        f"({(total + nbytes) / 1e6:.0f} MB > "
                        f"{budget_bytes / 1e6:.0f} MB) at task {tid}; "
                        f"falling back to streaming is the caller's job")
                total += nbytes
                for pos, i in enumerate(rows):
                    self.position[i] = pos
                    self._index_task[i] = tid
                staged[tid] = (images, labels)
        finally:
            pool.shutdown(wait=False)

        self.nbytes = total
        for tid, (images, labels) in staged.items():
            self._images[tid] = self._stage(images)
            self._labels[tid] = self._stage(labels)

        if self.mesh is not None:
            batch_spec = self._batch_ns

            def _gather(images, labels, idx):
                g_img = jax.lax.with_sharding_constraint(
                    jnp.take(images, idx, axis=0), batch_spec)
                g_lab = jax.lax.with_sharding_constraint(
                    jnp.take(labels, idx, axis=0), batch_spec)
                if g_lab.dtype == jnp.uint8:
                    g_lab = g_lab.astype(jnp.int32)
                return g_img, g_lab

            self._gather = jax.jit(_gather)
        else:

            @jax.jit
            def _gather(images, labels, idx):
                g_img = jnp.take(images, idx, axis=0)
                g_lab = jnp.take(labels, idx, axis=0)
                if g_lab.dtype == jnp.uint8:
                    g_lab = g_lab.astype(jnp.int32)  # widen on device (free)
                return g_img, g_lab

            self._gather = _gather

    def _stage(self, bank: np.ndarray) -> jax.Array:
        """Stage one bank to device; sharded over the mesh's data axis when
        one exists (pad the sample axis to divisibility — padding rows are
        unreachable: gather indices only ever point at real positions)."""
        if self.mesh is None:
            return jax.device_put(bank)
        n = bank.shape[0]
        pad = (-n) % self._n_shards
        if pad:
            bank = np.concatenate(
                [bank, np.zeros((pad,) + bank.shape[1:], bank.dtype)])
        return jax.device_put(bank, self._batch_ns)

    def covers(self, indices: Sequence[int]) -> bool:
        return all(int(i) in self.position for i in indices)

    def get_batch(self, rows: Sequence[int], n_valid: Optional[int] = None
                  ) -> Dict:
        """Assemble one single-task batch on device.

        ``rows`` are dataset indices (same contract as
        DataEngine._load_batch, including padded final eval chunks)."""
        # all rows share a task by the sampler/eval-batch invariant
        tid = self._task_of(int(rows[0]))
        positions = np.empty((len(rows),), np.int32)
        for k, i in enumerate(rows):
            positions[k] = self.position[int(i)]
        spec = self.registry[tid]
        idx = jnp.asarray(positions)  # tiny transfer (B * 4 bytes)
        image, label = self._gather(self._images[tid], self._labels[tid],
                                    idx)
        B = len(rows)
        valid = np.arange(B) < (B if n_valid is None else n_valid)
        return {
            "image": image,
            "label": label,
            "task_id": tid,
            "task_index": spec.global_index,
            "task_type": spec.task_name,
            "valid": valid,
        }

    # -- helpers ------------------------------------------------------------
    def _task_of(self, index: int) -> str:
        tid = self._index_task.get(index)
        if tid is None:
            raise KeyError(f"index {index} not staged in the device cache")
        return tid


def build_device_cache(dataset: MultiTaskDataset, indices: Sequence[int],
                       registry: TaskRegistry, budget_bytes: int,
                       mesh=None, partial: bool = True, workers: int = 4
                       ) -> Optional[DeviceDatasetCache]:
    """Build a cache (partial by default: over-budget tasks stream), or
    return None (with a console note) when nothing could be staged."""
    try:
        cache = DeviceDatasetCache(dataset, indices, registry, budget_bytes,
                                   mesh=mesh, partial=partial,
                                   workers=workers)
    except MemoryError as e:
        print(f"[data] device cache disabled: {e}")
        return None
    if not cache.position:
        print("[data] device cache disabled: no task fits the budget")
        return None
    return cache
