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

The reference has no analogue (its DataLoader re-decodes JPEGs every epoch,
reference dataset.py:35-137); this subsumes ``data.cache_samples`` when the
dataset fits the budget.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from fmc_uia_tpu.data.dataset import MultiTaskDataset
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
      budget_bytes: refuse to build if the banks would exceed this
        (callers fall back to the streaming path).
    Raises:
      MemoryError: when the staged banks would exceed ``budget_bytes``.
    """

    def __init__(self, dataset: MultiTaskDataset, indices: Sequence[int],
                 registry: TaskRegistry, budget_bytes: int = 4 << 30,
                 devices: Optional[list] = None):
        self.registry = registry
        by_task: Dict[str, List[int]] = {}
        for i in indices:
            tid = dataset.dataframe.iloc[int(i)]["task_id"]
            by_task.setdefault(tid, []).append(int(i))

        # index -> (task bank, position inside it)
        self.position: Dict[int, int] = {}
        self._index_task: Dict[int, str] = {}
        self._images: Dict[str, jax.Array] = {}
        self._labels: Dict[str, jax.Array] = {}

        total = 0
        staged: Dict[str, tuple] = {}
        for tid, rows in by_task.items():
            spec = registry[tid]
            samples = [dataset[i] for i in rows]
            images = np.stack([s["image"] for s in samples])
            if images.dtype != np.float32:  # adaptive-norm path is f32
                images = images.astype(np.uint8)
            labels = np.stack([s["label"] for s in samples])
            labels = _narrow_labels(spec.task_name, labels,
                                    spec.num_classes)
            total += images.nbytes + labels.nbytes
            if total > budget_bytes:
                raise MemoryError(
                    f"device dataset cache would exceed budget "
                    f"({total / 1e6:.0f} MB > {budget_bytes / 1e6:.0f} MB) "
                    f"at task {tid}; falling back to streaming is the "
                    f"caller's job")
            for pos, i in enumerate(rows):
                self.position[i] = pos
                self._index_task[i] = tid
            staged[tid] = (images, labels)

        self.nbytes = total
        for tid, (images, labels) in staged.items():
            self._images[tid] = jax.device_put(images)
            self._labels[tid] = jax.device_put(labels)

        @jax.jit
        def _gather(images, labels, idx):
            g_img = jnp.take(images, idx, axis=0)
            g_lab = jnp.take(labels, idx, axis=0)
            if g_lab.dtype == jnp.uint8:
                g_lab = g_lab.astype(jnp.int32)  # widen on device (free)
            return g_img, g_lab

        self._gather = _gather

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
                       registry: TaskRegistry, budget_bytes: int
                       ) -> Optional[DeviceDatasetCache]:
    """Build a cache, or return None (with a console note) when the dataset
    exceeds the budget — streaming remains the fallback."""
    try:
        return DeviceDatasetCache(dataset, indices, registry, budget_bytes)
    except MemoryError as e:
        print(f"[data] device cache disabled: {e}")
        return None
