"""Batch pipeline: split, collate, prefetch.

Replaces the reference's torch DataLoader + worker-process stack
(reference train.py:114-171) with a thread-pooled host loader feeding
fixed-shape numpy batches, double-buffered ahead of the device. Every train
batch is single-task (sampler invariant); val batches are also grouped
per task so they hit the same 4 compiled eval steps (the reference instead
regroups mixed val batches inside evaluate(), metrics/__init__.py:96-104 —
same statistics, different batching).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from fmc_uia_tpu.data.dataset import MultiTaskDataset
from fmc_uia_tpu.data.device_cache import _narrow_labels, build_device_cache
from fmc_uia_tpu.data.sampler import MultiTaskUniformSampler
from fmc_uia_tpu.tasks import TaskRegistry


def split_train_val(dataframe, val_split: float, seed: int
                    ) -> Tuple[List[int], List[int]]:
    """Per-task stratified split with the reference's RNG discipline
    (reference train.py:115-129: seeded RandomState, per-task shuffle, first
    val_split fraction to val, then global shuffles)."""
    rng = np.random.RandomState(seed)
    train_indices: List[int] = []
    val_indices: List[int] = []
    for _, group in dataframe.groupby("task_id"):
        gidx = group.index.to_numpy().copy()
        rng.shuffle(gidx)
        n_val = int(len(gidx) * val_split)
        val_indices.extend(gidx[:n_val].tolist())
        train_indices.extend(gidx[n_val:].tolist())
    rng.shuffle(train_indices)
    rng.shuffle(val_indices)
    return train_indices, val_indices


def _collate(samples: Sequence[Dict], registry: TaskRegistry,
             n_valid: Optional[int] = None) -> Dict:
    """Stack one single-task batch into fixed-shape arrays.

    ``n_valid``: number of real samples when the batch was padded to a fixed
    size (final eval chunks); the ``valid`` mask lets the jitted eval steps
    ignore padding without recompiling per residual shape."""
    task_id = samples[0]["task_id"]
    spec = registry[task_id]
    images = np.stack([s["image"] for s in samples])
    if images.dtype != np.float32:  # adaptive-norm path yields float32
        images = images.astype(np.uint8)
    labels = np.stack([s["label"] for s in samples])
    # ship segmentation masks as uint8 (class ids < 256): 4x fewer H2D
    # bytes; Trainer.put_batch / evaluate widen to int32 on device, so the
    # compiled step programs are unchanged
    labels = _narrow_labels(spec.task_name, labels, spec.num_classes)
    B = len(samples)
    valid = np.arange(B) < (B if n_valid is None else n_valid)
    return {
        "image": images,
        "label": labels,
        "task_id": task_id,
        "task_index": spec.global_index,
        "task_type": spec.task_name,
        "valid": valid,
    }


class DataEngine:
    """Iterates collated single-task batches with background prefetch."""

    def __init__(
        self,
        dataset: MultiTaskDataset,
        indices: Sequence[int],
        registry: TaskRegistry,
        batch_size: int,
        shuffle_sampler: Optional[MultiTaskUniformSampler] = None,
        num_workers: int = 4,
        prefetch_depth: int = 2,
        drop_last: bool = True,
    ):
        self.dataset = dataset
        self.indices = list(indices)
        self.registry = registry
        self.batch_size = int(batch_size)
        self.sampler = shuffle_sampler
        self.num_workers = max(1, int(num_workers))
        self.prefetch_depth = max(0, int(prefetch_depth))
        self.drop_last = drop_last
        self._pool = ThreadPoolExecutor(max_workers=self.num_workers)
        # optional hook applied to each batch on the producer thread —
        # fit() points this at Trainer.put_batch so the (async) host->device
        # transfer overlaps the previous step's compute
        self.put_fn = None
        # optional DeviceDatasetCache: batches are gathered on device from
        # staged sample banks (per-step wire traffic = one index vector)
        self.device_cache = None

    def __len__(self) -> int:
        if self.sampler is not None:
            return len(self.sampler)
        per_task = {}
        for i in self.indices:
            tid = self.dataset.dataframe.iloc[i]["task_id"]
            per_task[tid] = per_task.get(tid, 0) + 1
        total = 0
        for n in per_task.values():
            total += n // self.batch_size if self.drop_last else -(-n // self.batch_size)
        return total

    # -- batch index streams -------------------------------------------------
    def _train_batches(self) -> Iterator[List[int]]:
        assert self.sampler is not None
        for positions in self.sampler:
            yield [self.indices[p] for p in positions]

    def _eval_batches(self) -> Iterator[List[int]]:
        """Sequential batches grouped per task (keeps batches single-task)."""
        by_task: Dict[str, List[int]] = {}
        for i in self.indices:
            tid = self.dataset.dataframe.iloc[i]["task_id"]
            by_task.setdefault(tid, []).append(i)
        for tid in sorted(by_task):
            rows = by_task[tid]
            for s in range(0, len(rows), self.batch_size):
                chunk = rows[s : s + self.batch_size]
                if self.drop_last and len(chunk) < self.batch_size:
                    continue
                yield chunk

    def _load_batch(self, rows: List[int]) -> Dict:
        n_valid = len(rows)
        if not self.drop_last and n_valid < self.batch_size:
            # pad the final eval chunk to the fixed batch size (repeat the
            # last row); keeps every batch the same shape so the 4 jitted
            # eval steps never recompile on residual sizes
            rows = rows + [rows[-1]] * (self.batch_size - n_valid)
        if self.device_cache is not None and self.device_cache.covers(rows):
            return self.device_cache.get_batch(rows, n_valid=n_valid)
        samples = list(self._pool.map(self.dataset.__getitem__, rows))
        return _collate(samples, self.registry, n_valid=n_valid)

    def __iter__(self) -> Iterator[Dict]:
        stream = (self._train_batches() if self.sampler is not None
                  else self._eval_batches())
        put = self.put_fn or (lambda b: b)
        if self.prefetch_depth == 0:
            for rows in stream:
                yield put(self._load_batch(rows))
            return

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch_depth)
        _SENTINEL = object()

        def producer():
            try:
                for rows in stream:
                    q.put(put(self._load_batch(rows)))
            finally:
                q.put(_SENTINEL)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is _SENTINEL:
                break
            yield item
        t.join()


def build_data_engines(config, registry: Optional[TaskRegistry] = None,
                       mesh=None
                       ) -> Tuple[DataEngine, DataEngine, TaskRegistry]:
    """Build train/val engines from config (reference build_dataloaders,
    train.py:31-173, incl. the single-task filter and dataset-derived task
    override).

    ``mesh``: the Trainer's device mesh, when one is configured — the
    device cache stages its banks sharded over the mesh's ``data`` axis so
    gathered batches are already batch-sharded (no per-step reshard, and
    mesh-sharded eval steps see compatible device sets; ADVICE r4)."""
    dataset = MultiTaskDataset(
        config.data_root, image_size=config.image_size,
        force_grayscale=bool(config.get("data.force_grayscale", False)),
        use_adaptive_norm=bool(config.get("data.use_adaptive_norm", False)),
        bg_threshold=config.get("data.bg_threshold", "auto"),
        cache_samples=bool(config.get("data.cache_samples", False)),
    )

    task_configs = dataset.derive_task_configs()

    # optional single-task filter (reference train.py:76-105)
    st = config.get("training.single_task", {}) or {}
    if st.get("enabled", False):
        tid, tname = st.get("task_id"), st.get("task_name")
        if tid and tname:
            raise ValueError(
                "Set only one of training.single_task.task_id or task_name")
        if not tid and not tname:
            raise ValueError(
                "single_task.task_id or task_name required in single-task mode")
        df = dataset.dataframe
        if tid:
            known = {c["task_id"] for c in task_configs}
            if tid not in known:
                raise ValueError(
                    f"Unknown task_id {tid!r}. Available: {sorted(known)}")
            dataset.dataframe = df[df["task_id"] == tid].reset_index(drop=True)
        else:
            match = df["task_name"].str.lower() == str(tname).lower()
            if not match.any():
                names = sorted(df["task_name"].unique())
                raise ValueError(
                    f"Unknown task_name {tname!r}. Available: {names}")
            dataset.dataframe = df[match].reset_index(drop=True)
        task_configs = dataset.derive_task_configs()

    config.set_task_configs_from_dataset(task_configs)
    if registry is None:
        registry = TaskRegistry(task_configs)

    # console format mirrors reference train.py:108-112
    print("Using dataset-derived task configurations for model/task-prompt "
          "(config tasks are overwritten at runtime).")
    print(f"Detected {len(task_configs)} tasks:")
    for tc in task_configs:
        print(f"  - {tc['task_id']}: {tc['task_name']}, "
              f"num_classes={tc['num_classes']}")

    train_idx, val_idx = split_train_val(
        dataset.dataframe, config.val_split, config.seed)

    # split report mirrors reference train.py:134-137
    n = len(dataset.dataframe)
    print(f"\n✓ Dataset split (seed={config.seed}):")
    print(f"  - Total samples: {n}")
    print(f"  - Train samples: {len(train_idx)} "
          f"({100 * (len(train_idx) / n):.1f}%)")
    print(f"  - Val samples: {len(val_idx)} "
          f"({100 * (len(val_idx) / n):.1f}%)")

    sampler = MultiTaskUniformSampler(
        task_ids_per_index=[
            dataset.dataframe.iloc[i]["task_id"] for i in train_idx
        ],
        batch_size=config.batch_size,
        steps_per_epoch=config.get("training.steps_per_epoch"),
        seed=config.seed,
    )
    train_engine = DataEngine(
        dataset, train_idx, registry, config.batch_size,
        shuffle_sampler=sampler, num_workers=config.num_workers,
    )
    val_engine = DataEngine(
        dataset, val_idx, registry, config.batch_size,
        shuffle_sampler=None, num_workers=config.num_workers,
        drop_last=False,
    )
    # data.device_cache: stage the decoded dataset to HBM once and gather
    # batches on device (see data/device_cache.py). Train and val share one
    # bank; tasks over the budget keep streaming (partial staging), and a
    # configured mesh shards the banks over its data axis.
    if bool(config.get("data.device_cache", False)):
        budget = int(config.get("data.device_cache_budget_mb", 4096))
        cache = build_device_cache(dataset, list(train_idx) + list(val_idx),
                                   registry, budget * (1 << 20), mesh=mesh,
                                   workers=config.num_workers)
        if cache is not None:
            train_engine.device_cache = cache
            val_engine.device_cache = cache
            note = (f" ({len(cache.skipped_tasks)} task(s) stream)"
                    if cache.skipped_tasks else "")
            print(f"[data] device dataset cache: {cache.nbytes / 1e6:.0f} MB"
                  f" staged to device memory{note}")
    return train_engine, val_engine, registry
