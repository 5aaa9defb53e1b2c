"""Synthetic dataset generator.

Writes a miniature on-disk dataset in the exact CSV/image layout the real
FMC_UIA challenge data uses (and the reference expects, reference
dataset.py:24-92): ``<root>/csv_files/<task>.csv`` + relative image/mask
paths, covering all 4 task types. Used by the test suite and the benchmark
harness — the reference repo ships no fixtures at all (SURVEY.md §4).

Images are procedurally generated ultrasound-ish blobs: a bright ellipse on
speckle noise, so segmentation/detection/regression targets are geometrically
consistent with the image content (a model can actually learn on it).
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence

import numpy as np
import pandas as pd

try:
    import cv2

    _HAS_CV2 = True
except Exception:  # pragma: no cover
    from PIL import Image

    _HAS_CV2 = False


def _write_png(path: str, array: np.ndarray) -> None:
    if _HAS_CV2:
        if array.ndim == 3:
            array = cv2.cvtColor(array, cv2.COLOR_RGB2BGR)
        cv2.imwrite(path, array)
    else:  # pragma: no cover
        Image.fromarray(array).save(path)


def _speckle_image(rng: np.random.RandomState, h: int, w: int) -> np.ndarray:
    base = rng.gamma(2.0, 30.0, (h, w)).clip(0, 255)
    return base.astype(np.uint8)


def _ellipse_params(rng: np.random.RandomState, h: int, w: int):
    cy = rng.uniform(0.3, 0.7) * h
    cx = rng.uniform(0.3, 0.7) * w
    ry = rng.uniform(0.1, 0.25) * h
    rx = rng.uniform(0.1, 0.25) * w
    return cy, cx, ry, rx


def _ellipse_mask(h, w, cy, cx, ry, rx) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    return (((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 <= 1.0)


DEFAULT_TASKS = [
    {"task_id": "T2A_syn_organ", "task_name": "segmentation", "num_classes": 2},
    {"task_id": "T2B_syn_lesion", "task_name": "segmentation", "num_classes": 2},
    {"task_id": "T1_syn_planes", "task_name": "classification", "num_classes": 3},
    {"task_id": "T3_syn_nodule", "task_name": "classification", "num_classes": 2},
    {"task_id": "T4_syn_box", "task_name": "detection", "num_classes": 1},
    {"task_id": "T5_syn_points", "task_name": "Regression", "num_classes": 4},
]


def generate_synthetic_dataset(
    root: str,
    tasks: Optional[Sequence[Dict]] = None,
    samples_per_task: int = 16,
    image_hw: tuple = (96, 112),  # non-square: exercises resize paths
    seed: int = 0,
) -> List[Dict]:
    """Create the dataset under ``root``; returns the task configs."""
    tasks = list(tasks if tasks is not None else DEFAULT_TASKS)
    rng = np.random.RandomState(seed)
    csv_dir = os.path.join(root, "csv_files")
    img_dir = os.path.join(root, "images")
    os.makedirs(csv_dir, exist_ok=True)
    os.makedirs(img_dir, exist_ok=True)
    h, w = image_hw

    for task in tasks:
        rows = []
        tid, tname, ncls = (task["task_id"], task["task_name"],
                            task["num_classes"])
        for i in range(samples_per_task):
            img = _speckle_image(rng, h, w)
            cy, cx, ry, rx = _ellipse_params(rng, h, w)
            blob = _ellipse_mask(h, w, cy, cx, ry, rx)
            cls_label = int(rng.randint(0, ncls)) if tname == "classification" else 0
            brightness = 80 + 40 * cls_label
            img = img.astype(np.int32)
            img[blob] = np.clip(img[blob] + brightness, 0, 255)
            img = np.stack([img] * 3, axis=-1).astype(np.uint8)

            img_name = f"{tid}_{i:04d}.png"
            _write_png(os.path.join(img_dir, img_name), img)
            row = {
                "image_path": os.path.join("..", "images", img_name),
                "task_id": tid,
                "task_name": tname,
                "num_classes": ncls,
            }

            if tname == "segmentation":
                mask_name = f"{tid}_{i:04d}_mask.png"
                _write_png(os.path.join(img_dir, mask_name),
                           blob.astype(np.uint8))
                row["mask_path"] = os.path.join("..", "images", mask_name)
            elif tname == "classification":
                row["mask"] = cls_label
            elif tname == "detection":
                ys, xs = np.where(blob)
                row.update({
                    "x_min": float(xs.min()), "y_min": float(ys.min()),
                    "x_max": float(xs.max() + 1), "y_max": float(ys.max() + 1),
                })
            elif tname == "Regression":
                pts = [
                    (cx, cy - ry), (cx + rx, cy), (cx, cy + ry), (cx - rx, cy)
                ][:ncls]
                for j, (px, py) in enumerate(pts, start=1):
                    row[f"point_{j}_xy"] = json.dumps(
                        [round(float(px), 2), round(float(py), 2)])
            rows.append(row)
        pd.DataFrame(rows).to_csv(
            os.path.join(csv_dir, f"{tid}.csv"), index=False)
    return tasks
