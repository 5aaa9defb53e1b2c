"""Inference + challenge-format export.

The reference README's table of contents promises an "Inference & Docker"
section that does not exist in the repo (reference README.md:16; SURVEY.md
§0) — inference is only implied by the eval decode logic. This module makes
it real, producing the FMC_UIA challenge output contract (BASELINE.json):

  segmentation  -> class-id mask PNG at the ORIGINAL image resolution
  classification-> predicted class id (JSON)
  detection     -> pixel-space corner box (JSON)
  Regression    -> pixel-space keypoint list (JSON)

Per-task JSON files land in ``<out_dir>/<task_id>.json``; masks in
``<out_dir>/masks/``. Decode paths are shared with metrics.py (CenterNet
peak decode / grid argmax / masked class argmax).
"""

from __future__ import annotations

import json
import os
from collections import defaultdict
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from fmc_uia_tpu.data.dataset import (
    MultiTaskDataset,
    _decode_image,
    _resize_image,
)
from fmc_uia_tpu.metrics import masked_argmax
from fmc_uia_tpu.ops.centernet import decode_centernet, decode_grid_detection
from fmc_uia_tpu.ops.image import normalize_images
from fmc_uia_tpu.tasks import (
    CLASSIFICATION,
    DETECTION,
    REGRESSION,
    SEGMENTATION,
    TaskRegistry,
)

try:
    import cv2

    _HAS_CV2 = True
except Exception:  # pragma: no cover
    from PIL import Image

    _HAS_CV2 = False


def _write_mask_png(path: str, mask: np.ndarray) -> None:
    if _HAS_CV2:
        cv2.imwrite(path, mask.astype(np.uint8))
    else:  # pragma: no cover
        Image.fromarray(mask.astype(np.uint8)).save(path)


def _resize_mask_to(mask: np.ndarray, h: int, w: int) -> np.ndarray:
    if mask.shape[:2] == (h, w):
        return mask
    if _HAS_CV2:
        return cv2.resize(mask.astype(np.uint8), (w, h),
                          interpolation=cv2.INTER_NEAREST)
    return np.asarray(  # pragma: no cover
        Image.fromarray(mask.astype(np.uint8)).resize((w, h), Image.NEAREST))


class Predictor:
    """Batched jitted inference over the 4 task types."""

    def __init__(self, model, params, registry: TaskRegistry, mean, std,
                 image_size: int):
        self.model = model
        self.params = params
        self.registry = registry
        self.image_size = image_size
        nc_table = jnp.asarray(registry.num_classes_table)

        def prep(images):
            return normalize_images(images, mean, std, dtype=jnp.float32)

        @jax.jit
        def seg_fn(params, images, task_index):
            out = model.apply({"params": params}, prep(images), SEGMENTATION,
                              task_index, train=False)
            if isinstance(out, tuple):
                out = out[0]
            ncls = jnp.take(nc_table, task_index)
            return masked_argmax(out, ncls)

        @jax.jit
        def cls_fn(params, images, task_index):
            out = model.apply({"params": params}, prep(images),
                              CLASSIFICATION, task_index, train=False)
            ncls = jnp.take(nc_table, task_index)
            return masked_argmax(out, ncls)

        @jax.jit
        def det_fn(params, images, task_index):
            out = model.apply({"params": params}, prep(images), DETECTION,
                              task_index, train=False)
            if isinstance(out, dict):
                return decode_centernet(
                    out["heatmap"].astype(jnp.float32),
                    out["size"].astype(jnp.float32),
                    out["offset"].astype(jnp.float32))
            return decode_grid_detection(out.astype(jnp.float32))

        @jax.jit
        def reg_fn(params, images, task_index):
            return model.apply({"params": params}, prep(images), REGRESSION,
                               task_index, train=False)

        self.fns = {SEGMENTATION: seg_fn, CLASSIFICATION: cls_fn,
                    DETECTION: det_fn, REGRESSION: reg_fn}

    def predict_images(self, images_u8: np.ndarray, task_id: str):
        """images_u8: [B, S, S, 3] resized uint8 batch -> per-type output."""
        return np.asarray(self.predict_device(images_u8, task_id))

    def predict_device(self, images_u8: np.ndarray, task_id: str):
        """Like predict_images but returns the (possibly still in-flight)
        device array without a host sync — callers that overlap dispatch
        with readback (serving.py) block on np.asarray themselves."""
        spec = self.registry[task_id]
        fn = self.fns[spec.task_name]
        return fn(self.params, jnp.asarray(images_u8),
                  jnp.int32(spec.global_index))


def export_predictions(model, params, data_root: str, out_dir: str,
                       registry: TaskRegistry, mean, std, image_size: int,
                       batch_size: int = 16) -> Dict[str, str]:
    """Run inference over a challenge-layout dataset and write outputs.

    Returns {task_id: output_path}.
    """
    dataset = MultiTaskDataset(data_root, image_size=image_size)
    predictor = Predictor(model, params, registry, mean, std, image_size)
    os.makedirs(out_dir, exist_ok=True)
    mask_dir = os.path.join(out_dir, "masks")
    os.makedirs(mask_dir, exist_ok=True)

    by_task: Dict[str, List[int]] = defaultdict(list)
    for i, row in dataset.dataframe.iterrows():
        by_task[row["task_id"]].append(i)

    outputs: Dict[str, str] = {}
    for task_id, rows in sorted(by_task.items()):
        if task_id not in registry:
            continue
        spec = registry[task_id]
        records = []
        for s in range(0, len(rows), batch_size):
            chunk = rows[s : s + batch_size]
            images, orig_sizes, names = [], [], []
            for ridx in chunk:
                row = dataset.dataframe.iloc[ridx]
                path = os.path.normpath(os.path.join(
                    dataset.csv_path, row["image_path"]))
                img = _decode_image(path)
                if img is None:
                    continue
                orig_sizes.append(img.shape[:2])
                images.append(_resize_image(img, image_size))
                names.append(os.path.basename(str(row["image_path"])))
            if not images:
                continue
            n_real = len(images)
            if n_real < batch_size:
                # pad to the fixed batch size (repeat the last image) so the
                # jitted predict fns never recompile on residual chunks
                images = images + [images[-1]] * (batch_size - n_real)
            batch = np.stack(images)
            preds = predictor.predict_images(batch, task_id)[:n_real]

            for j, name in enumerate(names):
                oh, ow = orig_sizes[j]
                if spec.task_name == SEGMENTATION:
                    mask = _resize_mask_to(preds[j], oh, ow)
                    mask_name = os.path.splitext(name)[0] + "_mask.png"
                    _write_mask_png(os.path.join(mask_dir, mask_name), mask)
                    records.append({"image": name, "mask": mask_name})
                elif spec.task_name == CLASSIFICATION:
                    records.append({"image": name,
                                    "class": int(preds[j])})
                elif spec.task_name == DETECTION:
                    box = preds[j]
                    records.append({
                        "image": name,
                        "x_min": float(box[0] * ow),
                        "y_min": float(box[1] * oh),
                        "x_max": float(box[2] * ow),
                        "y_max": float(box[3] * oh),
                    })
                else:  # Regression
                    pts = preds[j][: spec.num_classes * 2]
                    coords = [
                        [float(pts[2 * k] * ow), float(pts[2 * k + 1] * oh)]
                        for k in range(spec.num_classes)
                    ]
                    records.append({"image": name, "points": coords})

        out_path = os.path.join(out_dir, f"{task_id}.json")
        with open(out_path, "w") as f:
            json.dump(records, f, indent=1)
        outputs[task_id] = out_path
    return outputs
