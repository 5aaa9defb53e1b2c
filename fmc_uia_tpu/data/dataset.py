"""Multi-task dataset: CSV index + host-side decode/resize.

Same on-disk contract as the reference (reference data/dataset.py:14-137):
``<root>/csv_files/*.csv`` concatenated into one index; per row
``image_path`` (relative to the csv_files dir), ``task_id``, ``task_name``,
``num_classes`` and task-specific label columns — ``mask_path`` (seg),
``mask`` int (cls), ``point_{i}_xy`` JSON (Regression), ``x_min..y_max``
(det).

TPU-first split of the reference's albumentations pipeline: the host only
decodes and geometrically resizes to the static training resolution so every
sample has a fixed shape (image bilinear / mask nearest, boxes scaled + clip,
regression points normalized by ORIGINAL size exactly like the reference,
dataset.py:127-133). Photometric augmentation + normalization run batched on
device (ops/image.py).

Returns numpy uint8 images HWC + typed labels; batching happens in
pipeline.py.
"""

from __future__ import annotations

import glob
import json
import os
from typing import Dict, Optional

import numpy as np
import pandas as pd

try:  # cv2 is present in this image; PIL is the fallback decode path
    import cv2

    _HAS_CV2 = True
except Exception:  # pragma: no cover
    from PIL import Image

    _HAS_CV2 = False


def _decode_image(path: str) -> Optional[np.ndarray]:
    """Decode an image file to RGB uint8 HWC, None on failure."""
    try:
        if _HAS_CV2:
            stream = np.fromfile(path, dtype=np.uint8)
            img = cv2.imdecode(stream, cv2.IMREAD_COLOR)
            if img is None:
                return None
            return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        with Image.open(path) as im:  # pragma: no cover
            return np.asarray(im.convert("RGB"))
    except Exception:
        return None


def _decode_mask(path: str) -> Optional[np.ndarray]:
    try:
        if _HAS_CV2:
            stream = np.fromfile(path, dtype=np.uint8)
            return cv2.imdecode(stream, cv2.IMREAD_GRAYSCALE)
        with Image.open(path) as im:  # pragma: no cover
            return np.asarray(im.convert("L"))
    except Exception:
        return None


def _native_lib():
    try:
        from fmc_uia_tpu import native

        return native if native.available() else None
    except Exception:  # pragma: no cover
        return None


def _resize_image(img: np.ndarray, size: int) -> np.ndarray:
    if img.shape[0] == size and img.shape[1] == size:
        return img
    if _HAS_CV2 and img.dtype == np.uint8:
        return cv2.resize(img, (size, size), interpolation=cv2.INTER_LINEAR)
    if _HAS_CV2:
        return cv2.resize(img, (size, size), interpolation=cv2.INTER_LINEAR)
    nat = _native_lib()  # pragma: no cover - cv2 present in this image
    if nat is not None and img.dtype == np.uint8:
        return nat.resize_bilinear(img, size, size)
    from PIL import Image  # pragma: no cover

    return np.asarray(Image.fromarray(img).resize((size, size),
                                                  Image.BILINEAR))


def _resize_mask(mask: np.ndarray, size: int) -> np.ndarray:
    if mask.shape[0] == size and mask.shape[1] == size:
        return mask
    if _HAS_CV2:
        return cv2.resize(mask, (size, size), interpolation=cv2.INTER_NEAREST)
    nat = _native_lib()  # pragma: no cover
    if nat is not None and mask.dtype == np.uint8:
        return nat.resize_nearest(mask, size, size)
    from PIL import Image  # pragma: no cover

    return np.asarray(Image.fromarray(mask).resize((size, size),
                                                   Image.NEAREST))


INVALID_BOX = np.array([-1.0, -1.0, -1.0, -1.0], dtype=np.float32)


def to_grayscale_3ch(image: np.ndarray) -> np.ndarray:
    """Luminance conversion + 3-channel replication.

    Unifies B-mode and colormap-rendered ultrasound frames (the reference's
    experimental loader does this unconditionally,
    new_dataloader.py:189-196)."""
    if image.ndim == 3 and image.shape[2] == 3:
        if _HAS_CV2:
            gray = cv2.cvtColor(image, cv2.COLOR_RGB2GRAY)
        else:  # pragma: no cover
            gray = np.dot(image[..., :3],
                          [0.299, 0.587, 0.114]).astype(image.dtype)
    else:
        gray = image
    return np.stack([gray] * 3, axis=-1)


def detect_valid_mask(image: np.ndarray, bg_threshold="auto") -> np.ndarray:
    """Valid-region (non-background) detection for ultrasound frames.

    Same strategy as reference new_dataloader.py:71-122: threshold (fixed /
    Otsu-derived / gaussian-adaptive) + morphological close/open cleanup,
    with a >=10%-coverage safety fallback.
    """
    gray = image[:, :, 0]
    if gray.dtype != np.uint8:
        gray = (np.clip(gray, 0, 1) * 255).astype(np.uint8)

    mask = None
    if bg_threshold == "auto":
        if _HAS_CV2:
            rough = gray > 5
            if rough.sum() > 0:
                otsu_thresh, _ = cv2.threshold(
                    gray, 0, 255, cv2.THRESH_BINARY + cv2.THRESH_OTSU)
                threshold_val = max(otsu_thresh * 0.5, 10)
            else:
                threshold_val = 10
        else:  # pragma: no cover - histogram Otsu fallback
            hist, _ = np.histogram(gray, bins=256, range=(0, 256))
            total = hist.sum()
            best_t, best_var = 10, -1.0
            cum, cum_mean = 0.0, 0.0
            global_mean = (np.arange(256) * hist).sum() / max(total, 1)
            for t in range(256):
                cum += hist[t]
                cum_mean += t * hist[t]
                if cum == 0 or cum == total:
                    continue
                w0 = cum / total
                m0 = cum_mean / cum
                m1 = (global_mean * total - cum_mean) / (total - cum)
                var = w0 * (1 - w0) * (m0 - m1) ** 2
                if var > best_var:
                    best_var, best_t = var, t
            threshold_val = max(best_t * 0.5, 10)
        mask = gray > threshold_val
    elif bg_threshold == "adaptive":
        if _HAS_CV2:
            mask = cv2.adaptiveThreshold(
                gray, 255, cv2.ADAPTIVE_THRESH_GAUSSIAN_C,
                cv2.THRESH_BINARY, 51, -10) > 0
        else:  # pragma: no cover
            mask = gray > max(10, gray.mean())
    else:
        mask = gray > float(bg_threshold)

    if _HAS_CV2:
        kernel = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (5, 5))
        m = cv2.morphologyEx(mask.astype(np.uint8), cv2.MORPH_CLOSE, kernel)
        m = cv2.morphologyEx(m, cv2.MORPH_OPEN, kernel)
        mask = m.astype(bool)

    if mask.sum() < mask.size * 0.1:
        mask = gray > 5
    return mask.astype(bool)


def adaptive_normalize(image: np.ndarray, bg_threshold="auto") -> np.ndarray:
    """Per-image standardization on the valid region only; background
    stays 0 (reference new_dataloader.py:124-160)."""
    valid = detect_valid_mask(image, bg_threshold)
    out = image.astype(np.float32) / 255.0
    if valid.sum() > 0:
        for c in range(out.shape[2]):
            pixels = out[:, :, c][valid]
            mean = pixels.mean()
            std = pixels.std()
            if std < 1e-6:
                std = 1.0
            out[:, :, c][valid] = (pixels - mean) / std
    return out


class MultiTaskDataset:
    """Index of all task CSVs with per-item load/resize.

    Args:
      data_root: directory containing ``csv_files/``.
      image_size: static square resolution all samples are resized to.
      max_reg_points: pad regression labels to this many points (per-type
        head-bank padding); defaults to the max seen in the index.
    """

    def __init__(self, data_root: str, image_size: int = 224,
                 max_reg_points: Optional[int] = None,
                 force_grayscale: bool = False,
                 use_adaptive_norm: bool = False,
                 bg_threshold="auto",
                 cache_samples: bool = False):
        self.data_root = data_root
        self.image_size = int(image_size)
        self.force_grayscale = bool(force_grayscale)
        self.use_adaptive_norm = bool(use_adaptive_norm)
        self.bg_threshold = bg_threshold
        # opt-in RAM cache of decoded+resized samples (config
        # data.cache_samples). All geometry is deterministic per index
        # (photometric augmentation runs on DEVICE, ops/image.py), so the
        # post-resize sample is a pure function of the row — caching it
        # removes the per-epoch decode/resize cost for datasets that fit
        # in host RAM. The reference re-decodes every epoch.
        self.cache_samples = bool(cache_samples)
        self._sample_cache: Dict[int, Dict] = {}
        self.csv_path = os.path.join(data_root, "csv_files")
        if not os.path.isdir(self.csv_path):
            raise FileNotFoundError(f"CSV path not found: {self.csv_path}")
        csv_files = sorted(glob.glob(os.path.join(self.csv_path, "*.csv")))
        if not csv_files:
            raise FileNotFoundError(f"No CSV files found in {self.csv_path}")
        frames = [pd.read_csv(f) for f in csv_files]
        self.dataframe = pd.concat(frames, ignore_index=True).reset_index(
            drop=True)

        reg_rows = self.dataframe[self.dataframe["task_name"] == "Regression"]
        if max_reg_points is not None:
            self.max_reg_points = int(max_reg_points)
        elif len(reg_rows):
            self.max_reg_points = int(reg_rows["num_classes"].max())
        else:
            self.max_reg_points = 0

    def __len__(self) -> int:
        return len(self.dataframe)

    def derive_task_configs(self):
        """First-seen-order task configs from the index
        (reference train.py:61-73)."""
        configs, seen = [], set()
        for _, row in self.dataframe.iterrows():
            tid = row["task_id"]
            if tid in seen:
                continue
            seen.add(tid)
            configs.append({
                "task_id": tid,
                "task_name": row["task_name"],
                "num_classes": int(row["num_classes"]),
            })
        return configs

    def __getitem__(self, idx: int) -> Dict:
        if self.cache_samples:
            hit = self._sample_cache.get(idx)
            if hit is not None:
                return hit
        out = self._load_item(idx)
        if self.cache_samples:
            self._sample_cache[idx] = out
        return out

    def _load_item(self, idx: int) -> Dict:
        record = self.dataframe.iloc[idx]
        task_id = record["task_id"]
        task_name = record["task_name"]
        S = self.image_size

        image_path = os.path.normpath(
            os.path.join(self.csv_path, record["image_path"]))
        image = _decode_image(image_path)
        if image is None:
            # skip-corrupt-image retry (reference dataset.py:49-52)
            return self[(idx + 1) % len(self)]
        if self.force_grayscale or self.use_adaptive_norm:
            image = to_grayscale_3ch(image)
        if self.use_adaptive_norm:
            image = adaptive_normalize(image, self.bg_threshold)
        orig_h, orig_w = image.shape[:2]
        image = _resize_image(image, S)

        if task_name == "segmentation":
            mask = None
            if pd.notna(record.get("mask_path")):
                mask_path = os.path.normpath(
                    os.path.join(self.csv_path, record["mask_path"]))
                mask = _decode_mask(mask_path)
            if mask is None:
                label = np.zeros((S, S), np.int32)
            else:
                label = _resize_mask(mask, S).astype(np.int32)

        elif task_name == "classification":
            # class id lives in the 'mask' column (reference dataset.py:74);
            # absent at inference time -> -1 sentinel
            raw = record.get("mask") if hasattr(record, "get") else None
            label = np.int32(raw) if raw is not None and pd.notna(raw) else np.int32(-1)

        elif task_name == "Regression":
            num_points = int(record["num_classes"])
            coords = []
            for i in range(1, num_points + 1):
                col = f"point_{i}_xy"
                if col in record and pd.notna(record[col]):
                    coords.extend(json.loads(record[col]))
                else:
                    coords.extend([0, 0])
            pts = np.asarray(coords, np.float32)
            # normalize by ORIGINAL size (reference dataset.py:131-133)
            pts[0::2] /= orig_w
            pts[1::2] /= orig_h
            label = np.zeros((self.max_reg_points * 2,), np.float32)
            label[: pts.shape[0]] = pts

        elif task_name == "detection":
            cols = ["x_min", "y_min", "x_max", "y_max"]
            if all(c in record and pd.notna(record[c]) for c in cols):
                box = np.asarray([float(record[c]) for c in cols], np.float32)
                # scale to resized frame, clip (albumentations pascal_voc
                # clip=True under pure Resize), then normalize by the
                # transformed size (reference dataset.py:127-130)
                box[[0, 2]] *= S / orig_w
                box[[1, 3]] *= S / orig_h
                box = np.clip(box, 0.0, S)
                if box[2] <= box[0] or box[3] <= box[1]:
                    label = INVALID_BOX.copy()
                else:
                    label = box / S
            else:
                label = INVALID_BOX.copy()
        else:
            raise ValueError(f"Unknown task_name: {task_name}")

        # source_index: which dataframe row this sample's bytes actually came
        # from. Normally == the requested idx, but the corrupt-image retry
        # above returns a NEIGHBOR's sample — consumers that freeze samples
        # (DeviceDatasetCache) use the stamp to make the substitution
        # visible instead of silently caching the wrong row (ADVICE r4).
        return {"image": image, "label": label, "task_id": task_id,
                "source_index": idx}
