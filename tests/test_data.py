"""Data engine tests: dataset contract, sampler semantics, pipeline."""

import random

import numpy as np
import pytest

from fmc_uia_tpu.config import Config
from fmc_uia_tpu.data.dataset import MultiTaskDataset
from fmc_uia_tpu.data.pipeline import (
    DataEngine,
    build_data_engines,
    split_train_val,
)
from fmc_uia_tpu.data.sampler import MultiTaskUniformSampler
from fmc_uia_tpu.data.synthetic import generate_synthetic_dataset
from fmc_uia_tpu.tasks import TaskRegistry
from tests.helpers import TINY_CONFIG
import copy

S = 64


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth")
    generate_synthetic_dataset(str(root), samples_per_task=12, seed=0)
    return str(root)


@pytest.fixture(scope="module")
def dataset(synth_root):
    return MultiTaskDataset(synth_root, image_size=S)


def test_dataset_index(dataset):
    assert len(dataset) == 6 * 12
    configs = dataset.derive_task_configs()
    assert len(configs) == 6
    names = {c["task_name"] for c in configs}
    assert names == {"segmentation", "classification", "detection",
                     "Regression"}


def test_segmentation_item(dataset):
    df = dataset.dataframe
    idx = df.index[df["task_name"] == "segmentation"][0]
    item = dataset[idx]
    assert item["image"].shape == (S, S, 3)
    assert item["image"].dtype == np.uint8
    assert item["label"].shape == (S, S)
    assert set(np.unique(item["label"])).issubset({0, 1})
    assert item["label"].sum() > 0  # ellipse present


def test_classification_item(dataset):
    df = dataset.dataframe
    idx = df.index[df["task_name"] == "classification"][0]
    item = dataset[idx]
    assert item["label"].dtype == np.int32
    assert 0 <= int(item["label"]) < 3


def test_detection_item_normalized(dataset):
    df = dataset.dataframe
    idx = df.index[df["task_name"] == "detection"][0]
    item = dataset[idx]
    box = item["label"]
    assert box.shape == (4,)
    assert np.all(box >= 0) and np.all(box <= 1)
    assert box[2] > box[0] and box[3] > box[1]
    # box must bound the bright ellipse region in the resized image
    gray = item["image"][:, :, 0].astype(np.float32)
    ys, xs = np.where(gray > gray.mean() + gray.std())
    if len(xs) > 10:
        cx, cy = xs.mean() / S, ys.mean() / S
        assert box[0] - 0.1 <= cx <= box[2] + 0.1
        assert box[1] - 0.1 <= cy <= box[3] + 0.1


def test_regression_item_normalized_by_original(dataset):
    df = dataset.dataframe
    idx = df.index[df["task_name"] == "Regression"][0]
    item = dataset[idx]
    pts = item["label"]
    assert pts.shape == (8,)  # 4 points padded-to-max * 2
    assert np.all(pts >= 0) and np.all(pts <= 1)


def test_sampler_uniform_and_wraparound():
    task_ids = ["a"] * 10 + ["b"] * 3  # b forces wraparound with bs=2
    sampler = MultiTaskUniformSampler(task_ids, batch_size=2,
                                      steps_per_epoch=50, seed=0)
    batches = list(sampler)
    assert len(batches) == 50
    for batch in batches:
        kinds = {task_ids[i] for i in batch}
        assert len(kinds) == 1  # single-task invariant
        assert len(batch) == 2


def test_sampler_advance_epochs_matches_unbroken_run():
    """Resume fast-forward: advance_epochs(n) + one epoch == the unbroken
    run's epoch n (exact-order resume, fit.py resume block)."""
    task_ids = ["a"] * 10 + ["b"] * 3
    unbroken = MultiTaskUniformSampler(task_ids, batch_size=2,
                                       steps_per_epoch=9, seed=7)
    epochs = [list(unbroken) for _ in range(3)]
    assert epochs[0] != epochs[2]  # RNG state really advances across epochs

    resumed = MultiTaskUniformSampler(task_ids, batch_size=2,
                                      steps_per_epoch=9, seed=7)
    resumed.advance_epochs(2)
    assert list(resumed) == epochs[2]


def test_sampler_matches_reference_semantics():
    """Oracle: direct transliteration of the documented wraparound algorithm
    using the same seeded random.Random call sequence."""
    task_ids = ["a"] * 7 + ["b"] * 5 + ["c"] * 4
    seed, bs, steps = 123, 3, 30

    # oracle
    rng = random.Random(seed)
    by_task = {}
    for i, t in enumerate(task_ids):
        by_task.setdefault(t, []).append(i)
    keys = list(by_task.keys())
    for t in keys:
        rng.shuffle(by_task[t])
    cursors = {t: 0 for t in keys}
    expected = []
    for _ in range(steps):
        t = rng.choice(keys)
        idxs = by_task[t]
        s = cursors[t]
        e = s + bs
        if e > len(idxs):
            b = idxs[s:]
            rng.shuffle(idxs)
            rem = bs - len(b)
            b = b + idxs[:rem]
            cursors[t] = rem
        else:
            b = idxs[s:e]
            cursors[t] = e
        expected.append(b)

    sampler = MultiTaskUniformSampler(task_ids, batch_size=bs,
                                      steps_per_epoch=steps, seed=seed)
    assert list(sampler) == expected


def test_split_stratified_and_seeded(dataset):
    tr1, va1 = split_train_val(dataset.dataframe, 0.25, seed=42)
    tr2, va2 = split_train_val(dataset.dataframe, 0.25, seed=42)
    assert tr1 == tr2 and va1 == va2
    assert len(set(tr1) & set(va1)) == 0
    assert len(tr1) + len(va1) == len(dataset)
    # stratification: each task contributes ~25% to val
    df = dataset.dataframe
    for tid, group in df.groupby("task_id"):
        n_val = sum(1 for i in va1 if df.iloc[i]["task_id"] == tid)
        assert n_val == int(len(group) * 0.25)


def test_engine_end_to_end(synth_root):
    cfg_dict = copy.deepcopy(TINY_CONFIG)
    cfg_dict["data"]["root_path"] = synth_root
    cfg_dict["data"]["batch_size"] = 4
    cfg_dict["data"]["image_size"] = S
    cfg_dict["training"]["steps_per_epoch"] = 6
    cfg = Config(config_dict=cfg_dict)

    train_engine, val_engine, registry = build_data_engines(cfg)
    assert len(registry) == 6
    assert cfg.tasks_from_dataset()

    batches = list(train_engine)
    assert len(batches) == 6
    for b in batches:
        assert b["image"].shape == (4, S, S, 3)
        assert b["task_type"] == registry[b["task_id"]].task_name
        if b["task_type"] == "segmentation":
            assert b["label"].shape == (4, S, S)
        elif b["task_type"] == "classification":
            assert b["label"].shape == (4,)
        elif b["task_type"] == "detection":
            assert b["label"].shape == (4, 4)
        else:
            assert b["label"].shape == (4, 8)

    val_batches = list(val_engine)
    assert len(val_batches) > 0
    for b in val_batches:
        assert len({b["task_id"]}) == 1


def test_single_task_filter(synth_root):
    cfg_dict = copy.deepcopy(TINY_CONFIG)
    cfg_dict["data"]["root_path"] = synth_root
    cfg_dict["data"]["image_size"] = S
    cfg_dict["training"]["single_task"] = {
        "enabled": True, "task_id": "T4_syn_box", "task_name": "",
    }
    cfg = Config(config_dict=cfg_dict)
    _, _, registry = build_data_engines(cfg)
    assert len(registry) == 1
    assert registry.task_ids == ["T4_syn_box"]

    bad = copy.deepcopy(cfg_dict)
    bad["training"]["single_task"] = {
        "enabled": True, "task_id": "nope", "task_name": "",
    }
    with pytest.raises(ValueError):
        build_data_engines(Config(config_dict=bad))
