"""Config system + task registry tests."""

from pathlib import Path

import numpy as np
import pytest

from fmc_uia_tpu.config import Config, load_config
from fmc_uia_tpu.tasks import (
    TASK_TYPES,
    TaskRegistry,
    SEGMENTATION,
    CLASSIFICATION,
    DETECTION,
    REGRESSION,
)

CONFIG_PATH = Path(__file__).resolve().parent.parent / "configs" / "config.yaml"


def test_load_default_config():
    cfg = load_config(str(CONFIG_PATH))
    assert cfg.exp_name
    assert cfg.seed == 42
    assert cfg.image_size == 224
    assert cfg.get("model.encoder.name") == "swin_b"
    assert cfg.get("does.not.exist", "fallback") == "fallback"
    assert cfg.get("training.optimizer.learning_rate") == pytest.approx(1e-4)


def test_reference_config_loads_unchanged():
    """The reference repo's own YAML files must load through our Config."""
    ref = Path("/root/reference/code/configs/config.yaml")
    if not ref.exists():
        pytest.skip("reference not mounted")
    cfg = Config(str(ref))
    assert len(cfg.get_task_configs()) == 27
    assert cfg.get("model.decoder.pyramid_channels") == 256


def test_task_override_marks_runtime():
    cfg = load_config(str(CONFIG_PATH))
    assert not cfg.tasks_from_dataset()
    new_tasks = [{"task_id": "X", "task_name": "segmentation", "num_classes": 2}]
    cfg.set_task_configs_from_dataset(new_tasks)
    assert cfg.tasks_from_dataset()
    assert cfg.get_task_configs() == new_tasks


def test_registry_canonical_27():
    cfg = load_config(str(CONFIG_PATH))
    reg = TaskRegistry.from_config(cfg)
    assert len(reg) == 27
    assert reg.num_of_type(SEGMENTATION) == 12
    assert reg.num_of_type(CLASSIFICATION) == 9
    assert reg.num_of_type(DETECTION) == 3
    assert reg.num_of_type(REGRESSION) == 3
    assert reg.max_classes(CLASSIFICATION) == 6
    assert reg.max_classes(SEGMENTATION) == 2
    # local indices are contiguous per type
    for t in TASK_TYPES:
        locals_ = [s.local_index for s in reg.of_type(t)]
        assert locals_ == list(range(len(locals_)))
    # capital-R Regression string contract
    assert reg["T5_fetal_brain"].task_name == "Regression"
    # table consistency
    spec = reg["T1_fetal_planes"]
    assert reg.num_classes_table[spec.global_index] == 6
    assert reg.type_index_table[spec.global_index] == TASK_TYPES.index(
        CLASSIFICATION
    )


def test_registry_rejects_bad_type():
    with pytest.raises(ValueError):
        TaskRegistry([{"task_id": "a", "task_name": "regression",  # lower r
                       "num_classes": 4}])


def test_loss_config_lookup():
    cfg = load_config(str(CONFIG_PATH))
    assert cfg.get_loss_config("segmentation")["type"] == "DiceLoss"
    assert cfg.get_loss_config("detection")["heatmap_alpha"] == 2.0
    assert cfg.get_loss_config("unknown") == {}


def test_config_save_roundtrip(tmp_path):
    cfg = load_config(str(CONFIG_PATH))
    out = tmp_path / "saved.yaml"
    cfg.save(str(out))
    cfg2 = Config(str(out))
    assert cfg2.exp_name == cfg.exp_name
    assert cfg2.get_task_configs() == cfg.get_task_configs()
