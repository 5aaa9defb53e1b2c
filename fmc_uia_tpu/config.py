"""Configuration system.

Loads the same YAML schema as the reference (reference:
code/configs/__init__.py:9-130) so existing config files work unchanged:
dot-path ``get``, derived attributes, runtime task override from the dataset,
per-task loss config lookup, and save-back.

Differences from the reference (TPU-native):
  * ``device`` resolution returns a JAX platform string instead of a torch
    device; ``device.mixed_precision`` actually controls bf16 compute (the
    reference declares it in YAML but never reads it).
  * ``parallel``-section additions (mesh axes, per-host batch) are accepted
    and defaulted; absent in reference configs.
"""

from __future__ import annotations

import copy
from pathlib import Path
from typing import Any, Dict, List, Optional

import yaml

_DEFAULT_CONFIG_NAME = "config.yaml"


def _builtin_config_dir() -> Path:
    return Path(__file__).resolve().parent.parent / "configs"


class Config:
    """YAML-backed configuration with dot-path access.

    Mirrors the public surface of the reference ``Config``
    (code/configs/__init__.py:9-118): ``get``, ``get_task_configs``,
    ``set_task_configs_from_dataset``, ``tasks_from_dataset``,
    ``get_loss_config``, ``get_augmentation_config``, ``save`` plus the same
    derived attributes (exp_name, seed, data_root, ...).
    """

    def __init__(self, config_path: Optional[str] = None,
                 config_dict: Optional[Dict[str, Any]] = None):
        if config_dict is not None:
            self.config = copy.deepcopy(config_dict)
        else:
            if config_path is None:
                config_path = _builtin_config_dir() / _DEFAULT_CONFIG_NAME
            with open(config_path, "r", encoding="utf-8") as f:
                self.config = yaml.safe_load(f)
        self._set_attributes()

    # -- derived attributes (same names as reference configs/__init__.py:28-55)
    def _set_attributes(self) -> None:
        self.exp_name = self.config["experiment"]["name"]
        self.seed = self.config["experiment"]["seed"]
        self.output_dir = Path(self.config["experiment"]["output_dir"])

        data = self.config["data"]
        self.data_root = data["root_path"]
        self.val_split = data["val_split"]
        self.batch_size = data["batch_size"]
        self.num_workers = data.get("num_workers", 0)
        self.image_size = data["image_size"]

        model = self.config["model"]
        self.encoder_name = model["encoder"]["name"]
        self.encoder_weights = model["encoder"].get("pretrained")
        self.use_deep_supervision = (
            model.get("heads", {})
            .get("segmentation", {})
            .get("use_deep_supervision", False)
        )
        self.separate_detection_fpn = model.get("decoder", {}).get(
            "separate_detection_fpn", False
        )

        training = self.config["training"]
        self.num_epochs = training["num_epochs"]
        self.learning_rate = training["optimizer"]["learning_rate"]
        self.weight_decay = training["optimizer"]["weight_decay"]
        self.print_freq = training.get("print_freq", 50)

        self.platform = self._get_platform()
        # bf16 compute: honoured here (config stub in reference, config.yaml:229)
        self.mixed_precision = bool(
            self.config.get("device", {}).get("mixed_precision", True)
        )

    def _get_platform(self) -> str:
        """Resolve compute platform. 'tpu' > 'gpu' > 'cpu' by availability."""
        import jax

        want_accel = self.config.get("device", {}).get("use_cuda", True)
        try:
            platform = jax.default_backend()
        except Exception:  # pragma: no cover - backend init failure
            platform = "cpu"
        if not want_accel:
            return "cpu"
        return platform

    def get(self, key: str, default: Any = None) -> Any:
        """Dot-separated nested lookup, e.g. ``get('model.encoder.name')``."""
        value: Any = self.config
        for k in key.split("."):
            try:
                value = value[k]
            except (KeyError, TypeError):
                return default
        return value

    def get_task_configs(self) -> List[Dict]:
        return self.config["tasks"]

    def set_task_configs_from_dataset(self, task_configs: List[Dict]) -> None:
        """Override task list with dataset-derived configs.

        Mirrors reference configs/__init__.py:90-94 including the
        ``runtime.tasks_from_dataset`` marker.
        """
        self.config["tasks"] = task_configs
        self.config.setdefault("runtime", {})["tasks_from_dataset"] = True

    def tasks_from_dataset(self) -> bool:
        return bool(self.get("runtime.tasks_from_dataset", False))

    def get_loss_config(self, task_name: str) -> Dict:
        return self.config["training"]["loss_configs"].get(task_name, {})

    def get_augmentation_config(self, split: str = "train") -> Dict:
        if split == "train":
            return self.config["data"]["augmentation"]["train"]
        return {}

    def save(self, save_path: str) -> None:
        with open(save_path, "w", encoding="utf-8") as f:
            yaml.dump(self.config, f, default_flow_style=False,
                      allow_unicode=True)

    def __repr__(self) -> str:
        return f"Config(exp_name={self.exp_name}, encoder={self.encoder_name})"


def load_config(config_path: Optional[str] = None) -> Config:
    """Load configuration from a YAML file (reference configs/__init__.py:120)."""
    return Config(config_path)
