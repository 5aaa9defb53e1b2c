"""Shared test fixtures: tiny configs and synthetic batches."""

import copy

from fmc_uia_tpu.config import Config

TINY_TASKS = [
    {"task_id": "T2A_organ_a", "task_name": "segmentation", "num_classes": 2},
    {"task_id": "T2B_organ_b", "task_name": "segmentation", "num_classes": 2},
    {"task_id": "T1_planes", "task_name": "classification", "num_classes": 3},
    {"task_id": "T3_lesion", "task_name": "classification", "num_classes": 2},
    {"task_id": "T4_box", "task_name": "detection", "num_classes": 1},
    {"task_id": "T5_points", "task_name": "Regression", "num_classes": 2},
]

TINY_CONFIG = {
    "experiment": {
        "name": "tiny_test",
        "seed": 0,
        "output_dir": "outputs/tiny_test",
        "save_checkpoints": False,
        "checkpoint_freq": 10,
    },
    "data": {
        "root_path": "unused",
        "val_split": 0.25,
        "batch_size": 2,
        "num_workers": 0,
        "image_size": 64,
        "augmentation": {
            "train": {
                "random_brightness_contrast": 0.2,
                "gauss_noise": 0.1,
            },
            "normalize": {
                "mean": [0.33, 0.33, 0.33],
                "std": [0.18, 0.18, 0.18],
            },
        },
    },
    "model": {
        "moe": {"enabled": False},
        "encoder": {"name": "resnet_tiny", "pretrained": None},
        "decoder": {
            "type": "fpn",
            "pyramid_channels": 32,
            "segmentation_channels": 16,
            "dropout": 0.1,
            "merge_policy": "cat",
            "separate_detection_fpn": True,
            "separate_classification_fpn": False,
            "separate_regression_fpn": False,
            "use_fpn_for_classification": False,
            "use_fpn_for_regression": False,
        },
        "use_film": True,
        "film": {"use_task_embedding": False, "use_affine": True},
        "task_prompt": {"enabled": False},
        "heads": {
            "segmentation": {
                "type": "default",
                "upsampling": 4,
                "mid_channels": 16,
                "use_deep_supervision": False,
                "num_aux_outputs": 2,
                "aux_loss_weights": [0.5, 0.3],
            },
            "classification": {"dropout": 0.3},
            "detection": {"mid_channels": 16, "type": "centernet"},
            "regression": {"hidden_dims": [16, 8], "use_tanh": True,
                            "dropout": 0.3},
        },
    },
    "training": {
        "num_epochs": 2,
        "steps_per_epoch": 4,
        "single_task": {"enabled": False},
        "optimizer": {
            "type": "AdamW",
            "learning_rate": 1.0e-3,
            "weight_decay": 1.0e-4,
            "use_grouped_lr": True,
            "encoder_lr_multiplier": 0.1,
            "head_lr_multiplier": 1.0,
        },
        "scheduler": {"type": "CosineAnnealingLR", "T_max": 2,
                       "eta_min": 1.0e-6},
        "loss_weights": {
            "segmentation": 1.0,
            "classification": 1.0,
            "detection": 2.0,
            "regression": 1.0,
        },
        "adaptive_loss": {"enabled": False, "init_log_vars": -1.0,
                           "learning_rate": 1.0e-3, "warmup_epochs": 1},
        "loss_configs": {
            "segmentation": {"type": "DiceLoss", "mode": "multiclass"},
            "classification": {"type": "CrossEntropyLoss"},
            "detection": {"type": "CenterNet"},
            "regression": {"type": "MSELoss"},
        },
        "gradient_clip": 1.0,
        "print_freq": 0,
    },
    "validation": {"enabled": True, "freq": 1, "save_best_model": True},
    "device": {"use_cuda": False, "multi_gpu": False,
                "mixed_precision": False},
    "tasks": TINY_TASKS,
}


def make_tiny_config(**overrides) -> Config:
    cfg = copy.deepcopy(TINY_CONFIG)

    def deep_update(dst, src):
        for k, v in src.items():
            if isinstance(v, dict) and isinstance(dst.get(k), dict):
                deep_update(dst[k], v)
            else:
                dst[k] = v

    deep_update(cfg, overrides)
    return Config(config_dict=cfg)
