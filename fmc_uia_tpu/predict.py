"""Inference CLI: load a trained model, export challenge-format predictions.

The reference README's TOC lists an "Inference & Docker" section that does
not exist in its body (reference README.md:16); this provides the real
entry point:

    python -m fmc_uia_tpu.predict --config configs/config.yaml \
        --checkpoint outputs/exp_.../  --data /path/to/test --out preds/

The checkpoint argument is the experiment dir containing the orbax
``best_model`` saved during fit(); predictions land as per-task JSON files +
mask PNGs (export.py).
"""

from __future__ import annotations

import argparse


def main():
    parser = argparse.ArgumentParser(description="Run inference + export")
    parser.add_argument("--config", type=str, default=None,
                        help="config path; defaults to the experiment dir's "
                             "config.yaml snapshot (which records the "
                             "dataset-derived task universe the model was "
                             "actually built with)")
    parser.add_argument("--checkpoint", type=str, required=True,
                        help="experiment dir containing best_model/")
    parser.add_argument("--data", type=str, required=True,
                        help="dataset root with csv_files/")
    parser.add_argument("--out", type=str, required=True)
    parser.add_argument("--batch-size", type=int, default=16)
    args = parser.parse_args()

    import jax

    from fmc_uia_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()

    from fmc_uia_tpu import checkpoint as ckpt_lib
    from fmc_uia_tpu.config import load_config
    from fmc_uia_tpu.export import export_predictions
    from fmc_uia_tpu.models import build_model
    from fmc_uia_tpu.models.multitask import init_variables
    from fmc_uia_tpu.tasks import TaskRegistry

    import os

    config_path = args.config
    if config_path is None:
        config_path = os.path.join(args.checkpoint, "config.yaml")
        if not os.path.exists(config_path):
            raise FileNotFoundError(
                f"No --config given and {config_path} not found")
    config = load_config(config_path)
    registry = TaskRegistry.from_config(config)
    model = build_model(config, registry)
    variables = init_variables(model, jax.random.PRNGKey(0),
                               config.image_size, 1)
    params = ckpt_lib.load_best_params(args.checkpoint, variables["params"])

    outputs = export_predictions(
        model, params, args.data, args.out, registry,
        config.get("data.augmentation.normalize.mean"),
        config.get("data.augmentation.normalize.std"),
        config.image_size, batch_size=args.batch_size)
    for task_id, path in outputs.items():
        print(f"{task_id}: {path}")


if __name__ == "__main__":
    main()
