"""CLI: ``python -m fmc_uia_tpu --config <yaml> [--resume]``
(reference CLI surface: ``python train.py --config <yaml>``,
reference train.py:791-796; --resume is new)."""

import argparse


def main():
    parser = argparse.ArgumentParser(
        description="Train the multi-task ultrasound model (TPU-native)")
    parser.add_argument("--config", type=str, default=None,
                        help="Path to config file")
    parser.add_argument("--resume", action="store_true",
                        help="Resume from the latest checkpoint in output_dir")
    args = parser.parse_args()

    from fmc_uia_tpu.fit import fit

    fit(config_path=args.config, resume=args.resume)


if __name__ == "__main__":
    main()
