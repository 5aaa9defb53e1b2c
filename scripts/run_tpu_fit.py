"""End-to-end `fit()` proof on the real TPU chip (VERDICT r2 Missing #1).

Runs the FULL training deliverable — the reference's ``main()``
(reference train.py:516-788) — on hardware, not the virtual CPU mesh:

  1. generates a synthetic on-disk dataset (all 4 task types),
  2. phase 1: ``python -m fmc_uia_tpu --config ...`` and delivers SIGTERM
     mid-epoch-2 -> expects a preemption checkpoint + clean exit,
  3. phase 2: ``--resume`` to completion,
  4. asserts the full artifact set (history JSON, CSVs, best-model orbax
     checkpoint, final summary, plots) and prints a PASS summary.

Usage:  python scripts/run_tpu_fit.py
Env:    FIT_ENCODER (default swin_t), FIT_SIZE (224), FIT_BATCH (8),
        FIT_EPOCHS (3), FIT_STEPS (8 steps/epoch), FIT_SKIP_SIGTERM=1
        (single uninterrupted run instead of the preempt+resume pair).

        FIT_FLAGSHIP=1 (VERDICT r3 item 4): the config is
        configs/config.yaml itself — swin_b@512^2 batch 24, bf16, fused
        Pallas kernels, scan_stages [0,1,3], window 8 — with a synthetic
        dataset spanning the FULL 27-task universe so the dataset-derived
        task configs equal the preset's and the bench's cached train-step
        programs are reused verbatim (the val-epoch eval programs compile
        fresh). Defaults in this mode: SIZE=512 BATCH=24 EPOCHS=2 STEPS=50.

Compile note: a fresh config means cold-compiling 4 train + up to 4 eval
programs through the remote tunnel; swin_t@224^2 keeps that tractable. The
persistent cache (.jax_cache) makes reruns cheap.
"""

import os
import re
import signal
import subprocess
import sys
import time
from pathlib import Path

import yaml

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

FLAGSHIP = os.environ.get("FIT_FLAGSHIP") == "1"
ENCODER = os.environ.get("FIT_ENCODER", "swin_b" if FLAGSHIP else "swin_t")
SIZE = int(os.environ.get("FIT_SIZE", "512" if FLAGSHIP else "224"))
BATCH = int(os.environ.get("FIT_BATCH", "24" if FLAGSHIP else "8"))
EPOCHS = int(os.environ.get("FIT_EPOCHS", "2" if FLAGSHIP else "3"))
STEPS = int(os.environ.get("FIT_STEPS", "50" if FLAGSHIP else "8"))
ROOT = os.environ.get("FIT_DATA_ROOT",
                      "/tmp/fmc_tpu_fit_flagship_data" if FLAGSHIP
                      else "/tmp/fmc_tpu_fit_data")
OUT = os.environ.get("FIT_OUTPUT", str(
    REPO / "outputs" / ("tpu_fit_flagship" if FLAGSHIP else "tpu_fit")))
EXP_PREFIX = "tpu_fit_flagship" if FLAGSHIP else "tpu_fit_proof"


def build_flagship_config(path: str) -> None:
    """configs/config.yaml verbatim (the preset the bench runs) with only
    run-shape overrides — model/optimizer/loss sections untouched so the
    train-step programs hash-match the bench's persistent-cache entries."""
    with open(REPO / "configs" / "config.yaml") as f:
        cfg = yaml.safe_load(f)
    cfg["experiment"].update({
        "name": EXP_PREFIX, "output_dir": OUT, "save_checkpoints": True,
        "checkpoint_freq": 1, "preemption_checkpoint": True,
    })
    cfg["data"].update({
        "root_path": ROOT, "val_split": 0.25, "batch_size": BATCH,
        "num_workers": 4, "image_size": SIZE, "cache_samples": True,
        # stage the dataset to HBM once (data/device_cache.py): on the axon
        # transport the streaming path is transfer-bound at ~43 img/s
        # (PERF.md r4), so the in-train rate only evidences the device rate
        # with the cache on. Data-section-only change: the train-step HLO
        # (and so the persistent compile cache) is unaffected.
        "device_cache": bool(int(os.environ.get("FIT_DEVICE_CACHE", "1"))),
    })
    cfg["model"]["encoder"]["name"] = ENCODER
    cfg["training"]["num_epochs"] = EPOCHS
    cfg["training"]["steps_per_epoch"] = STEPS
    cfg["training"]["print_freq"] = 10
    cfg["training"]["scheduler"]["T_max"] = EPOCHS
    cfg["validation"]["freq"] = 1
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)


def build_config(path: str) -> None:
    if FLAGSHIP:
        return build_flagship_config(path)
    cfg = {
        "experiment": {
            "name": "tpu_fit_proof", "seed": 42, "output_dir": OUT,
            "save_checkpoints": True, "checkpoint_freq": 1,
            "preemption_checkpoint": True,
        },
        "data": {
            "root_path": ROOT, "val_split": 0.25, "batch_size": BATCH,
            "num_workers": 2, "image_size": SIZE, "cache_samples": True,
            "augmentation": {
                "train": {"random_brightness_contrast": 0.2,
                          "gauss_noise": 0.1},
                "normalize": {"mean": [0.485, 0.456, 0.406],
                              "std": [0.229, 0.224, 0.225]},
            },
        },
        "model": {
            "encoder": {"name": ENCODER, "pretrained": None,
                        "window_size": 8, "softmax_bf16": True,
                        "ln_bf16": True},
            "decoder": {"type": "fpn", "pyramid_channels": 128,
                        "segmentation_channels": 64, "dropout": 0.1,
                        "merge_policy": "cat",
                        "separate_detection_fpn": True},
            "moe": {"enabled": False},
            "use_film": True,
            "film": {"use_task_embedding": False, "use_affine": True},
            "task_prompt": {"enabled": False},
            "heads": {
                "segmentation": {"type": "default", "upsampling": 4,
                                 "mid_channels": 64},
                "classification": {"dropout": 0.3},
                "detection": {"type": "centernet", "mid_channels": 64},
                "regression": {"hidden_dims": [128], "use_tanh": True,
                               "dropout": 0.3},
            },
        },
        "training": {
            "num_epochs": EPOCHS, "steps_per_epoch": STEPS,
            "print_freq": 4,
            "optimizer": {"type": "AdamW", "learning_rate": 3e-4,
                          "weight_decay": 1e-4, "use_grouped_lr": True,
                          "encoder_lr_multiplier": 0.1,
                          "head_lr_multiplier": 1.0},
            "scheduler": {"type": "CosineAnnealingLR", "T_max": EPOCHS,
                          "eta_min": 1e-6},
            "adaptive_loss": {"enabled": True, "init_log_vars": -0.5,
                              "learning_rate": 1e-3, "warmup_epochs": 0},
            "loss_configs": {
                "segmentation": {"type": "DiceLoss", "mode": "multiclass"},
                "classification": {"type": "CrossEntropyLoss"},
                "detection": {"type": "CenterNet"},
                "regression": {"type": "MSELoss"},
            },
            "gradient_clip": 1.0,
        },
        "validation": {"enabled": True, "freq": 1},
        "device": {"use_cuda": False, "mixed_precision": True},
        "tasks": [],  # dataset-derived at runtime
    }
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)


def run_fit(config_path: str, resume: bool, sigterm_after_epoch2: bool):
    """Run fit in a subprocess; optionally SIGTERM once epoch 2 starts."""
    cmd = [sys.executable, "-m", "fmc_uia_tpu", "--config", config_path]
    if resume:
        cmd.append("--resume")
    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".jax_cache"))
    proc = subprocess.Popen(cmd, cwd=str(REPO), env=env,
                            stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True)
    lines = []
    sent = False
    for line in proc.stdout:
        lines.append(line)
        sys.stdout.write(line)
        sys.stdout.flush()
        if (sigterm_after_epoch2 and not sent
                and re.search(r"Epoch \[2/", line)):
            time.sleep(2)  # land mid-epoch, after a couple of steps
            proc.send_signal(signal.SIGTERM)
            sent = True
            print(">>> SIGTERM delivered mid-epoch-2", flush=True)
    proc.wait()
    return proc.returncode, "".join(lines), sent


def main():
    from fmc_uia_tpu.data.synthetic import generate_synthetic_dataset

    if not os.path.exists(os.path.join(ROOT, "csv_files")):
        tasks = None
        if FLAGSHIP:
            # full 27-task universe from the preset so the dataset-derived
            # task configs equal configs/config.yaml's and the bench's
            # cached train-step programs are reused
            with open(REPO / "configs" / "config.yaml") as f:
                tasks = yaml.safe_load(f)["tasks"]
        generate_synthetic_dataset(ROOT, tasks=tasks,
                                   samples_per_task=(2 if FLAGSHIP else 4)
                                   * BATCH,
                                   image_hw=(SIZE + 32, SIZE), seed=0)
        print(f"synthetic dataset at {ROOT}")

    cfg_path = "/tmp/tpu_fit_config.yaml"
    build_config(cfg_path)

    t0 = time.time()
    skip_sig = os.environ.get("FIT_SKIP_SIGTERM") == "1"
    rc, out, sent = run_fit(cfg_path, resume=False,
                            sigterm_after_epoch2=not skip_sig)
    assert rc == 0, f"phase-1 fit exited rc={rc}"

    if not skip_sig:
        assert sent, "epoch 2 never started (check EPOCHS>=2)"
        assert "Preempted during epoch" in out, \
            "SIGTERM did not produce a preemption checkpoint"
        dirs_before = set(Path(OUT).glob(f"{EXP_PREFIX}_*"))
        print("\n>>> phase 2: --resume to completion\n", flush=True)
        rc, out, _ = run_fit(cfg_path, resume=True,
                             sigterm_after_epoch2=False)
        assert rc == 0, f"resume fit exited rc={rc}"
        assert "Resumed from" in out, "resume did not restore a checkpoint"
        # resume must continue the SAME experiment dir (history/best_model/
        # checkpoints stay together), not open a fresh timestamped one
        dirs_after = set(Path(OUT).glob(f"{EXP_PREFIX}_*"))
        assert dirs_after == dirs_before, \
            f"--resume created a new experiment dir: {dirs_after - dirs_before}"
    assert "Training complete" in out, "fit did not reach completion"
    assert "Best-model evaluation skipped" not in out, \
        "final best-model evaluation could not find its checkpoint"

    # artifact assertions (reference logger artifact set, SURVEY §5)
    exp_dirs = sorted(Path(OUT).glob(f"{EXP_PREFIX}_*"),
                      key=lambda p: p.stat().st_mtime)
    exp = exp_dirs[-1]
    required = ["training_history.json", "train_losses.csv",
                "val_metrics.csv", "training_summary.csv", "config.yaml",
                "final_summary.json", "best_model_summary.txt"]
    missing = [f for f in required if not (exp / f).exists()]
    assert not missing, f"missing artifacts in {exp}: {missing}"
    has_best = any(exp.glob("best_model*")) or any(
        exp.glob("**/best_params*"))
    assert has_best, f"no best-model checkpoint under {exp}"

    elapsed = time.time() - t0
    import jax

    print(f"\nPASS: full fit() on backend={jax.default_backend()} — "
          f"{EPOCHS} epochs ({ENCODER}@{SIZE}^2 batch {BATCH}), SIGTERM "
          f"preempt + exact resume, all artifacts in {exp} "
          f"({elapsed / 60:.1f} min total)")


if __name__ == "__main__":
    main()
