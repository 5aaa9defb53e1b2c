"""Probe: end-to-end train steps on the Dino_resize_patch8 512^2 preset.

The capability unlock behind ops/vit_attention.py: at patch 8 / 512^2 the
ViT runs N=4101-token global attention, where eager scores are ~12.9 GB
per block — the preset was effectively untrainable on one chip before the
flash path. This probe builds the real preset (batch shrunk to fit a
probe), runs one jitted train step per task type on the TPU, and reports
step times, proving the full pipeline (augment -> DINOv3+resize adapter ->
FPN -> banked heads -> losses -> AdamW) compiles and steps at this scale.

Run on TPU:  python scripts/probe_dino_patch8_e2e.py
Env: PROBE_BATCH (default 4), PROBE_ITERS (default 5).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    from fmc_uia_tpu.config import load_config
    from fmc_uia_tpu.models import build_model
    from fmc_uia_tpu.models.multitask import init_variables
    from fmc_uia_tpu.tasks import TaskRegistry
    from fmc_uia_tpu.train import Trainer

    B = int(os.environ.get("PROBE_BATCH", "4"))
    iters = int(os.environ.get("PROBE_ITERS", "5"))
    print(f"backend: {jax.default_backend()}, batch {B}", file=sys.stderr)

    cfg = load_config(os.path.join(os.path.dirname(__file__), "..",
                                   "configs", "Dino_resize_patch8.yaml"))
    cfg.config["data"]["batch_size"] = B
    cfg.config["device"]["mixed_precision"] = True
    cfg._set_attributes()
    S = cfg.image_size
    assert S == 512, S

    registry = TaskRegistry.from_config(cfg)
    model = build_model(cfg, registry)
    t0 = time.perf_counter()
    variables = init_variables(model, jax.random.PRNGKey(0), S, 1)
    print(f"init {time.perf_counter() - t0:.1f} s", file=sys.stderr)
    trainer = Trainer(cfg, model, registry, variables["params"],
                      jax.random.PRNGKey(0))

    rng = np.random.RandomState(0)

    def batch_for(ttype):
        image = rng.randint(0, 255, (B, S, S, 3)).astype(np.uint8)
        if ttype == "segmentation":
            label = rng.randint(0, 2, (B, S, S)).astype(np.int32)
            tid = "T2A_fetal_abdomen"
        elif ttype == "classification":
            label = rng.randint(0, 3, (B,)).astype(np.int32)
            tid = "T1_fetal_planes"
        elif ttype == "detection":
            label = np.tile(np.array([[0.2, 0.2, 0.6, 0.7]], np.float32),
                            (B, 1))
            tid = "T4A_fetal_brain"
        else:
            label = rng.rand(B, 4).astype(np.float32)
            tid = "T5_fetal_femur"
        spec = registry[tid]
        return {"image": image, "label": label,
                "task_index": spec.global_index, "task_type": ttype,
                "task_id": tid}

    for ttype in ["segmentation", "classification", "detection",
                  "Regression"]:
        batch = batch_for(ttype)
        t0 = time.perf_counter()
        logs = trainer.train_batch(batch, epoch=0)
        loss = float(logs["total_loss"])
        t_first = time.perf_counter() - t0
        assert np.isfinite(loss), (ttype, loss)
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            logs = trainer.train_batch(batch, epoch=0)
            float(logs["total_loss"])
            ts.append(time.perf_counter() - t0)
        step = float(np.median(ts))
        print(f"{ttype:15s}: first(+compile) {t_first:7.1f} s, steady "
              f"{step * 1e3:7.1f} ms, {B / step:6.2f} img/s, "
              f"loss {loss:.4f}")


if __name__ == "__main__":
    main()
