"""Probe: is deformable cross-attention hot in the DINOv3 SPM preset?

SURVEY §7 flags the deformable grid-sample cross-attention (reference
encoders.py:394-459) as the one genuinely novel kernel candidate. Before
writing a Pallas kernel, measure what the gather-based XLA implementation
(ops/sampling.py + adapters.py DeformableCrossAttention2D) actually costs
inside the vit_large_patch16_dinov3 spm_interaction preset at 224^2:

  1. full jitted train step per task type (the preset as configured);
  2. standalone fwd+bwd of one InteractionBlock per pyramid scale
     (56/28/14/7 grids, kv from the 14x14 ViT map) — x4 blocks = the
     adapter's total deformable cost.

If (2)*4 is a small share of (1), the kernel isn't worth building.

Run on TPU:  python scripts/probe_deformable.py
Env: PROBE_BATCH (default 16), PROBE_ITERS (default 10).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters


def main():
    from fmc_uia_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()

    B = int(os.environ.get("PROBE_BATCH", "16"))
    iters = int(os.environ.get("PROBE_ITERS", "10"))

    # ---- standalone InteractionBlock per scale --------------------------
    from fmc_uia_tpu.models.encoders.adapters import InteractionBlock

    key = jax.random.PRNGKey(0)
    dtype = jnp.bfloat16
    block_times = {}
    for hw in ((56, 56), (28, 28), (14, 14), (7, 7)):
        blk = InteractionBlock(channels=256, num_heads=8, dtype=dtype)
        x = jax.random.normal(key, (B, *hw, 256), dtype)
        kv = jax.random.normal(key, (B, 14, 14, 256), dtype)
        params = blk.init(key, x, kv)

        def fwd_bwd(p, x, kv, _blk=blk):
            def loss(p):
                return jnp.sum(_blk.apply(p, x, kv).astype(jnp.float32))
            return jax.grad(loss)(p)

        jfn = jax.jit(fwd_bwd)
        dt = timeit(jfn, params, x, kv, iters=iters)
        block_times[hw] = dt
        print(f"interaction block {hw[0]}x{hw[1]} fwd+bwd: "
              f"{dt * 1e3:.2f} ms", flush=True)
    blocks_total = sum(block_times.values())
    print(f"adapter total (4 blocks): {blocks_total * 1e3:.2f} ms")

    # ---- full train step on the preset ----------------------------------
    from fmc_uia_tpu.config import load_config
    from fmc_uia_tpu.models import build_model
    from fmc_uia_tpu.models.multitask import init_variables
    from fmc_uia_tpu.tasks import TaskRegistry
    from fmc_uia_tpu.train import Trainer

    cfg = load_config(os.path.join(os.path.dirname(__file__), "..",
                                   "configs",
                                   "vit_large_patch16_dinov3.yaml"))
    cfg.config["data"]["batch_size"] = B
    cfg._set_attributes()
    S = cfg.image_size
    registry = TaskRegistry.from_config(cfg)
    model = build_model(cfg, registry)
    variables = init_variables(model, jax.random.PRNGKey(0), S, 1)
    trainer = Trainer(cfg, model, registry, variables["params"],
                      jax.random.PRNGKey(0))

    rng = np.random.RandomState(0)

    def batch_for(ttype):
        image = rng.randint(0, 255, (B, S, S, 3)).astype(np.uint8)
        if ttype == "segmentation":
            label = rng.randint(0, 2, (B, S, S)).astype(np.int32)
            tid = "T2A_fetal_abdomen"
        elif ttype == "classification":
            label = rng.randint(0, 2, (B,)).astype(np.int32)
            tid = "T3A_breast_tumor"
        elif ttype == "detection":
            x1 = rng.uniform(0.1, 0.5, (B, 1))
            y1 = rng.uniform(0.1, 0.5, (B, 1))
            label = np.concatenate([x1, y1, x1 + 0.3, y1 + 0.3],
                                   axis=1).astype(np.float32)
            tid = "T4A_fetal_brain"
        else:
            label = rng.rand(B, 8).astype(np.float32)
            tid = "T5_fetal_femur"
        spec = registry[tid]
        return {"image": image, "label": label, "task_id": tid,
                "task_index": spec.global_index, "task_type": ttype}

    for ttype in registry.present_types():
        db = trainer.put_batch(batch_for(ttype))
        t0 = time.time()
        logs = trainer.train_batch(db, epoch=0)
        jax.block_until_ready(logs["total_loss"])
        print(f"compile+first [{ttype}]: {time.time() - t0:.1f}s",
              flush=True)
        t0 = time.time()
        for _ in range(iters):
            logs = trainer.train_batch(db, epoch=0)
        jax.block_until_ready(logs["total_loss"])
        dt = (time.time() - t0) / iters
        print(f"step [{ttype}]: {dt * 1e3:.1f} ms  "
              f"(adapter share ~{blocks_total / dt * 100:.1f}%)",
              flush=True)


if __name__ == "__main__":
    main()
