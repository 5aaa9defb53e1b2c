"""Persistent-cache keys must be stable across fresh processes.

Regression guard for the r5 root cause of the recurring "warm"-start
misses (PERF.md r5): warm_compile traced all task-type programs in
parallel threads, the emitted module depended on which program traced the
shared step core first, and the race winner's compile-cache key varied
run-to-run — so one program recompiled (60-240 s through the tunnel) on
EVERY bench run no matter how recently the cache was warmed. The fix
traces sequentially in sorted task order; this test proves the property
end-to-end: two fresh interpreter processes warm-compile the same tiny
trainer against one persistent cache dir, and the second process must
write ZERO new cache entries.
"""

import os
import subprocess
import sys
from pathlib import Path

import pytest

pytestmark = pytest.mark.slow

REPO = Path(__file__).resolve().parent.parent

CHILD = r"""
import os, sys
sys.path.insert(0, os.environ["FMC_REPO"])
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", os.environ["FMC_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
import copy
import numpy as np
from fmc_uia_tpu.config import Config
from fmc_uia_tpu.models import build_model
from fmc_uia_tpu.models.multitask import init_variables
from fmc_uia_tpu.tasks import TaskRegistry
from fmc_uia_tpu.train import Trainer
sys.path.insert(0, os.path.join(os.environ["FMC_REPO"], "tests"))
from helpers import TINY_CONFIG

cfg_dict = copy.deepcopy(TINY_CONFIG)
cfg_dict["tasks"] = [
    {"task_id": "T2A_organ_a", "task_name": "segmentation",
     "num_classes": 2},
    {"task_id": "T1_planes", "task_name": "classification",
     "num_classes": 3},
]
cfg = Config(config_dict=cfg_dict)
registry = TaskRegistry.from_config(cfg)
model = build_model(cfg, registry)
S, B = cfg.image_size, cfg.batch_size
variables = init_variables(model, jax.random.PRNGKey(0), S, 1)
trainer = Trainer(cfg, model, registry, variables["params"],
                  jax.random.PRNGKey(0))
rng = np.random.RandomState(0)
batches = {
    "segmentation": {
        "image": rng.randint(0, 255, (B, S, S, 3)).astype(np.uint8),
        "label": rng.randint(0, 2, (B, S, S)).astype(np.int32),
        "task_id": "T2A_organ_a", "task_index": 0,
        "task_type": "segmentation",
    },
    "classification": {
        "image": rng.randint(0, 255, (B, S, S, 3)).astype(np.uint8),
        "label": rng.randint(0, 3, (B,)).astype(np.int32),
        "task_id": "T1_planes", "task_index": 1,
        "task_type": "classification",
    },
}
times = trainer.warm_compile(batches, parallel=True)
assert set(times) == set(batches), times
logs = trainer.train_batch(batches["segmentation"], epoch=0)
assert np.isfinite(float(logs["total_loss"]))
print("CHILD_OK")
"""


def _run_child(cache_dir: str) -> None:
    env = dict(os.environ)
    env.update({
        "FMC_REPO": str(REPO),
        "FMC_CACHE_DIR": cache_dir,
        "JAX_PLATFORMS": "cpu",
        # deterministic flags independent of the parent test process
        "XLA_FLAGS": "",
    })
    proc = subprocess.run([sys.executable, "-c", CHILD], env=env,
                          capture_output=True, text=True, cwd=str(REPO),
                          timeout=900)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "CHILD_OK" in proc.stdout


def test_fresh_process_warm_compile_hits_cache(tmp_path):
    cache_dir = str(tmp_path / "jc")
    os.makedirs(cache_dir)

    _run_child(cache_dir)
    after_first = set(os.listdir(cache_dir))
    assert after_first, "first run wrote no cache entries — cache disabled?"

    _run_child(cache_dir)
    new = set(os.listdir(cache_dir)) - after_first
    assert not new, (
        f"second fresh process missed the persistent cache for "
        f"{len(new)} program(s) — the warm-compile trace order is "
        f"non-deterministic again: {sorted(new)[:4]}")
