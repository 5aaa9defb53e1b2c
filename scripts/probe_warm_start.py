"""Dissect the warm-start wall (VERDICT r3 item 7).

BENCH_r03 paid a 167.5 s parallel AOT warm-compile wall on a warm
persistent cache. Two candidate pools per program:
  (a) trace+lower — local Python/StableHLO work, NOT covered by the
      persistent cache;
  (b) compile() on a cache hit — disk read + executable deserialization,
      which under the axon remote helper rides the tunnel.
This probe times the pools separately for the 4 flagship programs, then
measures the jax.experimental.serialize_executable round-trip (pickled
executable, skips BOTH pools except the PJRT load) as the candidate fix.

Usage: python scripts/probe_warm_start.py   (TPU; needs a warm .jax_cache)
Env: WARM_BATCH (24), WARM_SIZE (512), WARM_TYPES (csv, default all 4)
"""

import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".jax_cache"))

from fmc_uia_tpu.utils.jax_cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

import jax  # noqa: E402

sys.path.insert(0, str(REPO))
import bench  # noqa: E402


def main():
    batch = int(os.environ.get("WARM_BATCH", "24"))
    size = int(os.environ.get("WARM_SIZE", "512"))
    t_build0 = time.time()
    trainer, batches, registry = bench.build_bench("swin_b", size, batch)
    t_build = time.time() - t_build0
    print(f"[warm] build_bench (model init + trainer): {t_build:.1f}s")

    types = os.environ.get("WARM_TYPES")
    types = types.split(",") if types else list(batches)

    compiled = {}
    for t in types:
        b = batches[t]
        images, labels, task_index, lr, adaptive_enable = (
            trainer._step_args(b, 0))
        args = (trainer.state, images, labels, task_index, lr,
                adaptive_enable, trainer.rng)
        with trainer._act_scope():
            t0 = time.time()
            lowered = trainer.steps[t].lower(*args)
            t_lower = time.time() - t0
            t0 = time.time()
            exe = lowered.compile()
            t_compile = time.time() - t0
        compiled[t] = (exe, args)
        print(f"[warm] {t}: lower={t_lower:.1f}s "
              f"compile(cache-hit)={t_compile:.1f}s")

    # serialized-executable round trip (skips trace+lower+cache machinery)
    try:
        from jax.experimental.serialize_executable import (
            deserialize_and_load,
            serialize,
        )
    except ImportError:
        print("[warm] serialize_executable unavailable in this JAX")
        return
    for t, (exe, args) in compiled.items():
        t0 = time.time()
        payload, in_tree, out_tree = serialize(exe)
        t_ser = time.time() - t0
        t0 = time.time()
        exe2 = deserialize_and_load(payload, in_tree, out_tree)
        t_de = time.time() - t0
        print(f"[warm] {t}: serialized {len(payload) / 1e6:.1f} MB "
              f"in {t_ser:.1f}s, deserialize_and_load={t_de:.1f}s")
        del exe2
        break  # one program is representative; the rest share the answer


if __name__ == "__main__":
    main()
