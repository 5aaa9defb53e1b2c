"""Serving throughput benchmark: sustained images/sec through the
StreamingPredictor micro-batcher.

bench_latency.py measures the raw batch-1 jitted forward; this harness
measures the full serving path (per-task queues -> dispatcher -> padded
micro-batches -> jitted predict -> decode -> futures) under concurrent
client load across all 4 task types, the way a deployment would run it.
Reports sustained img/s and end-to-end (submit -> result) p50/p99 latency
per batch size.

Usage: python bench_serving.py
Env: SRV_ENCODER, SRV_IMAGE_SIZE, SRV_BATCHES (comma list, default "1,8,16,32"),
     SRV_REQUESTS (per batch-size trial, default 256).
Prints one JSON line: {"metric": ..., "value": best_img_s, "unit": ...}.
"""

import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax  # noqa: F401

    from fmc_uia_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()

    from fmc_uia_tpu.config import load_config
    from fmc_uia_tpu.models import build_model
    from fmc_uia_tpu.models.multitask import init_variables
    from fmc_uia_tpu.serving import StreamingPredictor
    from fmc_uia_tpu.tasks import TaskRegistry

    encoder = os.environ.get("SRV_ENCODER", "swin_b")
    image_size = int(os.environ.get("SRV_IMAGE_SIZE", "512"))
    batch_sizes = [int(b) for b in os.environ.get(
        "SRV_BATCHES", "1,8,16,32").split(",")]
    n_requests = int(os.environ.get("SRV_REQUESTS", "256"))

    cfg = load_config(os.path.join(os.path.dirname(__file__), "configs",
                                   "config.yaml"))
    cfg.config["data"]["image_size"] = image_size
    cfg.config["model"]["encoder"]["name"] = encoder
    cfg.config["device"]["mixed_precision"] = True
    cfg._set_attributes()

    registry = TaskRegistry.from_config(cfg)
    model = build_model(cfg, registry)
    variables = init_variables(model, jax.random.PRNGKey(0), image_size, 1)
    params = variables["params"]
    mean = cfg.get("data.augmentation.normalize.mean")
    std = cfg.get("data.augmentation.normalize.std")

    # one task per type: the dispatcher round-robins real mixed traffic
    task_ids = ["T2A_fetal_abdomen", "T1_fetal_planes", "T4A_fetal_brain",
                "T5_fetal_femur"]
    rng = np.random.RandomState(0)
    image = rng.randint(0, 255, (image_size, image_size, 3)).astype(np.uint8)

    results = {}
    best = (0.0, None)
    for mb in batch_sizes:
        svc = StreamingPredictor(model, params, registry, mean, std,
                                 image_size, max_batch=mb, max_delay_ms=5.0)
        # compile OUTSIDE the timed window: every (task type, chain size)
        # program the autoscale dispatcher can hit — a lone first-request
        # warmup only builds the batch-1 programs, and the flood below then
        # pays multi-minute lazy compiles inside the measurement
        t0 = time.perf_counter()
        svc.warmup(task_ids=task_ids)
        log(f"warmup max_batch={mb}: chain {svc._chain} compiled in "
            f"{time.perf_counter() - t0:.1f}s")
        t0 = time.perf_counter()
        submit_ts, futs = [], []
        for i in range(n_requests):
            tid = task_ids[i % len(task_ids)]
            submit_ts.append(time.perf_counter())
            futs.append(svc.submit(image, tid))
        lat = []  # end-to-end submit -> result, ms
        for ts, f in zip(submit_ts, futs):
            f.result()
            lat.append((time.perf_counter() - ts) * 1e3)
        dt = time.perf_counter() - t0
        svc.close()
        ips = n_requests / dt
        entry = {
            "img_s": round(ips, 2),
            "p50_ms": round(float(np.percentile(lat, 50)), 2),
            "p99_ms": round(float(np.percentile(lat, 99)), 2),
        }
        results[f"batch_{mb}"] = entry
        log(f"max_batch={mb:3d}: {ips:7.1f} img/s  "
            f"e2e p50 {entry['p50_ms']:.1f} ms  p99 {entry['p99_ms']:.1f} ms")
        if ips > best[0]:
            best = (ips, mb)

    # SLO gate (VERDICT r2 #10): under the concurrent flood, batch-1 e2e
    # p50 must stay within SRV_SLO_MS (default: 3x the raw batch-1 jitted
    # forward p50 from bench_latency.py — queueing + decode headroom).
    slo_ms = float(os.environ.get("SRV_SLO_MS", "120"))
    slo_entry = results.get("batch_1") or next(iter(results.values()))
    slo_ok = slo_entry["p50_ms"] <= slo_ms
    log(f"SLO: e2e p50 {slo_entry['p50_ms']:.1f} ms vs {slo_ms:.0f} ms "
        f"-> {'PASS' if slo_ok else 'FAIL'}")

    print(json.dumps({
        "metric": f"{encoder} {image_size}^2 serving throughput "
                  f"(StreamingPredictor, mixed 4-type traffic)",
        "value": round(best[0], 2),
        "unit": "images/sec",
        "best_max_batch": best[1],
        "per_batch": results,
        "slo_ms": slo_ms,
        "slo_p50_ms": slo_entry["p50_ms"],
        "slo_pass": slo_ok,
    }))
    if not slo_ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
