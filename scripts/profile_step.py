"""Profile the bench train step and aggregate device op time by category.

Runs the bench trainer (current bench.py defaults) for a few steps per task
type under jax.profiler, then parses the xplane trace and prints:
  * total device time per step type
  * top ops by total device time
  * category buckets (fusion / convolution / custom-call (Pallas) / copy /
    dynamic-slice / all-reduce / other)

Usage:  python scripts/profile_step.py [task_type ...]
Env: PROFILE_STEPS (default 3), bench env knobs apply (BENCH_*).
"""

import glob
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import bench  # noqa: E402  (sets cache env vars)


def aggregate_xplane(trace_dir):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        raise RuntimeError(f"no xplane.pb under {trace_dir}")
    path = max(paths, key=os.path.getmtime)
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())

    # 'XLA Ops' is the synchronous TensorCore occupancy timeline (sums to
    # the device step time); 'Async XLA Ops' are DMA windows that OVERLAP
    # compute — summing them double-counts massively, so they're tracked
    # separately (only their non-hidden cost matters, visible as gaps).
    per_op = defaultdict(float)  # name -> total us (sync line)
    async_total = 0.0
    for plane in xs.planes:
        if not plane.name.startswith("/device:TPU"):
            continue
        for line in plane.lines:
            if line.name == "XLA Ops":
                for ev in line.events:
                    meta = plane.event_metadata[ev.metadata_id]
                    per_op[meta.name] += ev.duration_ps / 1e6
            elif line.name == "Async XLA Ops":
                async_total += sum(
                    ev.duration_ps for ev in line.events) / 1e6
    return per_op, async_total


def categorize(name):
    """Bucket by the op's OWN name + opcode — not the full HLO text.

    The r3-r4 audits (PERF.md) proved the old full-text substring match
    mis-bucketed ~35 of seg's 44 ms "copy" as copies because fusion rows
    carry their operand list, and operands named %copy.N matched: the real
    split is 7.5 ms true copies / 35 ms weight-grad & DUS fusions. The
    xplane op text is `%own_name = type opcode(operands...)`; the opcode
    is the word directly before ITS operand paren (operand refs are
    `%name,`-shaped, never followed by `(`), and the own name encodes
    semantic origin for fused layout work (%copy_convert_fusion)."""
    own = name.split(" = ")[0].lstrip("%").lower()

    def opcode(kw):
        return f" {kw}(" in name or name.startswith(f"{kw}(")

    if (opcode("custom-call") or "pallas" in own
            or "tpu_custom_call" in name):
        return "pallas-custom-call"
    if opcode("copy") or own.startswith(("copy", "copy-start", "copy-done")):
        return "copy"  # incl. fused copy_convert (layout work by origin)
    if opcode("convolution"):
        return "convolution"
    if opcode("fusion") or "fusion" in own:
        return "fusion"
    if opcode("convert"):
        return "layout"
    if (opcode("dynamic-update-slice") or opcode("dynamic-slice")
            or opcode("slice")):
        return "slice/dus"
    if (opcode("all-reduce") or opcode("all-gather")
            or opcode("reduce-scatter") or opcode("all-to-all")):
        return "collective"
    if opcode("transpose") or opcode("reshape") or opcode("bitcast"):
        return "layout"
    return "other"


def main():
    types = sys.argv[1:] or ["classification", "segmentation"]
    nsteps = int(os.environ.get("PROFILE_STEPS", "3"))
    trace_root = "/tmp/fmc_profile"

    import jax

    trainer, batches, registry = bench.build_bench(
        os.environ.get("BENCH_ENCODER", "swin_b"),
        int(os.environ.get("BENCH_IMAGE_SIZE", "512")),
        int(os.environ.get("BENCH_BATCH", "16")))

    for t in types:  # compile only the profiled types (cold compiles are
        # ~10-15 min/program through the remote tunnel; don't pay for
        # programs this run never profiles)
        t0 = time.time()
        out = bench.step_with_retry(trainer, batches[t])
        jax.block_until_ready(out["total_loss"])
        bench.log(f"compiled [{t}]: {time.time() - t0:.1f}s")

    for t in types:
        tdir = os.path.join(trace_root, t)
        jax.profiler.start_trace(tdir)
        for _ in range(nsteps):
            out = trainer.train_batch(batches[t], epoch=0)
        jax.block_until_ready(out["total_loss"])
        jax.profiler.stop_trace()

        per_op, async_total = aggregate_xplane(tdir)
        total = sum(per_op.values())
        cats = defaultdict(float)
        for name, us in per_op.items():
            cats[categorize(name)] += us
        print(f"\n=== {t}: {total / nsteps / 1e3:.1f} ms device/step "
              f"({nsteps} steps; async-DMA windows "
              f"{async_total / nsteps / 1e3:.1f} ms, mostly overlapped) ===")
        print("-- categories --")
        for c, us in sorted(cats.items(), key=lambda kv: -kv[1]):
            print(f"  {c:20s} {us / nsteps / 1e3:8.2f} ms  "
                  f"{100 * us / total:5.1f}%")
        print("-- top 25 ops --")
        for name, us in sorted(per_op.items(), key=lambda kv: -kv[1])[:25]:
            print(f"  {us / nsteps / 1e3:8.2f} ms  {100 * us / total:5.1f}%"
                  f"  {name[:110]}")

        # full table for offline analysis (PROFILE_DUMP=/path/prefix)
        dump = os.environ.get("PROFILE_DUMP")
        if dump:
            path = f"{dump}_{t}.tsv"
            with open(path, "w") as f:
                f.write("ms_per_step\tpct\tcategory\top\n")
                for name, us in sorted(per_op.items(), key=lambda kv: -kv[1]):
                    f.write(f"{us / nsteps / 1e3:.4f}\t"
                            f"{100 * us / total:.2f}\t"
                            f"{categorize(name)}\t{name}\n")
            print(f"full op table -> {path}")


if __name__ == "__main__":
    main()
