"""Same-hardware measured comparison: torch reference step vs our JAX step.

The reference publishes no performance numbers, and its GPU stack
(timm/smp/albumentations, CUDA) is absent here, so BASELINE.md defends the
75 img/s A100 denominator analytically. This script adds a MEASURED data
point on hardware both frameworks can run in this environment — the host
CPU:

  * torch side: a faithful eager-fp32 reimplementation of the reference's
    swin_b segmentation training step — timm-semantics Swin (the same
    torch modules our conversion oracles validate against), an smp-style
    FPN decoder (lateral 1x1 + top-down add + per-level seg blocks +
    cat merge, mirroring /root/reference/code/models/decoders.py:9-60),
    the default segmentation head, CE loss, AdamW — exactly the compute
    recipe of the reference hot loop (/root/reference/code/train.py:256-513).
  * jax side: this repo's compiled train step (fp32 for apples-to-apples;
    the Pallas branches are TPU-only and auto-disabled on CPU) run in a
    JAX_PLATFORMS=cpu subprocess.

Both run the identical workload: swin_b, 512^2, batch B, segmentation
with num_classes=2. Window size is 8 on both sides (the torch oracle
partitions pad-free; the real reference pads ws=7 windows and does
strictly MORE work — this choice can only flatter the torch side).

Usage:  python scripts/bench_reference_torch.py [--batch 2] [--steps 3]
        (runs both sides; use --side torch|jax for one)

Result (recorded in BASELINE.md as a negative finding): torch eager
0.081 img/s vs XLA:CPU 0.028 img/s on the single host core — at this
scale the ratio measures oneDNN-vs-XLA:CPU convolution codegen, not
framework design, and does not inform the A100/TPU denominator in
either direction. The A100 estimate stands on BASELINE.md's analytic
derivation.
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
IMAGE_SIZE = 512
NUM_CLASSES = 2


# ---------------------------------------------------------------------------
# torch side
# ---------------------------------------------------------------------------
def run_torch(batch: int, steps: int) -> float:
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    sys.path.insert(0, REPO)  # test module imports fmc_uia_tpu
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from test_convert_numeric import TorchTinySwin  # faithful timm layout

    torch.manual_seed(0)

    class FPNSeg(nn.Module):
        """smp FPNDecoder semantics (reference decoders.py:9-60) + the
        default seg head (reference heads.py:16-42)."""

        def __init__(self, in_ch=(128, 256, 512, 1024), pyramid=256,
                     seg_ch=128, classes=NUM_CLASSES):
            super().__init__()
            self.lateral = nn.ModuleList(
                [nn.Conv2d(c, pyramid, 1) for c in in_ch])
            self.seg_blocks = nn.ModuleList(
                [nn.Sequential(nn.Conv2d(pyramid, seg_ch, 3, padding=1),
                               nn.GroupNorm(32, seg_ch), nn.ReLU())
                 for _ in in_ch])
            merged = seg_ch * len(in_ch)  # merge_policy='cat'
            self.pre = nn.Sequential(
                nn.Conv2d(merged, seg_ch, 3, padding=1),
                nn.GroupNorm(32, seg_ch), nn.SiLU())
            self.out = nn.Conv2d(seg_ch, classes, 1)

        def forward(self, feats):  # feats: NHWC stage outputs
            feats = [f.permute(0, 3, 1, 2) for f in feats]
            laterals = [l(f) for l, f in zip(self.lateral, feats)]
            for i in range(len(laterals) - 2, -1, -1):
                laterals[i] = laterals[i] + F.interpolate(
                    laterals[i + 1], scale_factor=2, mode="nearest")
            segs = [blk(p) for blk, p in zip(self.seg_blocks, laterals)]
            base = segs[0].shape[-2:]
            segs = [s if s.shape[-2:] == base else
                    F.interpolate(s, size=base, mode="bilinear",
                                  align_corners=False) for s in segs]
            x = self.pre(torch.cat(segs, dim=1))
            x = self.out(x)
            return F.interpolate(x, scale_factor=4, mode="bilinear",
                                 align_corners=False)

    class RefModel(nn.Module):
        def __init__(self):
            super().__init__()
            # swin_b: embed 128, depths (2,2,18,2), heads (4,8,16,32)
            self.encoder = TorchTinySwin(embed_dim=128,
                                         depths=(2, 2, 18, 2),
                                         num_heads=(4, 8, 16, 32), ws=8)
            self.decoder = FPNSeg()

        def forward(self, x):
            return self.decoder(self.encoder(x))

    model = RefModel().train()
    n_params = sum(p.numel() for p in model.parameters())
    print(f"[torch] params: {n_params / 1e6:.1f}M, "
          f"threads={torch.get_num_threads()}", file=sys.stderr)
    opt = torch.optim.AdamW(model.parameters(), lr=1e-4, weight_decay=1e-4)

    g = torch.Generator().manual_seed(0)
    x = torch.rand(batch, 3, IMAGE_SIZE, IMAGE_SIZE, generator=g)
    y = torch.randint(0, NUM_CLASSES, (batch, IMAGE_SIZE, IMAGE_SIZE),
                      generator=g)

    def step():
        opt.zero_grad(set_to_none=True)
        loss = F.cross_entropy(model(x), y)
        loss.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), 1.0)
        opt.step()
        return float(loss.detach())

    step()  # warmup (allocator, thread pools)
    t0 = time.time()
    for _ in range(steps):
        step()
    dt = time.time() - t0
    ips = steps * batch / dt
    print(f"[torch] {steps} steps x batch {batch}: {dt:.1f}s -> "
          f"{ips:.3f} img/s", file=sys.stderr)
    return ips


# ---------------------------------------------------------------------------
# jax side (run under JAX_PLATFORMS=cpu)
# ---------------------------------------------------------------------------
def run_jax(batch: int, steps: int) -> float:
    import jax

    # the axon plugin force-registers the TPU backend regardless of
    # JAX_PLATFORMS; pin CPU at the config level (same recipe as
    # __graft_entry__.dryrun_multichip)
    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    sys.path.insert(0, REPO)
    from fmc_uia_tpu.config import load_config
    from fmc_uia_tpu.models import build_model
    from fmc_uia_tpu.models.multitask import init_variables
    from fmc_uia_tpu.tasks import TaskRegistry
    from fmc_uia_tpu.train import Trainer

    cfg = load_config(os.path.join(REPO, "configs", "config.yaml"))
    cfg.config["data"]["image_size"] = IMAGE_SIZE
    cfg.config["data"]["batch_size"] = batch
    cfg.config["model"]["encoder"]["name"] = "swin_b"
    cfg.config["model"]["encoder"]["window_size"] = 8
    cfg.config["model"]["encoder"]["remat"] = False
    cfg.config["device"]["mixed_precision"] = False  # fp32 = eager-ref dtype
    cfg._set_attributes()

    registry = TaskRegistry.from_config(cfg)
    model = build_model(cfg, registry)
    print(f"[jax] backend={jax.default_backend()}", file=sys.stderr)
    variables = init_variables(model, jax.random.PRNGKey(0), IMAGE_SIZE, 1)
    trainer = Trainer(cfg, model, registry, variables["params"],
                      jax.random.PRNGKey(0))

    rng = np.random.RandomState(0)
    tid = "T2A_fetal_abdomen"
    spec = registry[tid]
    host = {
        "image": rng.randint(0, 255,
                             (batch, IMAGE_SIZE, IMAGE_SIZE, 3)).astype(
                                 np.uint8),
        "label": rng.randint(0, NUM_CLASSES,
                             (batch, IMAGE_SIZE, IMAGE_SIZE)).astype(
                                 np.int32),
        "task_id": tid, "task_index": spec.global_index,
        "task_type": "segmentation",
    }
    dev_batch = trainer.put_batch(host)

    t0 = time.time()
    out = trainer.train_batch(dev_batch, epoch=0)  # compile
    jax.block_until_ready(out["total_loss"])
    print(f"[jax] compile: {time.time() - t0:.1f}s", file=sys.stderr)

    t0 = time.time()
    for _ in range(steps):
        out = trainer.train_batch(dev_batch, epoch=0)
    jax.block_until_ready(out["total_loss"])
    dt = time.time() - t0
    ips = steps * batch / dt
    print(f"[jax] {steps} steps x batch {batch}: {dt:.1f}s -> "
          f"{ips:.3f} img/s", file=sys.stderr)
    return ips


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--side", choices=["both", "torch", "jax"],
                    default="both")
    args = ap.parse_args()

    if args.side == "torch":
        print(json.dumps({"side": "torch",
                          "ips": run_torch(args.batch, args.steps)}))
        return
    if args.side == "jax":
        print(json.dumps({"side": "jax",
                          "ips": run_jax(args.batch, args.steps)}))
        return

    # both: each side in its own process so torch threading and the
    # forced-CPU jax backend can't interfere with each other
    results = {}
    for side in ("torch", "jax"):
        env = dict(os.environ)
        if side == "jax":
            env["JAX_PLATFORMS"] = "cpu"
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--side", side,
             "--batch", str(args.batch), "--steps", str(args.steps)],
            env=env, cwd=REPO, capture_output=True, text=True)
        sys.stderr.write(proc.stderr)
        if proc.returncode != 0:
            raise RuntimeError(f"{side} side failed rc={proc.returncode}")
        results[side] = json.loads(proc.stdout.strip().splitlines()[-1])

    ratio = results["jax"]["ips"] / results["torch"]["ips"]
    print(json.dumps({
        "workload": f"swin_b seg train step @ {IMAGE_SIZE}^2, "
                    f"batch {args.batch}, fp32, host CPU",
        "torch_ips": round(results["torch"]["ips"], 3),
        "jax_ips": round(results["jax"]["ips"], 3),
        "jax_over_torch": round(ratio, 3),
    }))


if __name__ == "__main__":
    main()
