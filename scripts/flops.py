"""Analytic FLOP/MFU accounting for the bench config (PERF.md source).

Per-image forward FLOPs for the swin_b encoder at a given input size,
cross-checked against timm's published 15.4 GMACs for
swin_base_patch4_window7_224 (the per-stage formula reproduces it to
<1%), plus the stride-4 FPN/head estimates used in PERF.md's MFU
section. Train step ≈ 3× forward (fwd + 2× bwd); the fused kernels'
VMEM-internal recompute is NOT counted (not useful algorithmic work).

Usage: python scripts/flops.py [img_per_sec]
"""

import sys

V5E_PEAK_TFLOPS = 197.0  # bf16


def swin_b_fwd_gflops(size: int, window: int = 8) -> float:
    """Σ_stages depth·(24·T·C² + 4·T·N·C) + patch embed + merges."""
    tok0 = (size // 4) ** 2
    n = window * window
    total = 0.0
    for stage, (c, depth) in enumerate(
            [(128, 2), (256, 2), (512, 18), (1024, 2)]):
        t = tok0 // (4 ** stage)
        total += depth * (24 * t * c * c + 4 * t * n * c)
    total += tok0 * 48 * 128 * 2  # patch embed 4x4x3 -> 128
    for stage, c in [(0, 128), (1, 256), (2, 512)]:
        t = tok0 // (4 ** stage)
        total += (t // 4) * (4 * c) * (2 * c) * 2  # patch merging
    return total / 1e9


# stride-4 FPN laterals/seg-blocks + head stacks, hand-counted from
# models/decoders.py + models/heads.py at 512^2 (see PERF.md)
DEC_HEAD_FWD_GF = {"segmentation": 42.0, "detection": 52.0,
                   "classification": 2.0, "Regression": 2.0}


def main():
    size, batch = 512, 24
    enc224 = swin_b_fwd_gflops(224, window=7)
    enc = swin_b_fwd_gflops(size)
    print(f"swin_b fwd @224^2: {enc224:.1f} GF = {enc224 / 2:.1f} GMACs "
          f"(timm publishes 15.4)")
    print(f"swin_b fwd @{size}^2: {enc:.1f} GF")

    step_tf = {t: (enc + g) * 3 * batch / 1e3
               for t, g in DEC_HEAD_FWD_GF.items()}
    for t, tf in step_tf.items():
        print(f"  {t:15s} train step (B={batch}): {tf:.2f} TF")
    avg = sum(step_tf.values()) / len(step_tf)
    print(f"  uniform 4-type mix: {avg:.2f} TF/step")

    ips = float(sys.argv[1]) if len(sys.argv) > 1 else 142.69
    avg_step_s = 4 * batch / ips / 4
    tfs = avg / avg_step_s
    print(f"at {ips:.2f} img/s (avg step {avg_step_s * 1e3:.1f} ms): "
          f"{tfs:.1f} TF/s = {100 * tfs / V5E_PEAK_TFLOPS:.0f}% MFU")
    for target in (175.0, 300.0):
        s = 4 * batch / target / 4
        print(f"{target:.0f} img/s would need {avg / s:.1f} TF/s = "
              f"{100 * avg / s / V5E_PEAK_TFLOPS:.0f}% MFU")


if __name__ == "__main__":
    main()
