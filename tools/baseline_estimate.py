"""Analytic torch-GPU baseline for BASELINE.json (round-2 VERDICT item 6).

The reference (tooHotSpot/FGN) publishes no throughput numbers and its
CUDA/mmdet stack cannot run in this image (no GPU, no mmcv), so the
baseline is an analytic roofline estimate:

    imgs/s  =  peak_flops * assumed_MFU / flops_per_img

* ``flops_per_img`` — XLA cost analysis of OUR compiled inference step
  (BENCH_r02: 532.75 GFLOP at the flagship N3K3 480px geometry). The
  architectures match by construction (same backbone/heads/resolutions;
  PARITY.md), so the count transfers.
* GPU class — the reference trained on a single CUDA 11.1/11.2 card,
  torch 1.9, 2021 era (reference README.md:36-42); fp16 is present but
  disabled in its config (fgn.py:34-35 fp16_enabled=False), so fp32
  peak applies. We take an RTX 3090 (35.6 TFLOP/s fp32), the strongest
  plausible card for that stack.
* assumed MFU — two-stage mmdet-style detectors in torch fp32 reach
  ~8-15% of peak (dynamic shapes, Python-side proposal plumbing, many
  small kernels); we grant the OPTIMISTIC end (0.15) so the baseline is
  conservative for us.

Optimistic torch-GPU estimate: 35.6e12 * 0.15 / 532.75e9 ≈ 10.0 imgs/s.

Writes the estimate into BASELINE.json["published"]. Run:
    python tools/baseline_estimate.py [--flops-per-img GFLOP]
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

GPU_PEAK_FP32 = 35.6e12  # RTX 3090
ASSUMED_MFU = 0.15       # optimistic for a torch fp32 two-stage detector
DEFAULT_FLOPS_G = 532.75  # XLA cost analysis, N3K3 480px fwd (BENCH_r02)


def main():
    flops_g = DEFAULT_FLOPS_G
    if "--flops-per-img" in sys.argv:
        flops_g = float(sys.argv[sys.argv.index("--flops-per-img") + 1])

    est = GPU_PEAK_FP32 * ASSUMED_MFU / (flops_g * 1e9)
    fp = os.path.join(REPO, "BASELINE.json")
    rec = json.load(open(fp))
    rec["published"] = {
        "torch_gpu_inference_imgs_s_est": round(est, 2),
        "method": (
            "analytic roofline: fp32 peak (RTX 3090, 35.6 TFLOP/s) x "
            "assumed MFU 0.15 (optimistic for torch fp32 mmdet-style "
            "two-stage detectors) / 532.75 GFLOP per query img (XLA "
            "cost analysis of the architecture-identical compiled "
            "inference step at N3K3 480px). The reference stack runs "
            "fp32 (fgn.py:34-35 fp16_enabled=False) on a single "
            "CUDA 11.1/11.2 card (README.md:36-42) and publishes no "
            "throughput numbers; no GPU exists in this image to "
            "measure it."
        ),
        "gpu_peak_fp32": GPU_PEAK_FP32,
        "assumed_mfu": ASSUMED_MFU,
        "flops_per_img_gflop": flops_g,
    }
    json.dump(rec, open(fp, "w"), indent=2)
    print(json.dumps(rec["published"]))


if __name__ == "__main__":
    main()
