"""Export TensorBoard scalars to CSV + a results table.

The reference's L5 layer is jupyter notebooks plotting TB CSV exports
(SURVEY.md §2.7); this is the script equivalent:

    python tools/tb_export.py runs/mnistiseg_n1k1/tb [--out results.csv]

prints the last value of every scalar tag (the hyperparameter-validation
tables of graphs/) and optionally writes the full scalar history.
"""

from __future__ import annotations

import argparse
import csv
import os
from collections import defaultdict


def load_scalars(tb_dir: str):
    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator,
    )

    acc = EventAccumulator(tb_dir, size_guidance={"scalars": 0})
    acc.Reload()
    out = {}
    for tag in acc.Tags().get("scalars", []):
        out[tag] = [(e.step, e.value) for e in acc.Scalars(tag)]
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("tb_dir")
    ap.add_argument("--out", default=None, help="write full history CSV")
    args = ap.parse_args()

    scalars = load_scalars(args.tb_dir)
    if not scalars:
        print("no scalars found")
        return
    width = max(len(t) for t in scalars)
    print(f"{'tag':<{width}}  last_step  last_value  best")
    for tag in sorted(scalars):
        hist = scalars[tag]
        step, val = hist[-1]
        best = max(v for _, v in hist)
        print(f"{tag:<{width}}  {step:9d}  {val:10.4f}  {best:.4f}")

    if args.out:
        with open(args.out, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["tag", "step", "value"])
            for tag, hist in sorted(scalars.items()):
                for step, val in hist:
                    w.writerow([tag, step, val])
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
