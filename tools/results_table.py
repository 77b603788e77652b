"""Collect final/best eval metrics across run dirs into a markdown table.

The script equivalent of the reference's hyperparameter-validation
tables in graphs/ notebooks (SURVEY.md §6):

    python tools/results_table.py runs/* [--out RESULTS.md]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.tb_export import load_scalars  # noqa: E402


def collect(run_dirs):
    rows = []
    for rd in run_dirs:
        tb = os.path.join(rd, "tb")
        if not os.path.isdir(tb):
            continue
        scalars = load_scalars(tb)
        row = {"run": os.path.basename(rd.rstrip("/"))}
        for tag, hist in scalars.items():
            if "mAP" in tag or "mAR" in tag:
                short = tag.split("/")[-1]
                row[f"{short} (last)"] = hist[-1][1]
                row[f"{short} (best)"] = max(v for _, v in hist)
        if "Train/loss_total" in scalars:
            row["final loss"] = scalars["Train/loss_total"][-1][1]
            row["steps"] = scalars["Train/loss_total"][-1][0]
        rows.append(row)
    return rows


def to_markdown(rows):
    if not rows:
        return "(no runs found)"
    cols = ["run"] + sorted({k for r in rows for k in r} - {"run"})
    lines = ["| " + " | ".join(cols) + " |",
             "|" + "|".join("---" for _ in cols) + "|"]
    for r in rows:
        cells = [
            f"{r.get(c, ''):.4f}" if isinstance(r.get(c), float) else str(r.get(c, ""))
            for c in cols
        ]
        lines.append("| " + " | ".join(cells) + " |")
    return "\n".join(lines)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dirs", nargs="+")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    md = to_markdown(collect(args.run_dirs))
    print(md)
    if args.out:
        with open(args.out, "w") as f:
            f.write("# Results\n\n" + md + "\n")


if __name__ == "__main__":
    main()
