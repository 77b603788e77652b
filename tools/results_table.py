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


def _ep_series(hist):
    """Per-eval-point values as 'a → b → c' (the reference notebooks
    plot these per-epoch curves)."""
    return " → ".join(f"{v:.3f}" for _, v in hist)


def sweep_tables(runs_root: str = "runs") -> str:
    """Regenerate every sweep table (the reference's graphs/ notebook
    final-table cells) from the TB event files in one command:

        python tools/results_table.py --sweeps

    Emits (a) the stage-1 table — one row per runs/<ds>_<nk>_<variant>
    dir with last/best bbox+segm mAP and the per-epoch bbox trajectory;
    (b) one FT grid per runs/<ds>_ft* dir — rows (N,K)xγ with novel
    train-Use / val-Use bbox+segm mAP (children or parents tags,
    whichever the run produced)."""
    import glob
    import re

    out = []

    # ---- stage-1 ---------------------------------------------------------
    rows = []
    for rd in sorted(glob.glob(os.path.join(runs_root, "*"))):
        name = os.path.basename(rd)
        m = re.match(r"(\w+?)_(n\d+k\d+)_?(\w*)$", name)
        tb = os.path.join(rd, "tb")
        if not m or not os.path.isdir(tb):
            continue
        scalars = load_scalars(tb)
        row = [name]
        for kind in ("bbox", "isegm"):
            hist = next(
                (h for t, h in sorted(scalars.items())
                 if f"{kind}_mAP" in t), None
            )
            if hist is None:
                row += ["—", "—"]
            else:
                row += [f"{hist[-1][1]:.4f}",
                        f"{max(v for _, v in hist):.4f}"]
        bb = next((h for t, h in sorted(scalars.items())
                   if "bbox_mAP" in t), None)
        row.append(_ep_series(bb) if bb else "—")
        rows.append(row)
    if rows:
        out.append("## Stage-1 runs\n")
        out.append("| run | bbox mAP (last) | bbox (best) | segm mAP (last)"
                   " | segm (best) | per-epoch bbox mAP |")
        out.append("|---|---|---|---|---|---|")
        out += ["| " + " | ".join(r) + " |" for r in rows]

    # ---- FT grids --------------------------------------------------------
    for ft_root in sorted(glob.glob(os.path.join(runs_root, "*_ft*"))):
        cells = []
        for cd in sorted(glob.glob(os.path.join(ft_root, "N*K*_G*"))):
            m = re.match(r"N(\d+)K(\d+)_G([\d.]+)", os.path.basename(cd))
            tb = os.path.join(cd, "tb")
            if not m or not os.path.isdir(tb):
                continue
            scalars = load_scalars(tb)
            row = [f"N{m.group(1)} K{m.group(2)}", m.group(3)]
            for split in ("train", "val"):
                for kind in ("bbox", "isegm"):
                    hist = next(
                        (h for t, h in sorted(scalars.items())
                         if f"_{split}_FT_Use" in t
                         and f"{kind}_mAP_novel" in t), None
                    )
                    row.append(f"{hist[-1][1]:.4f}" if hist else "—")
            cells.append(row)
        if cells:
            out.append(f"\n## FT grid — {os.path.basename(ft_root)}\n")
            out.append("| N,K | γ | train-Use bbox | train-Use segm "
                       "| val-Use bbox | val-Use segm |")
            out.append("|---|---|---|---|---|---|")
            out += ["| " + " | ".join(r) + " |" for r in cells]
    return "\n".join(out) if out else "(no runs found)"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dirs", nargs="*")
    ap.add_argument("--out", default=None)
    ap.add_argument(
        "--sweeps", action="store_true",
        help="regenerate the stage-1 + FT-grid sweep tables from runs/",
    )
    args = ap.parse_args()
    if args.sweeps:
        md = sweep_tables()
    else:
        if not args.run_dirs:
            ap.error("run_dirs required without --sweeps")
        md = to_markdown(collect(args.run_dirs))
    print(md)
    if args.out:
        with open(args.out, "w") as f:
            f.write("# Results\n\n" + md + "\n")


if __name__ == "__main__":
    main()
