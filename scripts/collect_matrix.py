#!/usr/bin/env python
"""Collect the fold-matrix quality table from experiment snapshot dirs.

Walks a snapshot root (default model/r5_matrix) for `{exp}_{fold}/
{sup_type}/log.txt` (the reference run-dir contract,
train_fully_supervised_2D.py:194-206), extracts per-cell best and final
validation mean Dice, and prints a markdown table with per-method
mean +/- std over folds — the `train_wss.sh` protocol-width artifact
(VERDICT r5 item 5). Host-side only; no TPU.

Usage: python scripts/collect_matrix.py [snapshot_root]
"""

import glob
import os
import re
import sys

VAL = re.compile(r"iteration (\d+) : mean_dice : ([0-9.]+)")


def cell_stats(log_path):
    best = (0.0, 0)
    last = (0.0, 0)
    with open(log_path) as f:
        for line in f:
            m = VAL.search(line)
            if not m:
                continue
            it, d = int(m.group(1)), float(m.group(2))
            last = (d, it)
            if d > best[0]:
                best = (d, it)
    return best, last


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "model/r5_matrix"
    cells = {}
    for log in sorted(glob.glob(os.path.join(root, "*", "*", "log.txt"))):
        run = os.path.basename(os.path.dirname(os.path.dirname(log)))
        m = re.match(r"(.+)_(fold\d)$", run)
        if not m:
            continue
        exp, fold = m.group(1), m.group(2)
        cells.setdefault(exp, {})[fold] = cell_stats(log)
    if not cells:
        print(f"no cells under {root}")
        return
    folds = [f"fold{i}" for i in range(1, 6)]
    print("| method | " + " | ".join(folds) + " | mean +/- std (best val) |")
    print("|---|" + "---|" * (len(folds) + 1))
    for exp in sorted(cells):
        row, vals = [], []
        for f in folds:
            if f in cells[exp]:
                (b, bi), (l, li) = cells[exp][f]
                row.append(f"{b:.4f} (it{bi}; fin {l:.4f})")
                vals.append(b)
            else:
                row.append("—")
        if vals:
            mean = sum(vals) / len(vals)
            std = (sum((v - mean) ** 2 for v in vals) / len(vals)) ** 0.5
            agg = f"{mean:.4f} +/- {std:.4f} ({len(vals)}/5 folds)"
        else:
            agg = "—"
        print(f"| {exp} | " + " | ".join(row) + f" | {agg} |")


if __name__ == "__main__":
    main()
