#!/usr/bin/env python
"""Extract the validation-Dice curve from a trainer log.

Usage: python scripts/val_curve.py LOG [LOG ...]

For each log prints best/final val Dice and a decimated curve — the
round-5 aug-parity A/B and the pCE-degeneration analysis both compare
these curves (VERDICT r4 item 2). Host-side only, no jax import.
"""

import re
import sys

RX = re.compile(
    r"iteration (\d+) : mean_dice : ([\d.]+) mean_hd95 : ([\d.]+)"
)


def curve(path):
    pts = []
    with open(path, errors="replace") as f:
        for line in f:
            m = RX.search(line)
            if m:
                pts.append((int(m.group(1)), float(m.group(2)),
                            float(m.group(3))))
    return pts


def main():
    for path in sys.argv[1:]:
        pts = curve(path)
        print(f"== {path}: {len(pts)} val points ==")
        if not pts:
            continue
        best = max(pts, key=lambda p: p[1])
        print(f"best  iter {best[0]:6d}  dice {best[1]:.4f}  "
              f"hd95 {best[2]:.2f}")
        print(f"final iter {pts[-1][0]:6d}  dice {pts[-1][1]:.4f}  "
              f"hd95 {pts[-1][2]:.2f}")
        step = max(1, len(pts) // 20)
        for i, (it, d, h) in enumerate(pts):
            if i % step == 0 or i == len(pts) - 1:
                print(f"  {it:6d}  {d:.4f}  {h:7.2f}")


if __name__ == "__main__":
    main()
