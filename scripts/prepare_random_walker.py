#!/usr/bin/env python
"""Build a writable ACDC copy with `random_walker` pseudo-label keys.

Equivalent of running the reference's acdc_pseudo_label_random_walker.py
pipeline: copies the bundled H5 tree to --out and adds a `random_walker`
dataset to every slice and volume file so `--sup_type random_walker`
training works. Point training at it with --root_path or
WSL4MIS_ACDC_ROOT.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wsl4mis_tpu.data.acdc import default_acdc_root
from wsl4mis_tpu.data.random_walker import prepare_random_walker_tree

parser = argparse.ArgumentParser()
parser.add_argument("--src", type=str, default=None, help="bundled ACDC root")
parser.add_argument("--out", type=str, default="data/ACDC_rw")
parser.add_argument("--limit", type=int, default=None,
                    help="only copy/process the first N slice files")
parser.add_argument("--cases", type=str, default=None,
                    help="comma-separated patient ids (e.g. patient021)")

if __name__ == "__main__":
    args = parser.parse_args()
    src = args.src or default_acdc_root()
    cases = args.cases.split(",") if args.cases else None
    n = prepare_random_walker_tree(src, args.out, limit=args.limit,
                                   cases=cases)
    print(f"done: {n} slices solved -> {args.out}")
