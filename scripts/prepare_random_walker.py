#!/usr/bin/env python
"""Build a writable ACDC copy with `random_walker` pseudo-label keys.

Equivalent of running the reference's acdc_pseudo_label_random_walker.py
pipeline: copies the bundled H5 tree to --out and adds a `random_walker`
dataset to every slice and volume file so `--sup_type random_walker`
training works. Point training at it with --root_path or
WSL4MIS_ACDC_ROOT.
"""

import argparse
import glob
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import h5py
import numpy as np

from wsl4mis_tpu.data.acdc import default_acdc_root
from wsl4mis_tpu.data.random_walker import pseudo_label_generator_acdc

parser = argparse.ArgumentParser()
parser.add_argument("--src", type=str, default=None, help="bundled ACDC root")
parser.add_argument("--out", type=str, default="data/ACDC_rw")
parser.add_argument("--limit", type=int, default=None,
                    help="only process the first N slice files")

if __name__ == "__main__":
    args = parser.parse_args()
    src = args.src or default_acdc_root()
    os.makedirs(args.out, exist_ok=True)
    for sub in ("ACDC_training_slices", "ACDC_training_volumes"):
        out_sub = os.path.join(args.out, sub)
        if not os.path.isdir(out_sub):
            print(f"copying {sub} ...")
            shutil.copytree(os.path.join(src, sub), out_sub)

    slice_files = sorted(
        glob.glob(os.path.join(args.out, "ACDC_training_slices", "*.h5"))
    )
    if args.limit:
        slice_files = slice_files[: args.limit]
    done = 0
    for path in slice_files:
        with h5py.File(path, "r+") as f:
            if "random_walker" in f:
                continue
            pseudo = pseudo_label_generator_acdc(
                f["image"][:], f["scribble"][:].astype(np.int32)
            )
            f.create_dataset("random_walker", data=pseudo.astype(np.uint8),
                             compression="gzip")
        done += 1
        if done % 100 == 0:
            print(f"{done}/{len(slice_files)} slices")

    # volumes: stack the per-slice pseudo labels
    vol_files = sorted(
        glob.glob(os.path.join(args.out, "ACDC_training_volumes", "*.h5"))
    )
    for path in vol_files:
        case = os.path.basename(path).replace(".h5", "")
        with h5py.File(path, "r+") as f:
            if "random_walker" in f:
                continue
            n = f["image"].shape[0]
            stack = []
            ok = True
            for ind in range(n):
                sp = os.path.join(
                    args.out, "ACDC_training_slices", f"{case}_slice_{ind}.h5"
                )
                if not os.path.exists(sp):
                    ok = False
                    break
                with h5py.File(sp, "r") as sf:
                    if "random_walker" not in sf:
                        ok = False
                        break
                    stack.append(sf["random_walker"][:])
            if ok:
                f.create_dataset(
                    "random_walker", data=np.stack(stack),
                    compression="gzip",
                )
    print("done")
