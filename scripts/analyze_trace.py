#!/usr/bin/env python
"""Aggregate a jax.profiler chrome trace into a per-op-category table.

Usage: python scripts/analyze_trace.py /tmp/trace_r3 [n_steps]

Groups TPU op events by category (conv fwd/bwd, pallas kernels, copies/
layout, pooling, fusions, ...) and prints ms/step so the backward pass can
be attributed op-by-op (VERDICT round-2 item 5). Host-side only — no TPU.
"""

import collections
import glob
import gzip
import json
import re
import sys


def load_events(trace_dir):
    paths = glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz")
    assert paths, f"no trace under {trace_dir}"
    with gzip.open(sorted(paths)[-1], "rt") as f:
        data = json.load(f)
    return data["traceEvents"]


CATS = [
    ("pallas_aug", re.compile(r"augment_batch_pallas")),
    ("pallas_banded_conv", re.compile(r"banded|bconv")),
    ("pallas_crf", re.compile(r"gated_?crf")),
    ("conv", re.compile(r"^Conv_|^conv(?!ert)|convolution")),
    ("pool_fwd", re.compile(r"reduce-window")),
    ("pool_bwd", re.compile(r"select-and-scatter")),
    ("copy_layout", re.compile(r"^copy|^transpose|^bitcast")),
    ("pad_slice", re.compile(r"^pad|^slice|^dynamic-slice|^dynamic-update")),
    ("reshape", re.compile(r"^reshape")),
    ("allreduce", re.compile(r"all-reduce|all-gather|reduce-scatter")),
    ("fusion", re.compile(r"fusion|multiply|add|subtract|divide|select|"
                          r"reduce|broadcast|compare|exponential|convert")),
]


def categorize(name):
    for cat, rx in CATS:
        if rx.search(name):
            return cat
    return "other"


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/trace_r3"
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    events = load_events(trace_dir)
    # TPU op events live on device-track pids; host python frames have
    # file:line names. Keep complete events with a duration whose track
    # looks like an XLA op (no '$', no '(', not a python frame).
    per_op = collections.Counter()
    per_cat = collections.Counter()
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e.get("args", {}).get("name", "")
    device_pids = {
        p for p, n in pid_names.items()
        if "TPU" in n or "/device" in n.lower() or "xla" in n.lower()
    }
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        name = e.get("name", "")
        if "$" in name or name.endswith(")") or "/" in name:
            continue
        if device_pids and e.get("pid") not in device_pids:
            continue
        per_op[name] += e["dur"]
        per_cat[categorize(name)] += e["dur"]

    total = sum(per_cat.values())
    print(f"pids seen: { {p: n for p, n in pid_names.items()} }")
    print(f"\n== per-category, ms/step (over {n_steps} steps) ==")
    for cat, us in per_cat.most_common():
        print(f"  {us / 1000 / n_steps:8.3f} ms  {cat}")
    print(f"  {'-' * 30}\n  {total / 1000 / n_steps:8.3f} ms  TOTAL")
    print("\n== top 40 ops, ms/step ==")
    for name, us in per_op.most_common(40):
        print(f"  {us / 1000 / n_steps:8.3f} ms  [{categorize(name):>16}] {name}")


if __name__ == "__main__":
    main()
