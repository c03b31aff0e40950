#!/usr/bin/env python
"""Join a jax.profiler trace with a dumped optimized HLO: for every
copy/pad/reshape/slice/transpose event, print ms/step next to the HLO
definition line (shape, layout, operand) so each copy family can be
attributed to the graph seam that produced it.

Usage: python scripts/join_trace_hlo.py TRACE_DIR HLO_TXT [n_steps] [rx]
"""

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from analyze_trace import load_events  # noqa: E402


def main():
    trace_dir, hlo_path = sys.argv[1], sys.argv[2]
    n_steps = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    want = re.compile(
        sys.argv[4] if len(sys.argv) > 4
        else r"^(copy|transpose|bitcast|pad|slice|dynamic-slice|reshape|"
             r"convert)"
    )

    defs = {}
    rx_def = re.compile(r"^\s*%?([\w.\-]+) = (.*)$")
    with open(hlo_path) as f:
        for line in f:
            m = rx_def.match(line)
            if m:
                defs[m.group(1)] = m.group(2).strip()

    durs = {}
    for ev in load_events(trace_dir):
        if ev.get("ph") != "X":
            continue
        name = ev.get("name", "")
        if not want.match(name):
            continue
        durs[name] = durs.get(name, 0.0) + ev.get("dur", 0.0)

    rows = sorted(durs.items(), key=lambda kv: -kv[1])
    total = 0.0
    for name, dur in rows:
        ms = dur / 1e3 / n_steps
        total += ms
        d = defs.get(name, "<not in HLO dump>")
        if ms >= 0.02:
            print(f"{ms:8.3f} ms  {name}")
            print(f"            {d[:240]}")
    print(f"\nTOTAL {total:.3f} ms/step over {len(rows)} ops")


if __name__ == "__main__":
    main()
