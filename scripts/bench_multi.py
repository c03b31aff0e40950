#!/usr/bin/env python
"""Run bench.py's measurement across several knob configs in ONE process.

Each TPU process pays 30s-3min of tunnel init (CLAUDE.md), so the round-4
knob matrix (pool impl x banded route x batch) runs as one process: the
env knobs are read at TRACE time inside the model code, so flipping
os.environ between fresh jit traces is sufficient.

Writes one JSON line per config to stdout and the aggregate to
BENCH_MULTI_OUT (default model/r4_bench_multi.json).
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

import bench  # noqa: E402

# (tag, method, batch, env overrides)
# The round-4 knob matrix (fused2/route/pool-pallas/bn-epilogue/smallc/
# chain v1 rows) lives in git history (commit cf3b45b); its decisions are
# recorded in RESULTS.md round 4. The round-5 default set is the headline
# zoo at HEAD defaults plus the round-5 flat-seam knobs.
DEFAULT_CONFIGS = [
    ("fs24_head_default", "fully_supervised", 24, {}),
    ("pce24_head_default", "pce", 24, {}),
    ("dmpls6_head_default", "dmpls", 6, {}),
    ("crf6_head_default", "pce_gatedcrf", 6, {}),
    ("scribblevc6_head_default", "scribblevc", 6, {}),
    # flat seams are the HEAD defaults since df1e8dd; keep the reverse
    # A/B (seams off) so the promotion's win stays measured at HEAD
    ("fs24_seams_off", "fully_supervised", 24,
     {"WSL4MIS_POOL_CHAIN": "off", "WSL4MIS_UP_CHAIN": "off"}),
    ("dmpls6_seams_off", "dmpls", 6,
     {"WSL4MIS_POOL_CHAIN": "off", "WSL4MIS_UP_CHAIN": "off"}),
]

KNOB_KEYS = (
    "WSL4MIS_POOL_IMPL", "WSL4MIS_BANDED_ROUTE", "WSL4MIS_CONV_IMPL",
    "WSL4MIS_BN_IMPL", "WSL4MIS_TCONV_IMPL", "WSL4MIS_AUG_IMPL",
    "WSL4MIS_BN_STATS", "WSL4MIS_BANDED_SMALLC", "WSL4MIS_CONV_CHAIN",
    "WSL4MIS_POOL_CHAIN", "WSL4MIS_UP_CHAIN",
    "BENCH_BATCH",
)


def run_config(tag, method, batch, env):
    # snapshot the known knobs AND any per-config key outside them, so a
    # future config's extra env cannot leak into later configs in-process
    saved = {k: os.environ.get(k) for k in (*KNOB_KEYS, *env)}
    for k in saved:
        os.environ.pop(k, None)
    os.environ.update(env)
    os.environ["BENCH_BATCH"] = str(batch)
    bench.METHOD = method
    buf = io.StringIO()
    try:
        with contextlib.redirect_stdout(buf):
            bench.main()
        row = json.loads(buf.getvalue().strip().splitlines()[-1])
        row.pop("note", None)
    except Exception as e:  # keep the matrix going on a single failure
        row = {"error": f"{type(e).__name__}: {e}", "raw": buf.getvalue()[-500:]}
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
    row["tag"] = tag
    row["env"] = env
    print(json.dumps(row), flush=True)
    return row


def main():
    only = os.environ.get("BENCH_MULTI_ONLY")
    configs = DEFAULT_CONFIGS
    if only:
        want = set(only.split(","))
        configs = [c for c in DEFAULT_CONFIGS if c[0] in want]
    print(f"# device: {jax.devices()[0].device_kind}", flush=True)
    rows = [run_config(*c) for c in configs]
    out = os.environ.get("BENCH_MULTI_OUT", "model/r4_bench_multi.json")
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    with open(out, "w") as f:
        json.dump(rows, f, indent=1)
    print(f"# wrote {out}", flush=True)


if __name__ == "__main__":
    main()
