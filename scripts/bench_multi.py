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
DEFAULT_CONFIGS = [
    ("fs24_head_default", "fully_supervised", 24, {}),
    ("fs24_fused2", "fully_supervised", 24, {"WSL4MIS_POOL_IMPL": "fused2"}),
    ("fs24_route_measured", "fully_supervised", 24,
     {"WSL4MIS_BANDED_ROUTE": "measured"}),
    ("fs24_fused2_route", "fully_supervised", 24,
     {"WSL4MIS_POOL_IMPL": "fused2", "WSL4MIS_BANDED_ROUTE": "measured"}),
    ("fs128_default", "fully_supervised", 128, {}),
    ("fs128_fused2", "fully_supervised", 128,
     {"WSL4MIS_POOL_IMPL": "fused2"}),
    ("fs256_fused2", "fully_supervised", 256,
     {"WSL4MIS_POOL_IMPL": "fused2"}),
    ("dmpls6_fused2", "dmpls", 6, {"WSL4MIS_POOL_IMPL": "fused2"}),
    ("dmpls6_fused2_route", "dmpls", 6,
     {"WSL4MIS_POOL_IMPL": "fused2", "WSL4MIS_BANDED_ROUTE": "measured"}),
    # round-4 Pallas pool kernel (layout-pinned on both sides of every
    # pool; ops/pallas/maxpool_pallas.py) vs the reduce-window default
    ("fs24_pool_pallas", "fully_supervised", 24,
     {"WSL4MIS_POOL_IMPL": "pallas"}),
    ("pce24_pool_pallas", "pce", 24, {"WSL4MIS_POOL_IMPL": "pallas"}),
    ("dmpls6_pool_pallas", "dmpls", 6, {"WSL4MIS_POOL_IMPL": "pallas"}),
    ("crf6_pool_pallas", "pce_gatedcrf", 6,
     {"WSL4MIS_POOL_IMPL": "pallas"}),
    # round-4 BN-stats-in-conv-epilogue (banded_conv3x3_pallas_stats):
    # the conv kernel emits per-channel sum/sum^2 so FusedBatchNorm skips
    # its full-tensor stats reduction
    ("fs24_bn_epilogue", "fully_supervised", 24,
     {"WSL4MIS_BN_STATS": "epilogue"}),
    ("dmpls6_bn_epilogue", "dmpls", 6, {"WSL4MIS_BN_STATS": "epilogue"}),
    ("fs128_bn_epilogue", "fully_supervised", 128,
     {"WSL4MIS_BN_STATS": "epilogue"}),
    # round-4 small-c banded admission (stem conv + head dgrad leave the
    # W-minor-layout direct lowering): default-on vs legacy routing
    ("fs24_smallc", "fully_supervised", 24, {}),
    ("fs24_no_smallc", "fully_supervised", 24,
     {"WSL4MIS_BANDED_SMALLC": "0"}),
    ("dmpls6_smallc", "dmpls", 6, {}),
    ("dmpls6_no_smallc", "dmpls", 6, {"WSL4MIS_BANDED_SMALLC": "0"}),
    ("pce24_smallc", "pce", 24, {}),
    # round-4 flat-chained ConvBlocks (grouped conv1 output -> dense-lane
    # BN/act/dropout -> grouped-input conv2; no unpack/re-pad/relayout
    # seam inside a block)
    ("fs24_chain", "fully_supervised", 24, {"WSL4MIS_CONV_CHAIN": "flat"}),
    ("dmpls6_chain", "dmpls", 6, {"WSL4MIS_CONV_CHAIN": "flat"}),
    ("pce24_chain", "pce", 24, {"WSL4MIS_CONV_CHAIN": "flat"}),
]

KNOB_KEYS = (
    "WSL4MIS_POOL_IMPL", "WSL4MIS_BANDED_ROUTE", "WSL4MIS_CONV_IMPL",
    "WSL4MIS_BN_IMPL", "WSL4MIS_TCONV_IMPL", "WSL4MIS_AUG_IMPL",
    "WSL4MIS_BN_STATS", "WSL4MIS_BANDED_SMALLC", "WSL4MIS_CONV_CHAIN",
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
