#!/usr/bin/env python
"""Inference/serving throughput: batched whole-volume prediction.

Measures the production eval path (VolumePredictor: host zoom -> one
device call per depth-bucketed volume -> argmax) over a fold's validation
volumes, end to end and device-only, in slices/sec.

BENCH_MODEL: unet (default) | unet_cct | scribblevc
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from wsl4mis_tpu.data.acdc import AcdcVolumeDataset
from wsl4mis_tpu.eval.val2d import VolumePredictor
from wsl4mis_tpu.models import init_model, net_factory

MODEL = os.environ.get("BENCH_MODEL", "unet")
DTYPE = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[
    os.environ.get("BENCH_DTYPE", "bfloat16")
]


def main():
    model = net_factory(MODEL, class_num=4, dtype=DTYPE)
    variables = init_model(model, jax.random.key(0), (1, 256, 256, 1))
    variables = {k: variables[k] for k in ("params", "batch_stats")
                 if k in variables}
    predictor = VolumePredictor(model, (256, 256))
    vols = AcdcVolumeDataset(fold="fold1", limit=20)
    n_slices = sum(v["image"].shape[0] for v in vols)

    # warmup: compile every depth bucket that appears
    for v in vols:
        predictor.predict_volume(variables, v["image"])

    t0 = time.perf_counter()
    for v in vols:
        pred = predictor.predict_volume(variables, v["image"])
    np.asarray(pred)  # predict_volume already returns host arrays
    wall = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "metric": f"acdc_{MODEL}256_infer_throughput_bf16",
                "value": round(n_slices / wall, 1),
                "unit": "slices/sec/chip",
                "volumes": len(vols.volumes),
                "slices": int(n_slices),
                "wall_s": round(wall, 3),
                "ms_per_volume": round(wall / len(vols.volumes) * 1e3, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
