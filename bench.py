#!/usr/bin/env python
"""Benchmark: ACDC 256x256 training throughput (slices/sec/chip).

Measures the flagship hot loop — fully-supervised 2D U-Net training with
on-device augmentation, bf16 compute, jitted+donated step — on the default
JAX backend (the real TPU chip under the driver; CPU elsewhere).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "slices/sec/chip", "vs_baseline": N}

vs_baseline is measured against the BASELINE.json north-star target of
5,000 slices/sec/chip (the reference itself publishes no numbers and runs
eager single-GPU PyTorch).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import numpy as np

from wsl4mis_tpu.engine.config import TrainConfig
from wsl4mis_tpu.engine.methods import get_method

BATCH_SIZE = int(os.environ.get("BENCH_BATCH", "24"))
WARMUP = 5
STEPS = int(os.environ.get("BENCH_STEPS", "50"))
TARGET = 5000.0  # slices/sec/chip (BASELINE.json north_star)


def main():
    cfg = TrainConfig(
        method="fully_supervised",
        sup_type="label",
        fold="fold1",
        batch_size=BATCH_SIZE,
        max_iterations=10_000_000,
        compute_dtype=os.environ.get("BENCH_DTYPE", "bfloat16"),
        data_limit=256,
    )
    bundle = get_method(cfg.method).build(cfg)
    step = jax.jit(bundle.step_fn, donate_argnums=0)

    # The production input pipeline: the dataset lives in device HBM and a
    # batch is a (B,) index vector; gather + augmentation run in the step.
    batches = [
        {k: jax.device_put(v) for k, v in next(bundle.data_iter).items()}
        for _ in range(8)
    ]

    state = bundle.state
    rng = jax.random.key(0)
    for i in range(WARMUP):
        state, metrics = step(state, batches[i % len(batches)], rng, bundle.aux)
    jax.block_until_ready(state.params)

    t0 = time.perf_counter()
    for i in range(STEPS):
        state, metrics = step(state, batches[i % len(batches)], rng, bundle.aux)
    jax.block_until_ready(state.params)  # fence the full update chain
    dt = time.perf_counter() - t0

    slices_per_sec = STEPS * BATCH_SIZE / dt
    print(
        json.dumps(
            {
                "metric": "acdc_unet256_train_throughput_bf16",
                "value": round(slices_per_sec, 1),
                "unit": "slices/sec/chip",
                "vs_baseline": round(slices_per_sec / TARGET, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
