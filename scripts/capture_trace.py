#!/usr/bin/env python
"""Capture a jax.profiler trace of a method's fused train step.

Env: TRACE_METHOD (default fully_supervised), TRACE_DIR (default
/tmp/trace_step), TRACE_BATCH (default the method's bench batch).
Analyze with scripts/analyze_trace.py TRACE_DIR 5.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from wsl4mis_tpu.engine.config import TrainConfig
from wsl4mis_tpu.engine.methods import get_method

METHOD = os.environ.get("TRACE_METHOD", "fully_supervised")
OUT = os.environ.get("TRACE_DIR", "/tmp/trace_step")
DEFAULT_BATCH = {"fully_supervised": 24, "pce": 24, "dmpls": 6,
                 "pce_gatedcrf": 6, "scribblevc": 12}
BATCH = int(os.environ.get("TRACE_BATCH", DEFAULT_BATCH.get(METHOD, 24)))
SUP = {"fully_supervised": "label"}.get(METHOD, "scribble")
MODEL = {"dmpls": "unet_cct", "scribblevc": "scribblevc"}.get(METHOD, "unet")
FOLD = "MAAGfold" if METHOD == "scribblevc" else "fold1"

cfg = TrainConfig(
    method=METHOD, model=MODEL, sup_type=SUP, fold=FOLD,
    batch_size=BATCH, max_iterations=10 ** 7, compute_dtype="bfloat16",
    data_limit=256,
)
bundle = get_method(METHOD).build(cfg)
step = jax.jit(bundle.step_fn, donate_argnums=0)
batch = {k: jax.device_put(v) for k, v in next(bundle.data_iter).items()}
rng = jax.random.key(0, impl="rbg")
state = bundle.state
for _ in range(3):
    state, m = step(state, batch, rng, bundle.aux)
np.asarray(jax.device_get(jax.tree.leaves(state.params)[0]))

jax.profiler.start_trace(OUT)
for _ in range(5):
    state, m = step(state, batch, rng, bundle.aux)
np.asarray(jax.device_get(jax.tree.leaves(state.params)[0]))
jax.profiler.stop_trace()
print("trace written to", OUT)
