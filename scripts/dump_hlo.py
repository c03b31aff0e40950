#!/usr/bin/env python
"""Dump the TPU-optimized HLO of a method's train step (for trace joins).

Env: HLO_METHOD (default fully_supervised), HLO_BATCH, HLO_OUT
(default /tmp/step_hlo.txt). The compile goes through the remote compile
service; the XLA cache makes repeat dumps cheap.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from wsl4mis_tpu.engine.config import TrainConfig
from wsl4mis_tpu.engine.methods import get_method

METHOD = os.environ.get("HLO_METHOD", "fully_supervised")
DEFAULT_BATCH = {"fully_supervised": 24, "pce": 24, "dmpls": 6,
                 "pce_gatedcrf": 6, "scribblevc": 12}
BATCH = int(os.environ.get("HLO_BATCH", DEFAULT_BATCH.get(METHOD, 24)))
OUT = os.environ.get("HLO_OUT", "/tmp/step_hlo.txt")
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
compiled = step.lower(bundle.state, batch, rng, bundle.aux).compile()
txt = compiled.as_text()
with open(OUT, "w") as f:
    f.write(txt)
print("wrote", OUT, len(txt), "bytes")
