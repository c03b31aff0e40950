#!/usr/bin/env python
"""Decompose a method's device step time into components (TPU probe).

For BENCH_METHOD (default dmpls) builds the production bundle and times,
each as a K-scanned jitted call with the honest device fence from bench.py:
  aug        on-device augmentation alone (gather + geometric)
  fwd        model forward alone
  fwd_bwd    loss + gradients (no optimizer update)
  step       the full production train step

Prints one JSON line with ms per component so optimization targets the
real hot spot instead of guesses.
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

from wsl4mis_tpu.engine.config import TrainConfig
from wsl4mis_tpu.engine.methods import get_method
from wsl4mis_tpu.engine.methods.common import prep_batch, split_rngs

METHOD = os.environ.get("BENCH_METHOD", "dmpls")
K = int(os.environ.get("BENCH_SCAN_K", "20"))
REPS = int(os.environ.get("BENCH_REPS", "3"))

CONF = {
    "fully_supervised": dict(model="unet", sup_type="label", batch_size=24),
    "dmpls": dict(model="unet_cct", sup_type="scribble", batch_size=6),
    "pce_gatedcrf": dict(model="unet", sup_type="scribble", batch_size=6),
    "scribblevc": dict(model="scribblevc", sup_type="scribble",
                       batch_size=6, fold="MAAGfold"),
}[METHOD]


def timed(fn, *args):
    """K-scanned wall time per inner iteration, fenced by materializing a
    result leaf on the host (bench.py's honest fence)."""
    out = fn(*args)
    np.asarray(jax.device_get(jax.tree.leaves(out)[0]))
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.device_get(jax.tree.leaves(out)[0]))
        best = min(best, (time.perf_counter() - t0) / K)
    return best * 1e3


def matmul_calibration(n: int = 4096, iters: int = 20):
    """Achievable bf16 matmul FLOP/s through this backend (chains iters
    matmuls in one jitted call so dispatch amortizes)."""
    a = jnp.ones((n, n), jnp.bfloat16)
    b = jnp.ones((n, n), jnp.bfloat16)

    @jax.jit
    def chain(a, b):
        def body(x, _):
            return jnp.dot(x, b, preferred_element_type=jnp.bfloat16), None

        return jax.lax.scan(body, a, None, length=iters)[0]

    out = chain(a, b)
    np.asarray(jax.device_get(out[0, 0]))
    t0 = time.perf_counter()
    out = chain(a, b)
    np.asarray(jax.device_get(out[0, 0]))
    dt = (time.perf_counter() - t0) / iters
    return (2 * n**3) / dt / 1e12  # TFLOP/s


def main():
    cfg = TrainConfig(
        method=METHOD,
        model=CONF["model"],
        sup_type=CONF["sup_type"],
        fold=CONF.get("fold", "fold1"),
        batch_size=int(os.environ.get("BENCH_BATCH", CONF["batch_size"])),
        max_iterations=10_000_000,
        compute_dtype=os.environ.get("BENCH_DTYPE", "bfloat16"),
        data_limit=256,
    )
    bundle = get_method(METHOD).build(cfg)
    state = bundle.state
    aux = bundle.aux
    batch = {k: jax.device_put(v) for k, v in next(bundle.data_iter).items()}
    rng = jax.random.key(0, impl="rbg")
    model = bundle.model
    d = jax.devices()[0]
    res = {"method": METHOD, "batch": cfg.batch_size, "scan_k": K,
           "device_kind": d.device_kind, "platform": d.platform}
    if os.environ.get("BENCH_CALIBRATE", "1") == "1":
        res["matmul_tflops"] = round(matmul_calibration(), 1)

    def scan_k(body):
        def run(carry):
            def step(c, i):
                return body(c, jax.random.fold_in(rng, i)), None

            return jax.lax.scan(step, carry, jnp.arange(K))[0]

        return jax.jit(run)

    # 1. augmentation alone: returns augmented images so the work can't DCE
    def aug_body(c, key):
        rngs = split_rngs(key)
        x, labels = prep_batch(rngs["aug"], batch, aux)
        return (x.astype(jnp.float32).mean() + c).astype(jnp.float32)

    res["aug_ms"] = timed(scan_k(aug_body), jnp.zeros(()))

    # 2. forward alone (train-mode, without BN mutation plumbing cost)
    x0, _ = prep_batch(jax.random.key(1), batch, aux)

    def fwd_body(c, key):
        rngs = split_rngs(key)
        kwargs = {"rngs": {}}
        if "dropout" in rngs:
            kwargs["rngs"]["dropout"] = rngs["dropout"]
        if "feature_perturb" in rngs:
            kwargs["rngs"]["feature_perturb"] = rngs["feature_perturb"]
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        extra = getattr(state, "extra", None) or {}
        for extra_col in ("class_memory",):
            if extra_col in extra:
                variables[extra_col] = extra[extra_col]
        out = model.apply(
            variables, x0, train=True,
            mutable=["batch_stats"] + (
                ["class_memory"] if "class_memory" in variables else []
            ),
            **kwargs,
        )[0]
        leaf = out[0] if isinstance(out, (tuple, list)) else out
        return (leaf.astype(jnp.float32).mean() + c).astype(jnp.float32)

    try:
        res["fwd_ms"] = timed(scan_k(fwd_body), jnp.zeros(()))
    except Exception as e:  # model-specific plumbing; fwd is optional
        res["fwd_ms"] = None
        res["fwd_err"] = str(e)[:200]

    # 3. full production step
    def step_body(c, key):
        return bundle.step_fn(c, batch, key, aux)[0]

    res["step_ms"] = timed(scan_k(step_body), state)

    print(json.dumps({k: (round(v, 3) if isinstance(v, float) else v)
                      for k, v in res.items()}))


if __name__ == "__main__":
    main()
